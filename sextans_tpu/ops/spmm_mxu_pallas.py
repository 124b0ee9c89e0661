"""Pallas TPU SpMM kernel dispatching dense A slabs to the MXU.

Companion to the VPU kernel (ops/spmm_pallas.py) over the MXU packed format
(format/pack_mxu.py). Same grid/steering skeleton — scalar-prefetched group
arrays steer the B window and C tile; fused alpha/beta epilogue on the last
group of each M-tile (the Merger/FloatvMultConst/FloatvAddFloatv collapse,
src/sextans.cpp:128-233,802-820) — but the inner loop replaces the
broadcast-FMA with one systolic-array contraction per block:

    contrib(128, tile_n) = valsᵀ(bk, 128) ·contract-k· B_slab(bk, tile_n)

and accumulates into a (tile_m/128, 128, tile_n) float32 scratch indexed by
the block's *leading* slab index — no sublane read-modify-write steering at
all (the PEG_Cmtx URAM hazard machinery, src/sextans.cpp:462-570, dissolves
into a whole-slab add).

Contractions run at float32-grade precision (HIGHEST → bf16 multi-pass with
full f32 significand coverage) so the 1e-6 max-abs target (BASELINE.md)
holds; accumulation is float32 throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spmm_mxu_padded", "spmm_mxu_ct_padded"]

MSLAB = 128


def _kernel(
    mt_ref,  # (ngroups+1,) i32 scalar-prefetch
    kw_ref,  # (ngroups,) i32 scalar-prefetch (steers B via index_map)
    ab_ref,  # (2,) f32 — alpha, beta
    vals_ref,  # (1, G*bk, 128) f32 VMEM
    qm_ref,  # (1, 1, G) i32 SMEM
    bcol_ref,  # (1, 1, G) i32 SMEM
    b_ref,  # (1, window_k, tile_n) f32 VMEM
    *rest,  # [cin_ref,] out_ref, acc_ref [, comp_ref if precise]
    group_blocks: int,
    block_k: int,
    tile_m: int,
    with_c: bool,
    unroll: int,
    precision,
    precise: bool,
):
    comp_ref = None
    if precise:
        *rest, comp_ref = rest
    if with_c:
        cin_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
        cin_ref = None
    g = pl.program_id(1)
    mt = mt_ref[g]
    prev_mt = jnp.where(g == 0, jnp.int32(-2), mt_ref[jnp.maximum(g - 1, 0)])
    is_first = prev_mt != mt
    is_last = mt_ref[g + 1] != mt

    @pl.when(is_first)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if precise:
            comp_ref[...] = jnp.zeros_like(comp_ref)

    bk = block_k
    G = group_blocks

    def body(i, _):
        q = qm_ref[0, 0, i]
        col = pl.multiple_of(bcol_ref[0, 0, i], bk)
        off = pl.multiple_of(i * bk, bk)
        vs = vals_ref[0, pl.ds(off, bk), :]  # (bk, 128)
        bs = b_ref[0, pl.ds(col, bk), :]  # (bk, tile_n)
        contrib = jax.lax.dot_general(
            vs,
            bs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (128, tile_n)
        if precise:
            # Neumaier-compensated accumulation across block visits
            # (ops/df32.py; docs/ACCURACY.md); the within-contraction
            # rounding of the MXU's f32 accumulate is the remaining,
            # documented bound.
            from sextans_tpu.ops.df32 import acc_step

            t, c_new = acc_step(acc_ref[q], comp_ref[q], contrib)
            comp_ref[q] = c_new
            acc_ref[q] = t
        else:
            acc_ref[q] += contrib
        return 0

    # Mosaic supports only unroll=1 or full unroll; cap full unroll at 64
    # blocks to bound code size (same guard family as the VPU kernel).
    full = unroll != 1 and G <= 64
    jax.lax.fori_loop(0, G, body, 0, unroll=(G if full else 1))

    @pl.when(is_last)
    def _epilogue():
        alpha = ab_ref[0]
        nslabs = tile_m // MSLAB
        for s in range(nslabs):
            if precise:
                # double-float combine (ops/df32.py): one final rounding
                from sextans_tpu.ops.df32 import compensated_epilogue

                out_ref[pl.ds(s * MSLAB, MSLAB), :] = compensated_epilogue(
                    alpha, acc_ref[s], comp_ref[s],
                    ab_ref[1] if with_c else None,
                    cin_ref[pl.ds(s * MSLAB, MSLAB), :] if with_c else None,
                )
            else:
                total = alpha * acc_ref[s]
                if with_c:
                    total = total + ab_ref[1] * cin_ref[
                        pl.ds(s * MSLAB, MSLAB), :
                    ]
                out_ref[pl.ds(s * MSLAB, MSLAB), :] = total


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m",
        "window_k",
        "block_k",
        "group_blocks",
        "tile_n",
        "interpret",
        "with_c",
        "unroll",
        "precision",
        "precise",
    ),
)
def spmm_mxu_padded(
    vals: jax.Array,  # (ngroups, G*bk, 128) f32
    qm: jax.Array,  # (ngroups, G) i32
    bcol: jax.Array,  # (ngroups, G) i32
    group_mtile: jax.Array,  # (ngroups+1,) i32
    group_kwin: jax.Array,  # (ngroups,) i32
    b_padded: jax.Array,  # (k_padded, n_padded) f32
    c_padded: jax.Array,  # (m_padded, n_padded) f32
    alpha: jax.Array,
    beta: jax.Array,
    *,
    tile_m: int,
    window_k: int,
    block_k: int,
    group_blocks: int,
    tile_n: int,
    interpret: bool = False,
    with_c: bool = True,
    unroll: int = 1,
    precision: str = "highest",
    precise: bool = False,
) -> jax.Array:
    ngroups = vals.shape[0]
    m_padded, n_padded = c_padded.shape
    k_padded = b_padded.shape[0]
    n_kwins = k_padded // window_k
    n_panels = n_padded // tile_n
    G, bk = group_blocks, block_k

    if not interpret:
        from sextans_tpu.utils.config import check_kernel_vmem

        check_kernel_vmem(
            acc_bytes=4 * (2 if precise else 1) * tile_m * tile_n,
            b_window_bytes=4 * window_k * tile_n,
            c_bytes=4 * (2 if with_c else 1) * tile_m * tile_n,
            vals_bytes=4 * G * bk * MSLAB,
            # the compensated epilogue runs per (MSLAB, tile_n) slab —
            # ~8 slab-sized EFT temporaries live at once
            epilogue_bytes=(8 * 4 * MSLAB * tile_n) if precise else 0,
        )

    b3 = b_padded.reshape(n_kwins, window_k, n_padded)
    ab = jnp.stack([alpha, beta]).astype(jnp.float32)
    qm3 = qm.reshape(ngroups, 1, G)
    bcol3 = bcol.reshape(ngroups, 1, G)

    grid = (n_panels, ngroups)

    def grp_idx(n, g, mt, kw, ab_):
        return (g, 0, 0)

    def b_idx(n, g, mt, kw, ab_):
        return (kw[g], 0, n)

    def c_idx(n, g, mt, kw, ab_):
        return (mt[g], n)

    in_specs = [
        pl.BlockSpec((1, G * bk, MSLAB), grp_idx),
        pl.BlockSpec((1, 1, G), grp_idx, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, G), grp_idx, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, window_k, tile_n), b_idx),
    ]
    if with_c:
        in_specs.append(pl.BlockSpec((tile_m, tile_n), c_idx))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n), c_idx),
        scratch_shapes=[
            pltpu.VMEM((tile_m // MSLAB, MSLAB, tile_n), jnp.float32)
        ]
        + (
            [pltpu.VMEM((tile_m // MSLAB, MSLAB, tile_n), jnp.float32)]
            if precise
            else []
        ),
    )

    # "highest" = full f32-grade multi-pass contraction (the production
    # setting; anything less violates the 1e-6/1e-4 error budgets).
    # "default" = raw bf16 passes, exposed for perf probing only.
    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    kernel = functools.partial(
        _kernel,
        group_blocks=G,
        block_k=bk,
        tile_m=tile_m,
        with_c=with_c,
        unroll=unroll,
        precision=prec,
        precise=precise,
    )

    # 3 bf16 passes per f32 contraction is the dominant cost
    flops_per_group = G * bk * MSLAB * 2 * tile_n
    cost = pl.CostEstimate(
        flops=flops_per_group * ngroups * n_panels,
        bytes_accessed=(vals.size * 4 + b3.size * 4 + 2 * c_padded.size * 4),
        transcendentals=0,
    )

    operands = [group_mtile, group_kwin, ab, vals, qm3, bcol3, b3]
    if with_c:
        operands.append(c_padded)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_padded, n_padded), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # raise the default 16 MiB scoped-VMEM cap: v5e has far more
            # physical VMEM, and large-tile configs (the B-restream lever
            # for big matrices) need it
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Skinny-N variant: C transposed (N in sublanes, M in lanes).
#
# At N <= 32 the standard orientation wastes 96+ of 128 output lanes and
# streams 128 rows through the MXU per block; transposing C makes the
# contraction (bk, n_ct) x (bk, 128) -> (n_ct, 128): the systolic array
# streams only n_ct rows against the same stationary slab, and every output
# lane is an M column (zero lane waste). The packed A operand is UNCHANGED.
# ---------------------------------------------------------------------------


def _kernel_ct(
    mt_ref,
    kw_ref,
    ab_ref,
    vals_ref,  # (1, G*bk, 128)
    qm_ref,  # (1, 1, G) SMEM
    bcol_ref,  # (1, 1, G) SMEM
    b_ref,  # (1, window_k, 128) — lanes 0:n_ct hold B columns
    *rest,  # [cin_ref,] out_ref, acc_ref
    group_blocks: int,
    block_k: int,
    tile_m: int,
    n_ct: int,
    with_c: bool,
    unroll: int,
    precision,
    precise: bool,
):
    comp_ref = None
    if precise:
        *rest, comp_ref = rest
    if with_c:
        cin_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
        cin_ref = None
    g = pl.program_id(0)
    mt = mt_ref[g]
    prev_mt = jnp.where(g == 0, jnp.int32(-2), mt_ref[jnp.maximum(g - 1, 0)])
    is_first = prev_mt != mt
    is_last = mt_ref[g + 1] != mt

    @pl.when(is_first)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if precise:
            comp_ref[...] = jnp.zeros_like(comp_ref)

    bk = block_k
    G = group_blocks

    def body(i, _):
        q = qm_ref[0, 0, i]
        col = pl.multiple_of(bcol_ref[0, 0, i], bk)
        off = pl.multiple_of(i * bk, bk)
        vs = vals_ref[0, pl.ds(off, bk), :]  # (bk, 128)
        bs = b_ref[0, pl.ds(col, bk), 0:n_ct]  # (bk, n_ct)
        contrib = jax.lax.dot_general(
            bs,
            vs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (n_ct, 128)
        if precise:
            from sextans_tpu.ops.df32 import acc_step

            t, c_new = acc_step(acc_ref[q], comp_ref[q], contrib)
            comp_ref[q] = c_new
            acc_ref[q] = t
        else:
            acc_ref[q] += contrib
        return 0

    full = unroll != 1 and G <= 64
    jax.lax.fori_loop(0, G, body, 0, unroll=(G if full else 1))

    @pl.when(is_last)
    def _epilogue():
        alpha = ab_ref[0]
        for s in range(tile_m // MSLAB):
            if precise:
                from sextans_tpu.ops.df32 import compensated_epilogue

                out_ref[:, pl.ds(s * MSLAB, MSLAB)] = compensated_epilogue(
                    alpha, acc_ref[s], comp_ref[s],
                    ab_ref[1] if with_c else None,
                    cin_ref[:, pl.ds(s * MSLAB, MSLAB)] if with_c else None,
                )
            else:
                total = alpha * acc_ref[s]
                if with_c:
                    total = total + ab_ref[1] * cin_ref[
                        :, pl.ds(s * MSLAB, MSLAB)
                    ]
                out_ref[:, pl.ds(s * MSLAB, MSLAB)] = total


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m",
        "window_k",
        "block_k",
        "group_blocks",
        "n_ct",
        "interpret",
        "with_c",
        "unroll",
        "precision",
        "precise",
    ),
)
def spmm_mxu_ct_padded(
    vals: jax.Array,  # (ngroups, G*bk, 128) f32 — same packed A as spmm_mxu
    qm: jax.Array,
    bcol: jax.Array,
    group_mtile: jax.Array,
    group_kwin: jax.Array,
    b_padded: jax.Array,  # (k_padded, 128) f32 — N columns in lanes 0:n_ct
    ct_padded: jax.Array,  # (n_ct, m_padded) f32 — C TRANSPOSED
    alpha: jax.Array,
    beta: jax.Array,
    *,
    tile_m: int,
    window_k: int,
    block_k: int,
    group_blocks: int,
    n_ct: int,  # sublane-padded N (multiple of 8, <= 32)
    interpret: bool = False,
    with_c: bool = True,
    unroll: int = 1,
    precision: str = "highest",
    precise: bool = False,
) -> jax.Array:
    """Skinny-N MXU SpMM producing C TRANSPOSED (n_ct, m_padded)."""
    ngroups = vals.shape[0]
    n_ct_pad, m_padded = ct_padded.shape
    assert n_ct_pad == n_ct and n_ct % 8 == 0 and n_ct <= 32
    k_padded = b_padded.shape[0]
    n_kwins = k_padded // window_k
    G, bk = group_blocks, block_k

    if not interpret:
        from sextans_tpu.utils.config import check_kernel_vmem

        check_kernel_vmem(
            acc_bytes=4 * (tile_m // MSLAB) * n_ct * MSLAB,
            b_window_bytes=4 * window_k * MSLAB,
            c_bytes=4 * (2 if with_c else 1) * n_ct * tile_m,
            vals_bytes=4 * G * bk * MSLAB,
            # compensated epilogue per (n_ct, MSLAB) slab: ~8 EFT temporaries
            epilogue_bytes=(8 * 4 * n_ct * MSLAB) if precise else 0,
        )

    b3 = b_padded.reshape(n_kwins, window_k, MSLAB)
    ab = jnp.stack([alpha, beta]).astype(jnp.float32)
    qm3 = qm.reshape(ngroups, 1, G)
    bcol3 = bcol.reshape(ngroups, 1, G)

    def grp_idx(g, mt, kw, ab_):
        return (g, 0, 0)

    def b_idx(g, mt, kw, ab_):
        return (kw[g], 0, 0)

    def c_idx(g, mt, kw, ab_):
        return (0, mt[g])

    in_specs = [
        pl.BlockSpec((1, G * bk, MSLAB), grp_idx),
        pl.BlockSpec((1, 1, G), grp_idx, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, G), grp_idx, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, window_k, MSLAB), b_idx),
    ]
    if with_c:
        in_specs.append(pl.BlockSpec((n_ct, tile_m), c_idx))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ngroups,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_ct, tile_m), c_idx),
        scratch_shapes=[
            pltpu.VMEM((tile_m // MSLAB, n_ct, MSLAB), jnp.float32)
        ]
        + (
            [pltpu.VMEM((tile_m // MSLAB, n_ct, MSLAB), jnp.float32)]
            if precise
            else []
        ),
    )

    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    kernel = functools.partial(
        _kernel_ct,
        group_blocks=G,
        block_k=bk,
        tile_m=tile_m,
        n_ct=n_ct,
        with_c=with_c,
        unroll=unroll,
        precision=prec,
        precise=precise,
    )
    cost = pl.CostEstimate(
        flops=ngroups * G * bk * MSLAB * 2 * n_ct,
        bytes_accessed=(vals.size * 4 + b3.size * 4 + 2 * ct_padded.size * 4),
        transcendentals=0,
    )
    operands = [group_mtile, group_kwin, ab, vals, qm3, bcol3, b3]
    if with_c:
        operands.append(ct_padded)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ct, m_padded), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)
