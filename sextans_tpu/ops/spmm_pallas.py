"""Pallas TPU SpMM kernel over the packed block format.

TPU-native re-design of the reference's entire device dataflow graph
(src/sextans.cpp:836-984). The ~80 FIFO-connected FPGA processes collapse
into ONE software-pipelined Pallas kernel:

* ``read_A``/``Scatter_1_2`` (src/sextans.cpp:75-100,785-800) → the Pallas
  grid pipeline streaming block groups (vals/qrow/bcol) HBM→VMEM with
  automatic double buffering;
* ``read_B`` + PEG_Bmtx's window fill (src/sextans.cpp:348-381) → a
  (window_k, tile_n) B panel block fetched per K-window, steered by the
  scalar-prefetched ``group_kwin`` array (PrefetchScalarGridSpec);
* PEG_Bmtx multiply + PEG_Cmtx scatter-accumulate (src/sextans.cpp:297-570)
  → a VPU micro-kernel: per 8 x block_k A-block, gather ``block_k``
  contiguous B rows and broadcast-FMA onto an (8, tile_n) slice of the
  VMEM accumulator. The URAM read-modify-write hazard machinery
  (DEP_DIST_LOAD_STORE, bubble edges) is unnecessary: blocks never split a
  row stripe, and the packer's stripe interleave keeps consecutive FMAs on
  different accumulator rows purely for pipelining;
* Merger / FloatvMultConst / FloatvAddFloatv / read_C / write_C epilogue
  (src/sextans.cpp:128-233,802-820) → fused ``alpha*acc + beta*C_in`` on the
  last group of each M-tile, written back once per (M-tile, N-panel).

Accumulation is float32 throughout (never bf16) to hold the 1e-6 max-abs
error target (BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spmm_pallas_padded"]


def _kernel(
    # scalar-prefetch refs
    mt_ref,  # (ngroups+1,) i32 — M-tile of each group, sentinel -1
    kw_ref,  # (ngroups,) i32 — K-window of each group (unused in body)
    ab_ref,  # (2,) f32 — alpha, beta
    # tensor refs
    vals_ref,  # (1, 8, G*bk) f32 VMEM
    qrow_ref,  # (1, 1, G) i32 SMEM
    bcol_ref,  # (1, 1, G) i32 SMEM
    b_ref,  # (1, window_k, tile_n) f32 VMEM
    *rest,  # [cin_ref if with_c,] out_ref, acc_ref [, comp_ref if precise]
    group_blocks: int,
    block_k: int,
    n_acc: int,
    chunk_unroll: int,
    with_c: bool = True,
    precise: bool = False,
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
    is_last = mt_ref[g + 1] != mt  # sentinel guarantees True at the end

    @pl.when(is_first)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if precise:
            comp_ref[...] = jnp.zeros_like(comp_ref)

    bk = block_k
    per_chunk = max(1, 128 // bk)  # blocks covered by one (8, 128) vals register
    num_chunks = group_blocks // per_chunk

    def do_block(i, bv, a):
        """One 8 x bk block: gather B rows, broadcast-FMA into accumulator a."""
        q = qrow_ref[0, 0, i]
        col = bcol_ref[0, 0, i]
        col = pl.multiple_of(col, bk)
        if bk >= 8:
            # bcol is block_k-aligned by construction → sublane-aligned load
            brows = b_ref[0, pl.ds(col, bk), :]  # (bk, tile_n)
            terms = [
                (bv[:, j : j + 1], brows[j : j + 1, :]) for j in range(bk)
            ]
        else:
            terms = [
                (bv[:, j : j + 1], b_ref[0, pl.ds(col + j, 1), :])
                for j in range(bk)
            ]
        cerr = None
        if precise >= 2:
            # Error-free-transformed inner chain (ops/df32.py): every
            # product and partial sum keeps its exact residual, so the
            # block contributes (contrib, cerr) with contrib + cerr exact.
            # ~9x the inner-op count — the gate-sample setting, never the
            # headline timing path.
            from sextans_tpu.ops.df32 import two_prod, two_sum

            contrib, cerr = two_prod(*terms[0])
            for j in range(1, bk):
                p, pe = two_prod(*terms[j])
                contrib, e = two_sum(contrib, p)
                cerr = cerr + (pe + e)
        else:
            contrib = terms[0][0] * terms[0][1]
            for j in range(1, bk):
                contrib = contrib + terms[j][0] * terms[j][1]
        off = pl.multiple_of(q * 8, 8)
        # Alternating accumulator buffers break the store→load dependency
        # chain Mosaic must otherwise assume between dynamic slices of one
        # buffer (the TPU-native echo of DEP_DIST_LOAD_STORE, src/sextans.h:12
        # — but as a throughput hint, never a correctness requirement).
        if precise:
            # Neumaier-compensated accumulation across block visits
            # (ops/df32.py acc_step): recovers the low-order bits the plain
            # f32 add chain drops, for ANY magnitude ordering
            # (docs/ACCURACY.md).
            from sextans_tpu.ops.df32 import acc_step

            t, c_new = acc_step(
                acc_ref[a, pl.ds(off, 8), :],
                comp_ref[a, pl.ds(off, 8), :],
                contrib, cerr,
            )
            comp_ref[a, pl.ds(off, 8), :] = c_new
            acc_ref[a, pl.ds(off, 8), :] = t
        else:
            acc_ref[a, pl.ds(off, 8), :] += contrib

    def chunk_body(t, _):
        base = pl.multiple_of(t * 128, 128)
        vblk = vals_ref[0, :, pl.ds(base, per_chunk * bk)]
        for u in range(per_chunk):
            do_block(t * per_chunk + u, vblk[:, u * bk : (u + 1) * bk], u % n_acc)
        return 0

    # Mosaic supports only unroll=1 or full unroll. Measured on v5e: full
    # unroll is +12% at bk=8 (256 blocks, nasa4704) but catastrophically slow
    # for small bk (bk=4: 2-20x regressions on shipsec/nlpkkt/cant classes) —
    # likely a scheduling/register-pressure pathology with 32-block chunks.
    full_unroll = (
        chunk_unroll != 1 and bk >= 8 and num_chunks * per_chunk <= 256
    )
    jax.lax.fori_loop(
        0, num_chunks, chunk_body, 0,
        unroll=(num_chunks if full_unroll else 1),
    )

    @pl.when(is_last)
    def _epilogue():
        alpha = ab_ref[0]
        if precise:
            # Double-float epilogue (ops/df32.py): merge the n_acc Kahan
            # pairs exactly, then one compensated alpha/beta combine with a
            # single final rounding — the last ~1 ulp the plain epilogue
            # loses (the round-4 "precise-missed" band, docs/ACCURACY.md).
            from sextans_tpu.ops.df32 import compensated_epilogue, two_sum

            total = acc_ref[0]
            tcomp = comp_ref[0]
            for a in range(1, n_acc):
                total, e = two_sum(total, acc_ref[a])
                tcomp = tcomp + comp_ref[a] - e
            out_ref[...] = compensated_epilogue(
                alpha, total, tcomp,
                ab_ref[1] if with_c else None,
                cin_ref[...] if with_c else None,
            )
        else:
            total = acc_ref[0]
            for a in range(1, n_acc):
                total = total + acc_ref[a]
            if with_c:
                out_ref[...] = alpha * total + ab_ref[1] * cin_ref[...]
            else:
                out_ref[...] = alpha * total


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m",
        "window_k",
        "block_k",
        "group_blocks",
        "tile_n",
        "interpret",
        "n_acc",
        "chunk_unroll",
        "with_c",
        "precise",
    ),
)
def spmm_pallas_padded(
    vals: jax.Array,  # (ngroups, 8, G*bk) f32
    qrow: jax.Array,  # (ngroups, G) i32
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
    n_acc: int = 1,
    chunk_unroll: int = 1,
    with_c: bool = True,
    precise: bool = False,
) -> jax.Array:
    """``with_c=False`` drops the C_in stream entirely (for beta == 0):
    ``c_padded`` is then only used for its shape.

    ``precise=True`` enables Kahan compensated accumulation across block
    visits (second VMEM scratch buffer, ~+3 vector ops per visit): the
    answer lands within ~1 ulp of the float64 oracle instead of drifting
    with the window count (docs/ACCURACY.md; the reference has no analog —
    its FP32 add pipeline accumulates in schedule order)."""
    ngroups = vals.shape[0]
    m_padded, n_padded = c_padded.shape
    k_padded = b_padded.shape[0]
    n_kwins = k_padded // window_k
    n_panels = n_padded // tile_n
    G, bk = group_blocks, block_k

    if not interpret:
        from sextans_tpu.utils.config import check_kernel_vmem

        check_kernel_vmem(
            acc_bytes=4 * n_acc * (2 if precise else 1) * tile_m * tile_n,
            b_window_bytes=4 * window_k * tile_n,
            c_bytes=4 * (2 if with_c else 1) * tile_m * tile_n,
            vals_bytes=4 * G * bk * 8,
            # the compensated epilogue holds ~8 full-tile EFT temporaries
            # live at once (see check_kernel_vmem)
            epilogue_bytes=(8 * 4 * tile_m * tile_n) if precise else 0,
        )

    b3 = b_padded.reshape(n_kwins, window_k, n_padded)
    ab = jnp.stack([alpha, beta]).astype(jnp.float32)
    qrow3 = qrow.reshape(ngroups, 1, G)
    bcol3 = bcol.reshape(ngroups, 1, G)

    grid = (n_panels, ngroups)

    def vals_idx(n, g, mt, kw, ab_):
        return (g, 0, 0)

    def edge_idx(n, g, mt, kw, ab_):
        return (g, 0, 0)

    def b_idx(n, g, mt, kw, ab_):
        return (kw[g], 0, n)

    def c_idx(n, g, mt, kw, ab_):
        return (mt[g], n)

    in_specs = [
        pl.BlockSpec((1, 8, G * bk), vals_idx),
        # SMEM blocks must cover the array's last two dims exactly →
        # index arrays are shipped as (ngroups, 1, G).
        pl.BlockSpec((1, 1, G), edge_idx, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, G), edge_idx, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, window_k, tile_n), b_idx),
    ]
    if with_c:
        in_specs.append(pl.BlockSpec((tile_m, tile_n), c_idx))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n), c_idx),
        scratch_shapes=[pltpu.VMEM((n_acc, tile_m, tile_n), jnp.float32)]
        + (
            [pltpu.VMEM((n_acc, tile_m, tile_n), jnp.float32)]
            if precise
            else []
        ),
    )

    kernel = functools.partial(
        _kernel,
        group_blocks=G,
        block_k=bk,
        n_acc=n_acc,
        chunk_unroll=chunk_unroll,
        with_c=with_c,
        precise=precise,
    )

    flops_per_group = G * 8 * bk * 2 * tile_n
    cost = pl.CostEstimate(
        flops=flops_per_group * ngroups * n_panels,
        bytes_accessed=(
            vals.size * 4 + b3.size * 4 + 2 * c_padded.size * 4
        ),
        transcendentals=0,
    )

    operands = [group_mtile, group_kwin, ab, vals, qrow3, bcol3, b3]
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
