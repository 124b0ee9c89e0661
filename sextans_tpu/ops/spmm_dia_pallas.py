"""Pallas TPU kernel for DIA (diagonal) SpMM: C = alpha * A_diag @ B + beta * C.

The diagonal component of the hybrid structure split (ops/hybrid.py). A
diagonal ``off`` holds ``A[i, i + off]`` as a dense vector; its product
contribution is a shifted elementwise FMA. This kernel evaluates ALL
diagonals in one pass over C with B rows read from statically-indexed
(tile_m, tile_n) blocks — no gathers, no scatter, no dynamic steering:

* diagonals are grouped into offset *clusters*; each cluster c fetches
  ``span_c // tile_m + 2`` consecutive B blocks per grid step via affine
  index_maps (base block offset is static per cluster);
* a diagonal at in-cluster remainder ``r0`` touches two of those blocks,
  so its FMA splits into two statically-sliced vector ops
  (``acc[:T-r0] += dv[:T-r0] * blk0[r0:]`` and the wrap-around) —
  full-width VPU work, zero padding;
* diagonal values ship transposed as (m, D) so a diagonal's per-row scale
  is a (tile_m, 1) sublane column (lane-broadcast against B).

XLA formulations of the same sum were measured at 80-300 ms for 7
diagonals on laplace3d_64 N=512 (materialized (M, N) temporaries); this
kernel is bounded by sum-over-clusters B traffic + C in/out.

Reference mapping: this replaces PEG edge streaming for the
stencil/KKT/banded class the FPGA handles as generic edges
(src/sextans.cpp:388-419) — same capability, memory-bound instead of
64 nnz/cycle-bound.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spmm_dia_padded", "spmm_dia_ct_padded", "cluster_offsets"]


def cluster_offsets(
    offsets: Sequence[int], tile_m: int, max_span_blocks: int = 4
) -> Tuple[Tuple[int, ...], ...]:
    """Group sorted diagonal offsets into clusters whose in-cluster span is
    at most ``max_span_blocks * tile_m`` rows (bounding B blocks per grid
    step and VMEM)."""
    offs = sorted(int(o) for o in offsets)
    clusters = []
    cur = [offs[0]] if offs else []
    for o in offs[1:]:
        if o - cur[0] <= max_span_blocks * tile_m - 1:
            cur.append(o)
        else:
            clusters.append(tuple(cur))
            cur = [o]
    if cur:
        clusters.append(tuple(cur))
    return tuple(clusters)


def _kernel(
    dvt_ref,  # (tile_m, D) f32 — diagonal values, transposed
    *rest,
    clusters,  # static: tuple of (diag_indices, offsets, r0s, blk_of)
    n_bblocks: int,
    tile_m: int,
    with_c: bool,
    precise: bool,
):
    b_refs = rest[:n_bblocks]
    if with_c:
        cin_ref, ab_ref, out_ref = rest[n_bblocks:]
    else:
        ab_ref, out_ref = rest[n_bblocks:]
        cin_ref = None
    alpha = ab_ref[0, 0]

    acc = None
    comp = None
    for dj, r0, blk in clusters:
        dv = dvt_ref[:, dj : dj + 1]  # (T, 1) sublane column
        if r0 == 0:
            rows = b_refs[blk][:, :]
        else:
            # diagonal straddles two consecutive B blocks (static split)
            rows = jnp.concatenate(
                [b_refs[blk][r0:, :], b_refs[blk + 1][:r0, :]], axis=0
            )
        if precise:
            # exact product + Neumaier accumulate across diagonals
            # (ops/df32.py)
            from sextans_tpu.ops.df32 import acc_step, two_prod

            p, pe = two_prod(dv, rows)
            if acc is None:
                acc, comp = p, -pe
            else:
                acc, comp = acc_step(acc, comp, p, pe)
        else:
            term = dv * rows
            acc = term if acc is None else acc + term
    if precise:
        from sextans_tpu.ops.df32 import compensated_epilogue

        out_ref[:, :] = compensated_epilogue(
            alpha, acc, comp,
            ab_ref[0, 1] if with_c else None,
            cin_ref[:, :] if with_c else None,
        )
    else:
        total = alpha * acc
        if with_c:
            total = total + ab_ref[0, 1] * cin_ref[:, :]
        out_ref[:, :] = total


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "tile_m", "tile_n", "interpret", "with_c", "precise"
    ),
)
def spmm_dia_padded(
    dvals_t: jax.Array,  # (m_padded, D) f32 — diagonal values, transposed
    b_padded: jax.Array,  # (k_b_padded, n_padded) f32, pre-shifted (see below)
    c_padded: jax.Array,  # (m_padded, n_padded) f32
    alpha: jax.Array,
    beta: jax.Array,
    *,
    offsets: Tuple[int, ...],  # sorted diagonal offsets (col - row)
    tile_m: int,
    tile_n: int,
    interpret: bool = False,
    with_c: bool = True,
    precise: bool = False,
) -> jax.Array:
    """Diagonal SpMM over padded operands.

    ``b_padded`` must be B pre-padded with ``pad_lo = max(0, -min(offsets))``
    zero rows on top and enough rows below that every read
    ``row + off + pad_lo`` is in range (the caller pads to
    ``m_padded + max(offsets) + pad_lo``, rounded up to tile_m).
    """
    m_padded, n_padded = c_padded.shape
    D = dvals_t.shape[1]
    assert m_padded % tile_m == 0 and n_padded % tile_n == 0
    pad_lo = max(0, -min(offsets))

    # cluster diagonals; map each to (diag_index, r0, local block index)
    clus = cluster_offsets(offsets, tile_m)
    off_index = {off: j for j, off in enumerate(offsets)}
    b_block_ids = []  # global block offsets, one per B blockspec
    kernel_clusters = []
    for cl in clus:
        base = cl[0] + pad_lo
        base_blk = base // tile_m
        span_blocks = (cl[-1] + pad_lo - base_blk * tile_m) // tile_m + 2
        local0 = len(b_block_ids)
        b_block_ids.extend(base_blk + d for d in range(span_blocks))
        for off in cl:
            lo = off + pad_lo - base_blk * tile_m
            kernel_clusters.append(
                (off_index[off], lo % tile_m, local0 + lo // tile_m)
            )

    n_bblocks = len(b_block_ids)
    need_rows = (max(b_block_ids) + 1 + m_padded // tile_m - 1) * tile_m
    if b_padded.shape[0] < need_rows:
        b_padded = jnp.pad(
            b_padded, ((0, need_rows - b_padded.shape[0]), (0, 0))
        )

    grid = (n_padded // tile_n, m_padded // tile_m)

    in_specs = [
        pl.BlockSpec((tile_m, D), lambda n, i: (i, 0)),  # dvals_t
    ]
    for bid in b_block_ids:
        in_specs.append(
            pl.BlockSpec(
                (tile_m, tile_n),
                functools.partial(lambda n, i, _b=bid: (i + _b, n)),
            )
        )
    if with_c:
        in_specs.append(pl.BlockSpec((tile_m, tile_n), lambda n, i: (i, n)))
    in_specs.append(
        pl.BlockSpec((1, 2), lambda n, i: (0, 0), memory_space=pltpu.SMEM)
    )  # ab

    ab = jnp.stack([alpha, beta]).astype(jnp.float32).reshape(1, 2)

    kernel = functools.partial(
        _kernel,
        clusters=tuple(kernel_clusters),
        n_bblocks=n_bblocks,
        tile_m=tile_m,
        with_c=with_c,
        precise=precise,
    )

    cost = pl.CostEstimate(
        flops=2 * D * m_padded * n_padded,
        bytes_accessed=(
            dvals_t.size * 4
            + n_bblocks * m_padded * n_padded * 4
            + (2 if with_c else 1) * m_padded * n_padded * 4
        ),
        transcendentals=0,
    )

    operands = [dvals_t]
    operands += [b_padded] * n_bblocks
    if with_c:
        operands.append(c_padded)
    operands.append(ab)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda n, i: (i, n)),
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


def _kernel_ct(
    dv_ref,  # (D, tile_m) f32 — diagonal values, row per diagonal
    *rest,
    clusters,  # static: tuple of (diag_index, r0, local block index)
    n_bblocks: int,
    with_c: bool,
    precise: bool,
):
    b_refs = rest[:n_bblocks]
    if with_c:
        cin_ref, ab_ref, out_ref = rest[n_bblocks:]
    else:
        ab_ref, out_ref = rest[n_bblocks:]
        cin_ref = None
    alpha = ab_ref[0, 0]

    acc = None
    comp = None
    for dj, r0, blk in clusters:
        dv = dv_ref[dj : dj + 1, :]  # (1, T) lane row, sublane-broadcast
        if r0 == 0:
            cols = b_refs[blk][:, :]
        else:
            # diagonal straddles two consecutive B^T blocks: static LANE
            # split (the CT twin of the sublane split above)
            cols = jnp.concatenate(
                [b_refs[blk][:, r0:], b_refs[blk + 1][:, :r0]], axis=1
            )
        if precise:
            from sextans_tpu.ops.df32 import acc_step, two_prod

            p, pe = two_prod(dv, cols)
            if acc is None:
                acc, comp = p, -pe
            else:
                acc, comp = acc_step(acc, comp, p, pe)
        else:
            term = dv * cols
            acc = term if acc is None else acc + term
    if precise:
        from sextans_tpu.ops.df32 import compensated_epilogue

        out_ref[:, :] = compensated_epilogue(
            alpha, acc, comp,
            ab_ref[0, 1] if with_c else None,
            cin_ref[:, :] if with_c else None,
        )
    else:
        total = alpha * acc
        if with_c:
            total = total + ab_ref[0, 1] * cin_ref[:, :]
        out_ref[:, :] = total


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "tile_m", "interpret", "with_c", "precise"),
)
def spmm_dia_ct_padded(
    dvals: jax.Array,  # (D, m_padded) f32 — diagonal values, row-major
    bt_padded: jax.Array,  # (n_ct, k_b_padded) f32 — B^T, pre-shifted cols
    ct_padded: jax.Array,  # (n_ct, m_padded) f32 — C^T
    alpha: jax.Array,
    beta: jax.Array,
    *,
    offsets: Tuple[int, ...],
    tile_m: int,
    interpret: bool = False,
    with_c: bool = True,
    precise: bool = False,
) -> jax.Array:
    """Skinny-N diagonal SpMM on TRANSPOSED operands: M rides the 128-lane
    axis, so the VPU runs full-width at any N (the standard kernel pads N
    up to 128 lanes — an 8x FLOP waste at N=16, measured 5.8 ms on
    scircuit-class vs its memory bound). ``bt_padded`` carries
    ``pad_lo = max(0, -min(offsets))`` zero COLUMNS on the left."""
    n_ct, m_padded = ct_padded.shape
    D = dvals.shape[0]
    assert m_padded % tile_m == 0
    pad_lo = max(0, -min(offsets))

    clus = cluster_offsets(offsets, tile_m)
    off_index = {off: j for j, off in enumerate(offsets)}
    b_block_ids = []
    kernel_clusters = []
    for cl in clus:
        base = cl[0] + pad_lo
        base_blk = base // tile_m
        local0 = len(b_block_ids)
        span_blocks = (cl[-1] + pad_lo - base_blk * tile_m) // tile_m + 2
        b_block_ids.extend(base_blk + d for d in range(span_blocks))
        for off in cl:
            lo = off + pad_lo - base_blk * tile_m
            kernel_clusters.append(
                (off_index[off], lo % tile_m, local0 + lo // tile_m)
            )

    n_bblocks = len(b_block_ids)
    need_cols = (max(b_block_ids) + 1 + m_padded // tile_m - 1) * tile_m
    if bt_padded.shape[1] < need_cols:
        bt_padded = jnp.pad(
            bt_padded, ((0, 0), (0, need_cols - bt_padded.shape[1]))
        )

    grid = (m_padded // tile_m,)

    in_specs = [
        pl.BlockSpec((D, tile_m), lambda i: (0, i)),  # dvals
    ]
    for bid in b_block_ids:
        in_specs.append(
            pl.BlockSpec(
                (n_ct, tile_m),
                functools.partial(lambda i, _b=bid: (0, i + _b)),
            )
        )
    if with_c:
        in_specs.append(pl.BlockSpec((n_ct, tile_m), lambda i: (0, i)))
    in_specs.append(
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    )

    ab = jnp.stack([alpha, beta]).astype(jnp.float32).reshape(1, 2)

    kernel = functools.partial(
        _kernel_ct,
        clusters=tuple(kernel_clusters),
        n_bblocks=n_bblocks,
        with_c=with_c,
        precise=precise,
    )

    cost = pl.CostEstimate(
        flops=2 * D * m_padded * n_ct,
        bytes_accessed=(
            dvals.size * 4
            + n_bblocks * n_ct * m_padded * 4
            + (2 if with_c else 1) * n_ct * m_padded * 4
        ),
        transcendentals=0,
    )

    operands = [dvals]
    operands += [bt_padded] * n_bblocks
    if with_c:
        operands.append(ct_padded)
    operands.append(ab)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_ct, tile_m), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n_ct, m_padded), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)
