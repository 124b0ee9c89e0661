"""Pallas TPU SpMM kernel streaming raw edges — the structure-independent path.

TPU re-design of the reference PEG's defining property: decoding an
*arbitrary* per-edge column within the resident B window at a fixed rate,
independent of the sparsity pattern (src/sextans.cpp:388-419 — the FPGA
sustains 64 nnz/cycle on any structure; the whole OoO scheduler,
src/sparse_helper.h:292-342, exists to make that true). The block formats
(pack.py / pack_mxu.py) trade that property for vector/MXU width and pay
padding — 4-50x value inflation on scattered (power-law) matrices. This
kernel pays zero padding: one record per nonzero (~8 B/nnz, the reference's
own edge-stream economics, src/sparse_helper.h:406-473).

Per edge (CSR-sorted within each (M-tile, K-window) job, format/pack_edge.py):

    col, row, row_end = decode(meta[e]);  v = vals[e]
    reg += v * B_window[col, :]                    # (1, tile_n) gather-FMA
    if row_end: acc[row, :] += reg; reg = 0        # one flush per row-run

The register accumulation amortizes the dynamic-sublane read-modify-write
over a row's whole run (average run = row degree within the window), where
the reference spends its DEP_DIST=10 hazard machinery per touch
(src/sextans.cpp:518, src/sextans.h:12) — here flushes are hazard-free by
sequential grid semantics; only throughput cares.

Steering, grid, B/C tiling, and the fused alpha/beta epilogue are identical
to the block kernels (scalar-prefetched chunk_mtile/chunk_kwin; grid =
(N-panels, chunks); epilogue on the last chunk of each M-tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sextans_tpu.format.pack_edge import COL_SHIFT, ROW_SHIFT

__all__ = ["spmm_edge_padded"]


def _kernel(
    mt_ref,  # (chunks+1,) i32 scalar-prefetch, sentinel -1
    kw_ref,  # (chunks,) i32 scalar-prefetch (steers B via index_map)
    ab_ref,  # (2,) f32 — alpha, beta
    vals_ref,  # (1, 1, E) f32 SMEM
    meta_ref,  # (1, 1, E) i32 SMEM
    b_ref,  # (1, window_k, tile_n) f32 VMEM
    *rest,  # [cin_ref,] out_ref, acc_ref [, comp_ref if precise]
    edge_chunk: int,
    tile_n: int,
    lanes: int,
    with_c: bool,
    masked: bool,
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

    col_mask = (1 << (ROW_SHIFT - COL_SHIFT)) - 1
    L = lanes

    def body(t, carry):
        # L edges per iteration, one per independent register: the packer
        # pads row runs to a multiple of L, so all registers always hold
        # partials of the SAME row and row_end can only sit on lane L-1 —
        # the L-way ILP that breaks the serial register FMA chain.
        if precise:
            regs, comps = carry[:L], carry[L:]
        else:
            regs, comps = carry, None
        base = t * L
        words = [meta_ref[0, 0, base + j] for j in range(L)]
        new = []
        newc = []
        for j in range(L):
            col = (words[j] >> COL_SHIFT) & col_mask
            v = vals_ref[0, 0, base + j]
            pe = None
            if precise >= 2:
                # exact product (ops/df32.py): the per-edge v * B_row
                # rounding joins the compensation — the gate-sample
                # setting for rows whose budget is < 1 ulp of max|C|
                from sextans_tpu.ops.df32 import two_prod

                contrib, pe = two_prod(v, b_ref[0, pl.ds(col, 1), :])
            else:
                contrib = v * b_ref[0, pl.ds(col, 1), :]
            if masked:
                # pad slots (bit 0) contribute exactly zero even when B
                # carries Inf/NaN at the window's first row (0*Inf = NaN
                # otherwise) — one vector select per edge buys IEEE-clean
                # padding; off by default on the hot path
                is_pad = (words[j] & 1) != 0
                contrib = jnp.where(
                    is_pad, jnp.zeros_like(contrib), contrib
                )
                if pe is not None:
                    pe = jnp.where(is_pad, jnp.zeros_like(pe), pe)
            if precise:
                # Neumaier-compensated lane register (ops/df32.py
                # acc_step): hub rows accumulate thousands of edges into
                # one register — the compensation recovers the low-order
                # bits the serial chain drops (comp = the amount by which
                # the register OVERSTATES the true partial)
                from sextans_tpu.ops.df32 import acc_step

                t_, c_new = acc_step(regs[j], comps[j], contrib, pe)
                newc.append(c_new)
                new.append(t_)
            else:
                new.append(regs[j] + contrib)
        wlast = words[L - 1]
        row_end = (wlast & 2) != 0

        @pl.when(row_end)
        def _flush():
            row = wlast >> ROW_SHIFT
            total = new[0]
            for j in range(1, L):
                total = total + new[j]
            if precise:
                totalc = newc[0]
                for j in range(1, L):
                    totalc = totalc + newc[j]
                # exact two-sum flush into the persistent (acc, comp) pair,
                # then fold in the lanes' own accumulated compensation
                from sextans_tpu.ops.df32 import acc_step

                t_, c_new = acc_step(
                    acc_ref[pl.ds(row, 1), :],
                    comp_ref[pl.ds(row, 1), :],
                    total,
                )
                comp_ref[pl.ds(row, 1), :] = c_new + totalc
                acc_ref[pl.ds(row, 1), :] = t_
            else:
                acc_ref[pl.ds(row, 1), :] += total

        # predicated reset (scalar broadcast multiply)
        keep = jnp.where(row_end, jnp.float32(0), jnp.float32(1))
        out = tuple(x * keep for x in new)
        if precise:
            out = out + tuple(x * keep for x in newc)
        return out

    zero = tuple(
        jnp.zeros((1, tile_n), jnp.float32)
        for _ in range(2 * L if precise else L)
    )
    jax.lax.fori_loop(0, edge_chunk // L, body, zero)

    @pl.when(is_last)
    def _epilogue():
        if precise:
            # double-float combine (ops/df32.py): one final rounding
            from sextans_tpu.ops.df32 import compensated_epilogue

            out_ref[...] = compensated_epilogue(
                ab_ref[0], acc_ref[...], comp_ref[...],
                ab_ref[1] if with_c else None,
                cin_ref[...] if with_c else None,
            )
        else:
            total = acc_ref[...]
            if with_c:
                out_ref[...] = ab_ref[0] * total + ab_ref[1] * cin_ref[...]
            else:
                out_ref[...] = ab_ref[0] * total


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m",
        "window_k",
        "edge_chunk",
        "edge_lanes",
        "tile_n",
        "interpret",
        "with_c",
        "masked",
        "precise",
    ),
)
def spmm_edge_padded(
    vals: jax.Array,  # (chunks, 1, E) f32
    meta: jax.Array,  # (chunks, 1, E) i32
    chunk_mtile: jax.Array,  # (chunks+1,) i32
    chunk_kwin: jax.Array,  # (chunks,) i32
    b_padded: jax.Array,  # (k_padded, n_padded) f32
    c_padded: jax.Array,  # (m_padded, n_padded) f32
    alpha: jax.Array,
    beta: jax.Array,
    *,
    tile_m: int,
    window_k: int,
    edge_chunk: int,
    tile_n: int,
    edge_lanes: int = 1,
    interpret: bool = False,
    with_c: bool = True,
    masked: bool = False,
    precise: bool = False,
) -> jax.Array:
    n_chunks = vals.shape[0]
    m_padded, n_padded = c_padded.shape
    k_padded = b_padded.shape[0]
    n_kwins = k_padded // window_k
    n_panels = n_padded // tile_n

    if not interpret:
        from sextans_tpu.utils.config import check_kernel_vmem

        check_kernel_vmem(
            acc_bytes=4 * (2 if precise else 1) * tile_m * tile_n,
            b_window_bytes=4 * window_k * tile_n,
            c_bytes=4 * (2 if with_c else 1) * tile_m * tile_n,
            vals_bytes=8 * edge_chunk,
            # the compensated epilogue materializes ~8 full-tile EFT
            # temporaries (same structure as spmm_pallas's epilogue)
            epilogue_bytes=(8 * 4 * tile_m * tile_n) if precise else 0,
        )

    b3 = b_padded.reshape(n_kwins, window_k, n_padded)
    ab = jnp.stack([alpha, beta]).astype(jnp.float32)

    grid = (n_panels, n_chunks)

    def edge_idx(n, g, mt, kw, ab_):
        return (g, 0, 0)

    def b_idx(n, g, mt, kw, ab_):
        return (kw[g], 0, n)

    def c_idx(n, g, mt, kw, ab_):
        return (mt[g], n)

    in_specs = [
        pl.BlockSpec((1, 1, edge_chunk), edge_idx, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, edge_chunk), edge_idx, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, window_k, tile_n), b_idx),
    ]
    if with_c:
        in_specs.append(pl.BlockSpec((tile_m, tile_n), c_idx))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n), c_idx),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)]
        + ([pltpu.VMEM((tile_m, tile_n), jnp.float32)] if precise else []),
    )

    kernel = functools.partial(
        _kernel,
        edge_chunk=edge_chunk,
        tile_n=tile_n,
        lanes=edge_lanes,
        with_c=with_c,
        masked=masked,
        precise=precise,
    )

    cost = pl.CostEstimate(
        flops=2 * n_chunks * edge_chunk * tile_n * n_panels,
        bytes_accessed=(
            vals.size * 4 + meta.size * 4 + b3.size * 4 + 2 * c_padded.size * 4
        ),
        transcendentals=0,
    )

    operands = [chunk_mtile, chunk_kwin, ab, vals, meta, b3]
    if with_c:
        operands.append(c_padded)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_padded, n_padded), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)
