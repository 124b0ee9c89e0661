"""Pallas DMA chunk-gather SpMM engine over the ELL format.

TPU-native realization of the reference's structure-independent per-edge
dataflow (src/sextans.cpp:388-419: the PEG decode reads an arbitrary B
column per edge at a fixed 1-edge/cycle rate). The pure-XLA gather engine
(ops/spmm_ell_xla.py) phrases that as ``jnp.take``, but XLA lowers the take
to a serialized full-latency loop (measured 37 s/call on amazon-class at
N=512). This engine issues the gathers itself as pipelined Pallas DMAs.

Mosaic constrains HBM reads to aligned (8, 128) tile granules, so the
minimum gather unit is a 4 KiB *chunk*. B (k_pad, n_pad) is bitcast to
``(k_pad * n_pad / 1024, 8, 128)`` — each chunk holds ``P = 1024 / n_pad``
consecutive B rows (P in {1, 2, 4, 8} for n_pad in {1024, 512, 256, 128}).
Per 8-row output group and ELL slot r, the kernel DMAs the 8 chunks holding
the 8 referenced rows (double-buffered across groups), extracts each target
row from its chunk with a masked sublane reduction (pure aligned VPU — no
dynamic-sublane ops), and FMAs it into the group accumulator with the slot
weight. Fetching the chunk instead of a full (8, n_pad) *band* divides
gather traffic by 8/P (4x at N=512 — measured 602 GB/s of band traffic in
benchmarks/scratch/dma_gather_probe.py was the band design's wall).

The DMA issue path is the measured-best of four probed variants
(benchmarks/scratch/ell_issue_probe.py on v5e): *unconditional* fetch (pad
slots fetch chunk 0 — a ``pl.when`` guard per DMA costs more scalar-core
time than the skipped DMAs save: 22.2 vs 34.7 M DMA/s at N=512 R=8) with
ONE aggregate semaphore wait per (buffer slot, ELL slot) octet of 8 DMAs
(the per-DMA wait chain was the next-largest scalar cost). Pad lanes are
excluded arithmetically: their sublane target is -1, which the masked
extraction can never match, so fetched-garbage chunks contribute exact
zeros (no 0 * NaN hazard — the mask selects, it does not multiply).

Accumulation is f32; the alpha/beta epilogue is fused into the kernel.
The post-kernel hub fold strips the virtual rows' ``beta * C_in`` term
before scatter-adding, so only ``alpha * AB_virt`` lands in the real rows
— exact for any C_in, including the live carry of an in-device repeat
chain. The fold itself is one small XLA scatter-add, as in the XLA engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spmm_ell_gather_padded", "ELL_CHUNK_BYTES"]

# Mosaic's minimum aligned HBM gather granule: one (8, 128) f32 tile.
ELL_CHUNK_BYTES = 4096


def _kernel(
    chunk_ref,  # (ng, 8, R) i32 SMEM — B chunk per (row-in-group, slot); 0 pad
    subw_ref,  # (ng, 8, R) i32 VMEM — row-within-chunk (-1 pad)
    wvals_ref,  # (ng, 8, R) f32 VMEM — slot weights
    ab_ref,  # (2,) f32 SMEM — alpha, beta
    b_ref,  # (nchunks, 8, 128) f32 ANY (HBM) — gather table
    *rest,  # [cin_ref,] out_ref, buf, sems
    ng: int,
    r: int,
    ns: int,  # n_pad // 128; P = 8 // ns rows per chunk
    with_c: bool,
    precise: bool,
):
    if with_c:
        cin_ref, out_ref, buf, sems = rest
    else:
        out_ref, buf, sems = rest
        cin_ref = None

    def issue(g, slot):
        # unconditional (pads fetch chunk 0); all 8 DMAs of an ELL slot
        # signal ONE semaphore — variant C of ell_issue_probe.py
        for rr in range(r):
            for s in range(8):
                pltpu.make_async_copy(
                    b_ref.at[chunk_ref[g, s, rr]],
                    buf.at[slot, rr, s],
                    sems.at[slot, rr],
                ).start()

    def wait_group(g, slot):
        for rr in range(r):
            # one aggregate wait per octet: decrements the full 8-chunk
            # byte count delivered into buf[slot, rr]
            pltpu.make_async_copy(
                b_ref.at[0], buf.at[slot, rr], sems.at[slot, rr]
            ).wait()

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 1)
    alpha = ab_ref[0]
    beta = ab_ref[1]

    issue(0, 0)

    def body(g, _):
        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < ng)
        def _():
            issue(g + 1, jax.lax.rem(g + 1, 2))

        wait_group(g, slot)
        w = wvals_ref[g]  # (8, R)
        subw = subw_ref[g]  # (8, R)
        # per 128-lane panel c: target sublane of row o is subw*ns + c
        # (pads: subw = -1 → target c - ns < 0 never matches → exact 0)
        accs = []
        comps = []
        for c in range(ns):
            acc_c = jnp.zeros((8, 128), jnp.float32)
            comp_c = jnp.zeros((8, 128), jnp.float32)
            for rr in range(r):
                tgt = subw[:, rr] * ns + c  # (8,)
                sel = sub_iota == tgt[:, None, None]  # (8, 8, 1)
                part = jnp.sum(
                    jnp.where(sel, buf[slot, rr], 0.0), axis=1
                )  # (8, 128)
                if precise:
                    # exact product + Neumaier accumulate per slot
                    # (ops/df32.py): comp holds the overstatement, the
                    # product error folds into it
                    from sextans_tpu.ops.df32 import acc_step, two_prod

                    p, pe = two_prod(w[:, rr][:, None], part)
                    acc_c, comp_c = acc_step(acc_c, comp_c, p, pe)
                else:
                    acc_c = acc_c + w[:, rr][:, None] * part
            accs.append(acc_c)
            comps.append(comp_c)
        acc = accs[0] if ns == 1 else jnp.concatenate(accs, axis=1)
        if precise:
            from sextans_tpu.ops.df32 import compensated_epilogue

            comp = comps[0] if ns == 1 else jnp.concatenate(comps, axis=1)
            out_ref[g] = compensated_epilogue(
                alpha, acc, comp,
                beta if cin_ref is not None else None,
                cin_ref[g] if cin_ref is not None else None,
            )
        elif cin_ref is not None:
            out_ref[g] = alpha * acc + beta * cin_ref[g]
        else:
            out_ref[g] = alpha * acc
        return 0

    jax.lax.fori_loop(0, ng, body, 0, unroll=False)


@partial(
    jax.jit,
    static_argnames=("m_block", "m_base", "with_c", "interpret", "precise"),
)
def spmm_ell_gather_padded(
    vals: jax.Array,  # (m_padded, R) f32
    cols: jax.Array,  # (m_padded, R) i32
    fold_rows: jax.Array,  # (n_virt,) i32 — real row per virtual row
    b_padded: jax.Array,  # (k_pad, n_pad) f32; k_pad % 8 == 0
    c_padded: jax.Array,  # (m_padded, n_pad) f32
    alpha: jax.Array,
    beta: jax.Array,
    *,
    m_block: int,
    m_base: int,
    with_c: bool = True,
    interpret: bool = False,
    precise: bool = False,
) -> jax.Array:
    m_padded, r = vals.shape
    k_pad, n_pad = b_padded.shape
    if n_pad % 128 or (n_pad <= 1024 and 1024 % n_pad):
        raise ValueError(
            f"ell_pallas needs n_pad in {{128,256,512,1024}} or a multiple "
            f"of 1024, got {n_pad}"
        )
    if n_pad > 1024:
        # N panels of 1024: per-panel gather costs the same chunk traffic
        # as one fused pass would (a >1024-float row spans whole chunks)
        if n_pad % 1024:
            raise ValueError(f"n_pad {n_pad} must be a multiple of 1024")
        outs = [
            spmm_ell_gather_padded(
                vals, cols, fold_rows,
                jax.lax.dynamic_slice_in_dim(b_padded, j * 1024, 1024, 1),
                jax.lax.dynamic_slice_in_dim(c_padded, j * 1024, 1024, 1),
                alpha, beta, m_block=m_block, m_base=m_base,
                with_c=with_c, interpret=interpret, precise=precise,
            )
            for j in range(n_pad // 1024)
        ]
        return jnp.concatenate(outs, axis=1)

    ns = n_pad // 128
    p = 8 // ns  # B rows per 4 KiB chunk
    if k_pad % p:
        # ELL packs carry k_padded == k (whole-B gather, no K windowing);
        # align to the chunk granule here. Pad rows are only ever touched
        # as unused sublanes of a final partial chunk.
        b_padded = jnp.pad(b_padded, ((0, p - k_pad % p), (0, 0)))
        k_pad = b_padded.shape[0]
    if m_padded % m_block:
        raise ValueError(f"m_padded {m_padded} not a multiple of {m_block}")

    valid = vals != 0.0
    chunk = jnp.where(valid, cols // p, 0).astype(jnp.int32)
    subw = jnp.where(valid, cols % p, -1).astype(jnp.int32)

    groups = m_padded // 8
    n_blocks = m_padded // m_block
    ng = m_block // 8
    b3 = b_padded.reshape(k_pad // p, 8, 128)  # row-major bitcast

    chunk3 = chunk.reshape(groups, 8, r)
    subw3 = subw.reshape(groups, 8, r)
    vals3 = vals.reshape(groups, 8, r)
    ab = jnp.stack(
        [alpha.astype(jnp.float32), beta.astype(jnp.float32)]
    )

    in_specs = [
        pl.BlockSpec((ng, 8, r), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((ng, 8, r), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ng, 8, r), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [chunk3, subw3, vals3, ab, b3]
    if with_c:
        in_specs.append(
            pl.BlockSpec((ng, 8, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(c_padded.reshape(groups, 8, n_pad))

    # The precise drivers trace this function under jax.enable_x64 (for
    # the f64 fold below); the kernel body must NOT trace under it —
    # fori_loop induction variables become i64 and Mosaic's memref_slice
    # rejects them. Scope x64 off around the pallas_call only.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            partial(
                _kernel, ng=ng, r=r, ns=ns, with_c=with_c, precise=precise
            ),
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ng, 8, n_pad), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((groups, 8, n_pad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, r, 8, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, r)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*args)
    out = out.reshape(m_padded, n_pad)

    n_virt = fold_rows.shape[0]
    if n_virt:
        # fold virtual hub rows: the kernel's epilogue already applied
        # alpha/beta per padded row, so the virtual slice holds
        # alpha*AB_virt + beta*Cin_virt — strip the beta term before
        # folding so only alpha*AB_virt lands in the real rows (Cin_virt
        # is zero for plain calls but is a live carry in repeat chains)
        import numpy as _np

        use64 = precise and (
            jax.dtypes.canonicalize_dtype(_np.float64) == _np.float64
        )
        if use64:
            # precise fold in f64 (XLA-emulated on TPU): a hub row folds
            # deg/R virtual rows — each f32 scatter-add rounds at full
            # magnitude, so the fold chain alone can cost O(sqrt(v)) ulp.
            # Requires x64 enabled at trace time (the precise drivers wrap
            # calls in jax.enable_x64); falls back to f32 otherwise.
            add = jax.lax.dynamic_slice_in_dim(
                out, m_base, n_virt, 0
            ).astype(jnp.float64)
            if with_c:
                add = add - beta.astype(
                    jnp.float64
                ) * jax.lax.dynamic_slice_in_dim(
                    c_padded, m_base, n_virt, 0
                ).astype(jnp.float64)
            out = (
                out.astype(jnp.float64)
                .at[fold_rows]
                .add(add, indices_are_sorted=True, unique_indices=False)
                .astype(jnp.float32)
            )
        else:
            add = jax.lax.dynamic_slice_in_dim(out, m_base, n_virt, 0)
            if with_c:
                add = add - beta.astype(
                    jnp.float32
                ) * jax.lax.dynamic_slice_in_dim(c_padded, m_base, n_virt, 0)
            out = out.at[fold_rows].add(
                add,
                indices_are_sorted=True,
                unique_indices=False,
            )
    return out
