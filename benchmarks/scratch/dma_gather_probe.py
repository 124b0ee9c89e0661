"""Microprobe: aligned-band async-DMA gather rate from HBM on the TPU.

Round-4 motivation: the pure-XLA ELL gather engine (ops/spmm_ell_xla.py)
measured 37 s/call on amazon_like N=512 (0.1 GFLOPS) — XLA lowers jnp.take
to a serialized full-latency loop. A Pallas kernel can pipeline dynamic
`make_async_copy` gathers instead, but Mosaic constrains HBM slices to the
(8, 128) tile grid: the minimum gather granule for B rows is an aligned
(8, N) *band* (measured here; single-row slices are rejected with "Slice
shape along dimension 0 must be aligned to tiling (8)").

Kernel design measured here (the real engine's shape):
  B pre-shaped (K/8, 8, N); per output 8-row group and slot r, fetch the 8
  bands containing the 8 referenced rows (8*R band-DMAs, double-buffered
  across groups), then extract each target row from its band with a
  one-hot sublane mask + sum (pure aligned VPU — no dynamic-sublane
  extracts), multiply by the slot value and accumulate.

Numbers this probe answers:
  * sustainable DMA issue rate (M dma/s) — the per-edge floor;
  * gathered bandwidth (GB/s) — the traffic floor at 8-row granularity;
  * end-to-end GFLOPS-equivalent for an ELL row at each (N, R).
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_spmm_kernel(bands_ref, subs_ref, vals_ref, b_ref, out_ref,
                       buf, sems, *, n_groups, r, n):
    """One grid step: BLOCK = n_groups*8 rows of out.

    bands_ref: (n_groups, 8, R) i32 SMEM — B band index per (row, slot)
    subs_ref:  (n_groups, 8, R) i32 VMEM — sublane within the band
    vals_ref:  (n_groups, 8, R) f32 VMEM — slot weights
    b_ref:     (K/8, 8, N) f32 ANY (HBM) — gather table
    out_ref:   (n_groups, 8, N) f32 VMEM
    buf:       (2, R, 8, 8, N) f32 VMEM — [slot][r][row_in_group] = band
    sems:      (2, R, 8) DMA semaphores
    """

    def issue(g, slot):
        for rr in range(r):
            for s in range(8):
                band = bands_ref[g, s, rr]
                pltpu.make_async_copy(
                    b_ref.at[band],
                    buf.at[slot, rr, s],
                    sems.at[slot, rr, s],
                ).start()

    def wait_group(slot):
        for rr in range(r):
            for s in range(8):
                pltpu.make_async_copy(
                    b_ref.at[0],
                    buf.at[slot, rr, s],
                    sems.at[slot, rr, s],
                ).wait()

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 1)

    issue(0, 0)

    def body(g, _):
        slot = jax.lax.rem(g, 2)
        nslot = jax.lax.rem(g + 1, 2)

        @pl.when(g + 1 < n_groups)
        def _():
            issue(g + 1, nslot)

        wait_group(slot)
        w = vals_ref[g]  # (8, R)
        subs = subs_ref[g]  # (8, R)
        acc = jnp.zeros((8, n), jnp.float32)
        for rr in range(r):
            sel = (subs[:, rr][:, None, None] == sub_iota).astype(jnp.float32)
            row = jnp.sum(buf[slot, rr] * sel, axis=1)  # (8, N)
            acc = acc + w[:, rr][:, None] * row
        out_ref[g] = acc
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0, unroll=False)


@partial(jax.jit, static_argnames=("block", "r", "n"))
def gather_spmm(cols, vals, b, *, block, r, n):
    m_padded = cols.shape[0]
    k = b.shape[0]
    n_groups_blk = block // 8
    n_blocks = m_padded // block
    groups = n_blocks * n_groups_blk
    bands = (cols // 8).reshape(groups, 8, r)
    subs = (cols % 8).reshape(groups, 8, r)
    vals3 = vals.reshape(groups, 8, r)
    b3 = b.reshape(k // 8, 8, n)
    out = pl.pallas_call(
        partial(gather_spmm_kernel, n_groups=n_groups_blk, r=r, n=n),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_groups_blk, 8, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_groups_blk, 8, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups_blk, 8, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((n_groups_blk, 8, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((groups, 8, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, r, 8, 8, n), jnp.float32),
            pltpu.SemaphoreType.DMA((2, r, 8)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(bands, subs, vals3, b3)
    return out.reshape(m_padded, n)


def main():
    rng = np.random.default_rng(0)

    # --- correctness, small ---
    k, n, r, block, m = 4096, 256, 4, 64, 512
    b = rng.standard_normal((k, n)).astype(np.float32)
    cols = rng.integers(0, k, (m, r)).astype(np.int32)
    vals = rng.standard_normal((m, r)).astype(np.float32)
    got = np.asarray(gather_spmm(jnp.asarray(cols), jnp.asarray(vals),
                                 jnp.asarray(b), block=block, r=r, n=n))
    want = np.einsum("mr,mrn->mn", vals, b[cols])
    err = np.abs(got - want).max()
    print(f"correctness: max_abs_err={err:.2e}", flush=True)
    assert err < 1e-4, "gather kernel wrong"

    # --- rate sweep ---
    k = 400_000 // 8 * 8
    for n in (512, 128, 16):
        b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
        for r in (2, 4, 8):
            for block in (256, 1024):
                m = 262_144
                cols = jnp.asarray(
                    rng.integers(0, k, (m, r)).astype(np.int32))
                vals = jnp.asarray(
                    rng.standard_normal((m, r)).astype(np.float32))
                try:
                    out = gather_spmm(cols, vals, b, block=block, r=r, n=n)
                    out.block_until_ready()
                    reps = 5
                    t0 = time.perf_counter()
                    for _ in range(reps):
                        out = gather_spmm(cols, vals, b, block=block,
                                          r=r, n=n)
                    out.block_until_ready()
                    dt = (time.perf_counter() - t0) / reps
                    dmas = m * r
                    gf = 2.0 * m * r * n / dt / 1e9  # FLOPs of the FMA
                    print(f"n={n:4d} R={r} block={block:5d}: "
                          f"{dt * 1e3:8.2f} ms  {dmas / dt / 1e6:7.2f} M dma/s  "
                          f"{dmas * (4 * n * 8) / dt / 1e9:7.1f} GB/s band  "
                          f"{gf:7.1f} GF-equiv", flush=True)
                except Exception as e:
                    print(f"n={n:4d} R={r} block={block:5d}: FAILED "
                          f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
