"""Rate probe for the chunk-gather ELL engine (ops/spmm_ell_pallas.py) on
the real TPU: DMA issue rate + gathered bandwidth + GF-equiv per (N, R,
m_block), against the band-gather numbers in dma_gather_probe.py.

Also measures the pad-skip payoff: same grid with 50% pad slots should
approach 2x the per-real-edge rate if the issue loop (not bandwidth) is
the floor.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sextans_tpu.ops.spmm_ell_pallas import spmm_ell_gather_padded


def run(m, k, n, npad, r, m_block, pad_frac=0.0, reps=5):
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((k, npad)).astype(np.float32))
    cols = rng.integers(0, k, (m, r)).astype(np.int32)
    vals = rng.standard_normal((m, r)).astype(np.float32)
    if pad_frac:
        mask = rng.random((m, r)) < pad_frac
        vals[mask] = 0.0
    nreal = int((vals != 0).sum())
    cols_d, vals_d = jnp.asarray(cols), jnp.asarray(vals)
    fold = jnp.empty((0,), jnp.int32)
    c = jnp.zeros((m, npad), jnp.float32)
    kw = dict(m_block=m_block, m_base=m, with_c=True)
    out = spmm_ell_gather_padded(vals_d, cols_d, fold, b, c,
                                 jnp.float32(1.0), jnp.float32(0.0), **kw)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = spmm_ell_gather_padded(vals_d, cols_d, fold, b, c,
                                     jnp.float32(1.0), jnp.float32(0.0), **kw)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    gf = 2.0 * nreal * n / dt / 1e9
    print(f"n={n:4d} npad={npad:4d} R={r} blk={m_block:4d} pad={pad_frac:.2f}: "
          f"{dt*1e3:8.2f} ms  {nreal/dt/1e6:7.2f} M dma/s  "
          f"{nreal*4096/dt/1e9:6.1f} GB/s  {gf:7.1f} GF-equiv", flush=True)


def main():
    k = 400_000 // 8 * 8
    m = 262_144
    for n, npad in ((512, 512), (128, 128), (16, 128)):
        for r in (4, 8):
            for blk in (256, 1024):
                try:
                    run(m, k, n, npad, r, blk)
                except Exception as e:
                    print(f"n={n} R={r} blk={blk}: FAILED {str(e)[:150]}",
                          flush=True)
    # pad-skip payoff
    for pf in (0.0, 0.5):
        try:
            run(m, k, 512, 512, 8, 256, pad_frac=pf)
        except Exception as e:
            print(f"pad={pf}: FAILED {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
