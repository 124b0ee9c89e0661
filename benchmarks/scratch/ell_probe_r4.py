"""Round-4 ELL diagnosis: does the HBM-gather engine deliver on the
scattered classes at all, measured directly on the TPU?

VERDICT r3: ELL has zero canonical wins — either the engine underdelivers
or it was never properly raced (the hybrid path's measured race only pits
hybrid vs the model's top-1 single-engine candidate, suite.py:430).
This probe answers the first question with direct measurements:
ELL (several R) vs the canonical winner's GFLOPS on the scattered rows.

Usage: python benchmarks/scratch/ell_probe_r4.py [matrix ...]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from suite import _gen_cached  # noqa: E402
import matrices as M  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from sextans_tpu.format.pack_ell import (  # noqa: E402
    choose_slots_per_row,
    pack_ell,
)
from sextans_tpu.ops.plan import SpmmPlan  # noqa: E402
from sextans_tpu.utils.config import SpmmConfig  # noqa: E402

CANON = {  # (matrix, n) -> canonical r3+pass08 GFLOPS (the bar to beat)
    ("amazon_like", 16): 1.1, ("amazon_like", 128): 8.0,
    ("amazon_like", 512): 8.2,
    ("webgraph_like", 16): 5.2, ("webgraph_like", 128): 44.9,
    ("webgraph_like", 512): 41.6,
    ("mac_econ_like", 16): 1.6, ("mac_econ_like", 128): 21.9,
    ("mac_econ_like", 512): 62.1,
    ("scircuit_like", 16): 5.9, ("scircuit_like", 128): 47.3,
    ("scircuit_like", 512): 90.6,
}


def time_plan(plan, b, c, nnz, m, n):
    out = plan(b, 0.85, -2.06, c)
    out.block_until_ready()
    times = 16
    secs = 1e9
    while True:
        t0 = time.perf_counter()
        np.asarray(plan.repeat(b, 0.85, -2.06, c, times=times))
        secs = (time.perf_counter() - t0) / times
        if secs * times > 0.5 or times >= 2048:
            break
        times = min(2048, max(times * 8, int(0.6 / max(secs, 1e-7))))
    gf = 2.0 * n * (nnz + m) / secs / 1e9
    return secs * 1e3, gf


def main(names):
    gens = M.suite("full")
    for name in names:
        coo = _gen_cached(name, gens[name])
        m, k = coo.shape
        deg = np.bincount(coo.rows, minlength=m)
        print(f"\n== {name} {coo.shape} nnz={coo.nnz} "
              f"deg mean={deg.mean():.1f} p99={np.percentile(deg, 99):.0f} "
              f"max={deg.max()}", flush=True)
        for n in (512, 128, 16):
            rng = np.random.default_rng(0)
            b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
            c = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
            r_model = choose_slots_per_row(coo, n=n)
            rset = sorted({r_model, 2, 4, 8})
            for r in rset:
                for tile_m in (1024, 8192):
                    try:
                        t0 = time.perf_counter()
                        packed = pack_ell(
                            coo, SpmmConfig(tile_m=tile_m), slots_per_row=r
                        )
                        tp = time.perf_counter() - t0
                        plan = SpmmPlan(packed, n)
                        ms, gf = time_plan(plan, b, c, coo.nnz, m, n)
                        bar = CANON.get((name, n))
                        rel = f" ({gf / bar:.1f}x canon)" if bar else ""
                        star = "*" if r == r_model else " "
                        print(f"  n={n:4d} R={r:2d}{star} tm={tile_m:5d} "
                              f"pack {tp:5.1f}s  {ms:8.3f} ms  "
                              f"{gf:7.1f} GF{rel}", flush=True)
                    except Exception as e:
                        print(f"  n={n:4d} R={r:2d} tm={tile_m:5d} "
                              f"FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["amazon_like", "webgraph_like"])
