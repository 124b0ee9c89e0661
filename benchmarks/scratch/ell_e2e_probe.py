"""End-to-end ELL Pallas chunk-gather validation on the real TPU.

Packs the suite's scattered matrices with the pallas-engine chooser config,
runs SpmmPlan(backend auto -> ell_pallas), verifies a stratified sample
against the f64 oracle, and times with the suite's differential repeat
protocol. Prints per-(matrix, N) GFLOPS next to the canonical r4 row.
"""
import os
import sys

os.environ.setdefault("SEXTANS_PACK_CACHE_DIR", "/root/cache/sextans_pack_cache")
os.environ.setdefault("TMPDIR", "/root/cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np

import matrices as M
from suite import _csr_take_rows
from sextans_tpu.format.pack_ell import pack_ell
from sextans_tpu.format.csr import CSRMatrix
from sextans_tpu.ops.golden import golden_spmm_exact
from sextans_tpu.ops.plan import SpmmPlan
from sextans_tpu.utils.autotune import choose_config_ell
from sextans_tpu.utils.config import SpmmConfig
from sextans_tpu.utils.timing import time_repeat

CANON = {  # (matrix, n) -> canonical r4 GFLOPS
    ("amazon_like", 128): 7.99, ("amazon_like", 512): 8.15,
    ("webgraph_like", 128): 44.87, ("webgraph_like", 512): 41.58,
    ("mac_econ_like", 128): 21.9, ("mac_econ_like", 512): 62.12,
    ("roadnet_like", 128): None, ("roadnet_like", 512): None,
}


def main():
    import jax

    print("platform:", jax.devices()[0], flush=True)
    suite = M.suite("full")
    names = sys.argv[1:] or ["amazon_like", "roadnet_like"]
    for name in names:
        coo = suite[name]()
        m, k = coo.shape
        rng = np.random.default_rng(0)
        csr = CSRMatrix.from_coo(coo)
        for n in (128, 512):
            cands = choose_config_ell(coo, SpmmConfig(), top=1, n=n,
                                      engine="pallas")
            if not cands:
                print(f"{name} N={n}: no ELL candidate", flush=True)
                continue
            cfg = cands[0].config
            packed = pack_ell(coo, cfg)
            plan = SpmmPlan(packed, n, backend="ell_pallas")
            b = rng.standard_normal((k, n)).astype(np.float32)
            c0 = rng.standard_normal((m, n)).astype(np.float32)
            out = np.asarray(plan(b, 0.85, -1.06, c0))
            # stratified sample verify against the f64 oracle
            idx = np.sort(rng.choice(m, min(m, 4096), replace=False))
            want = golden_spmm_exact(
                _csr_take_rows(csr, idx), b, 0.85, -1.06, c0[idx]
            )
            err = np.max(np.abs(out[idx] - want))
            secs, info = time_repeat(plan, b, 1.0, 0.5, c0, times=10,
                                     detail=True)
            gf = 2.0 * coo.nnz * n / secs / 1e9
            base = CANON.get((name, n))
            print(f"{name} N={n}: R={cfg.ell_r} tile_m={cfg.tile_m} "
                  f"max_abs={err:.2e} {secs*1e3:.2f} ms  {gf:.1f} GFLOPS "
                  f"(canonical {base})  [{info['method']}]", flush=True)


if __name__ == "__main__":
    main()
