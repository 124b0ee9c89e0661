"""Measured precise-mode error floors per engine on the live backend.

Run from anywhere; compares every engine's precise levels against the f64
oracle on a 2048^2/200k-nnz random matrix and prints max-abs vs the f32
representation floor. Used to validate the round-5 df32 (EFT) work:
on TPU the compensated kernels must sit at/near the floor."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import numpy as np
from sextans_tpu.format.coo import COOMatrix
from sextans_tpu.format.csr import CSRMatrix
from sextans_tpu.format.pack import pack
from sextans_tpu.ops.plan import SpmmPlan
from sextans_tpu.ops.golden import golden_spmm_exact
from sextans_tpu.utils.config import SpmmConfig
from sextans_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

rng = np.random.default_rng(0)
m = k = 2048
nnz = 200000
coo = COOMatrix((m, k), rng.integers(0, m, nnz).astype(np.int32),
                rng.integers(0, k, nnz).astype(np.int32),
                rng.standard_normal(nnz).astype(np.float32))
csr = CSRMatrix.from_coo(coo)
n = 128
b = rng.standard_normal((k, n)).astype(np.float32)
c = rng.standard_normal((m, n)).astype(np.float32)
alpha, beta = 0.85, -2.06
exact = golden_spmm_exact(csr, b, alpha, beta, c)
cmax = np.abs(exact).max()
floor = np.abs(exact.astype(np.float32).astype(np.float64) - exact).max()
print(f"max|C|={cmax:.2f} ulp={np.spacing(np.float32(cmax)):.2e} floor={floor:.3e}")
for prec in (False, True, 2):
    cfg = SpmmConfig(precise=prec)
    p = SpmmPlan(pack(coo, cfg), n, backend="pallas")
    got = np.asarray(p(b, alpha, beta, c)).astype(np.float64)
    print(f"vpu precise={prec}: max={np.abs(got-exact).max():.3e}", flush=True)
from sextans_tpu.format.pack_edge import pack_edge
for prec in (True, 2):
    cfg = SpmmConfig(precise=prec)
    p = SpmmPlan(pack_edge(coo, cfg), n, backend="edge")
    got = np.asarray(p(b, alpha, beta, c)).astype(np.float64)
    print(f"edge precise={prec}: max={np.abs(got-exact).max():.3e}", flush=True)
from sextans_tpu.format.pack_mxu import pack_mxu
for prec in (False, True):
    cfg = SpmmConfig(tile_m=1024, window_k=4096, block_k=128,
                     group_blocks=8, chunk_unroll=2, precise=prec)
    p = SpmmPlan(pack_mxu(coo, cfg), n, backend="mxu")
    got = np.asarray(p(b, alpha, beta, c)).astype(np.float64)
    print(f"mxu precise={prec}: max={np.abs(got-exact).max():.3e}", flush=True)
from sextans_tpu.format.pack_ell import pack_ell
for prec in (False, True):
    cfg = SpmmConfig(precise=prec)
    pk = pack_ell(coo, cfg)
    p = SpmmPlan(pk, n, backend="ell_pallas")
    with jax.enable_x64(True):
        got = np.asarray(p(b, alpha, beta, c)).astype(np.float64)
    print(f"ell_pallas precise={prec}: max={np.abs(got-exact).max():.3e}",
          flush=True)
