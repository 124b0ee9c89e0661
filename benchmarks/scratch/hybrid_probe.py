"""Hybrid TPU probe: webgraph (head+residue) and laplace3d (pure DIA)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from benchmarks.matrices import suite as suite_gens
from sextans_tpu.format.csr import CSRMatrix
from sextans_tpu.ops.golden import golden_spmm
from sextans_tpu.ops.hybrid import HybridSpmmPlan, split_structure
from sextans_tpu.utils.timing import time_repeat
from sextans_tpu.utils.verify import gflops, verify
from sextans_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
print("devices:", jax.devices(), flush=True)
gens = suite_gens("small")
for nm, n in [("webgraph_like", 512), ("laplace3d_64", 512), ("scircuit_like", 512), ("mac_econ_like", 512), ("webgraph_like", 16)]:
    coo = gens[nm]()
    m, k = coo.shape
    rng = np.random.default_rng(0)
    b = rng.standard_normal((k, n)).astype(np.float32)
    c = rng.standard_normal((m, n)).astype(np.float32)
    try:
        split = split_structure(coo)
        print(f"{nm}: {split.summary()}", flush=True)
        t0 = time.perf_counter()
        plan = HybridSpmmPlan(split, n)
        print(f"  plan built in {time.perf_counter()-t0:.1f}s residue_fmt={plan.residue_fmt} cfg={plan.residue_config}", flush=True)
        b_dev = jnp.asarray(b); c_dev = jnp.asarray(c)
        got = np.asarray(plan(b_dev, 0.85, -2.06, c_dev))
        ref = golden_spmm(CSRMatrix.from_coo(coo), b, 0.85, -2.06, c)
        ver = verify(ref, got)
        times = 64
        secs = time_repeat(plan, b_dev, 0.85, -2.06, c_dev, times=times)
        while secs * times < 0.3 and times < 4096:
            times = min(4096, max(times * 4, int(0.35 / max(secs, 1e-6))))
            secs = time_repeat(plan, b_dev, 0.85, -2.06, c_dev, times=times)
        print(f"  N={n}: {secs*1e3:.3f} ms  {gflops(coo.nnz, m, n, secs):.1f} GFLOPS  verify={'pass' if ver.passed else 'FAIL'} maxabs={ver.max_abs_err:.2e} (times={times})", flush=True)
    except Exception as e:
        print(f"  FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
