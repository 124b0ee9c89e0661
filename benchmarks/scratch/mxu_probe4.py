"""Probe 4: MXU vs VPU across FEM suite at N=512; crash minimization."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from benchmarks.matrices import suite as suite_gens
from sextans_tpu.format.pack import pack
from sextans_tpu.format.pack_mxu import pack_mxu
from sextans_tpu.format.csr import CSRMatrix
from sextans_tpu.ops.golden import golden_spmm
from sextans_tpu.ops.plan import SpmmPlan
from sextans_tpu.utils.config import SpmmConfig
from sextans_tpu.utils.timing import time_repeat
from sextans_tpu.utils.verify import gflops, verify
from sextans_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
print("devices:", jax.devices(), flush=True)

def bench(name, coo, cfg, fmt, n=512, times=128, tile_n=None, verify_gate=True):
    m, k = coo.shape
    rng = np.random.default_rng(0)
    b = rng.standard_normal((k, n)).astype(np.float32)
    c = rng.standard_normal((m, n)).astype(np.float32)
    try:
        t0 = time.perf_counter()
        p = pack_mxu(coo, cfg) if fmt == "mxu" else pack(coo, cfg)
        tp = time.perf_counter() - t0
        plan = SpmmPlan(p, n, backend="mxu" if fmt == "mxu" else "pallas", tile_n=tile_n)
        b_dev = jnp.asarray(b); c_dev = jnp.asarray(c)
        ver = "skip"
        if verify_gate:
            got = np.asarray(plan(b_dev, 0.85, -2.06, c_dev))
            ref = golden_spmm(CSRMatrix.from_coo(coo), b, 0.85, -2.06, c)
            ver = "pass" if verify(ref, got).passed else "FAIL"
        secs = min(time_repeat(plan, b_dev, 0.85, -2.06, c_dev, times=times) for _ in range(2))
        print(f"{name:16s} {fmt:4s} bk{cfg.block_k:<4d} tm{cfg.tile_m:<5d} wk{cfg.window_k:<5d} N={n:4d} "
              f"{secs*1e3:9.3f} ms {gflops(coo.nnz, m, n, secs):8.1f} GF fill={p.stats.block_fill:.3f} "
              f"blocks={p.stats.blocks} pack={tp:.1f}s verify={ver}", flush=True)
    except Exception as e:
        print(f"{name:16s} {fmt:4s} bk{cfg.block_k} tm{cfg.tile_m} wk{cfg.window_k} N={n} "
              f"FAILED {type(e).__name__}: {str(e)[:130]}", flush=True)

nasa = None
gens = suite_gens("small")
MX = SpmmConfig(tile_m=1024, window_k=4096, block_k=128, group_blocks=8, chunk_unroll=2)
VP = SpmmConfig()

# session canary
nasa = gens["nasa4704"]()
bench("nasa4704", nasa, VP, "vpu", times=512)
bench("nasa4704", nasa, MX, "mxu", times=512)

# crash minimization (nasa, N=512-ish shapes)
bench("nasa4704", nasa, MX.with_(tile_m=4864, window_k=4736), "mxu", n=16, times=64, verify_gate=False)   # reran of failing shape family at tn128: ran ok before
bench("nasa4704", nasa, MX.with_(tile_m=4864, window_k=4736), "mxu", n=512, times=64, tile_n=256, verify_gate=False)  # the crasher
bench("nasa4704", nasa, MX.with_(tile_m=4864, window_k=2048), "mxu", n=512, times=64, tile_n=256, verify_gate=False)
bench("nasa4704", nasa, MX.with_(tile_m=2432, window_k=4736), "mxu", n=512, times=64, tile_n=256, verify_gate=False)
# r1 bk=16 VPU crash repro
bench("nasa4704", nasa, SpmmConfig(block_k=16, group_blocks=64, tile_m=512, window_k=2048), "vpu", n=512, times=64, verify_gate=False)
bench("nasa4704", nasa, SpmmConfig(block_k=16, group_blocks=8, tile_m=512, window_k=2048), "vpu", n=512, times=64, verify_gate=False)

# FEM suite, MXU vs VPU
for nm in ("pdb1HYS_like", "pcrystk02_like", "cant_like", "consph_like", "shipsec1_like", "rma10_like", "dense2k", "laplace3d_64", "scircuit_like", "mac_econ_like"):
    coo = gens[nm]()
    bench(nm, coo, VP, "vpu", times=32)
    bench(nm, coo, MX, "mxu", times=32)
