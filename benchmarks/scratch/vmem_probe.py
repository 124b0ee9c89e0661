"""Probe the raised scoped-VMEM cap (100 MiB): regression-check the best
known configs, retry the previously-OOM shape, and try big-tile configs
that the 16 MiB default forbade."""
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
from sextans_tpu.ops.hybrid import HybridSpmmPlan, split_structure
from sextans_tpu.utils.config import SpmmConfig
from sextans_tpu.utils.timing import time_repeat
from sextans_tpu.utils.verify import gflops, verify
from sextans_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
print("devices:", jax.devices(), flush=True)
gens = suite_gens("small")

def bench(name, coo, cfg, fmt, n=512, times=256, tile_n=None, verify_gate=True):
    m, k = coo.shape
    rng = np.random.default_rng(0)
    b = rng.standard_normal((k, n)).astype(np.float32)
    c = rng.standard_normal((m, n)).astype(np.float32)
    try:
        p = pack_mxu(coo, cfg) if fmt == "mxu" else pack(coo, cfg)
        plan = SpmmPlan(p, n, backend="mxu" if fmt == "mxu" else "pallas", tile_n=tile_n)
        b_dev = jnp.asarray(b); c_dev = jnp.asarray(c)
        ver = "skip"
        if verify_gate:
            got = np.asarray(plan(b_dev, 0.85, -2.06, c_dev))
            ref = golden_spmm(CSRMatrix.from_coo(coo), b, 0.85, -2.06, c)
            ver = "pass" if verify(ref, got).passed else "FAIL"
        else:
            np.asarray(plan(b_dev, 0.85, -2.06, c_dev))
        secs = min(time_repeat(plan, b_dev, 0.85, -2.06, c_dev, times=times) for _ in range(2))
        print(f"{name:14s} {fmt:4s} bk{cfg.block_k:<4d} tm{cfg.tile_m:<5d} wk{cfg.window_k:<5d} tn{tile_n or cfg.tile_n} N={n:4d} "
              f"{secs*1e3:9.3f} ms {gflops(coo.nnz, m, n, secs):8.1f} GF verify={ver}", flush=True)
    except Exception as e:
        print(f"{name:14s} {fmt:4s} bk{cfg.block_k} tm{cfg.tile_m} wk{cfg.window_k} N={n} FAILED {type(e).__name__}: {str(e)[-180:]}", flush=True)

C = SpmmConfig
nasa = gens["nasa4704"]()
# canaries under the new cap
bench("nasa", nasa, C(), "vpu", times=512)
bench("nasa", nasa, C(tile_m=1024, window_k=4096, block_k=128, group_blocks=8, chunk_unroll=2), "mxu", times=512)
# CT kernel at N=16 (first TPU run)
bench("nasa", nasa, C(tile_m=2048, window_k=4736, block_k=128, group_blocks=32, chunk_unroll=2), "mxu", n=16, times=1024)
bench("nasa", nasa, C(tile_m=1024, window_k=4096, block_k=128, group_blocks=8, chunk_unroll=2), "mxu", n=16, times=1024)
# previously-OOM VPU shape (wk4096 tn256 on webgraph residue-oid): use webgraph itself
wg = gens["webgraph_like"]()
bench("webgraph", wg, C(tile_m=1024, window_k=4096, block_k=8, group_blocks=128, tile_n=256), "vpu", times=16)
# big-tile configs newly unlocked
bench("webgraph", wg, C(tile_m=4096, window_k=4096, block_k=8, group_blocks=128, tile_n=512), "vpu", times=16)
bench("webgraph", wg, C(tile_m=8192, window_k=4096, block_k=8, group_blocks=128, tile_n=512), "vpu", times=16)
# nasa big window single-pass B
bench("nasa", nasa, C(tile_m=4864, window_k=4736, block_k=128, group_blocks=8, chunk_unroll=2), "mxu", times=512)
