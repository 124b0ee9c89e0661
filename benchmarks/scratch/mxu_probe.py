"""Round-2 probe: MXU kernel vs VPU kernel on nasa4704 (real TPU)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from sextans_tpu.io.mtx import read_mtx
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

coo = read_mtx('/root/reference/matrices/nasa4704/nasa4704.mtx')
m, k = coo.shape
rng = np.random.default_rng(0)
alpha, beta = 0.85, -2.06

def run(tag, packed, backend, n, times=512):
    b = rng.standard_normal((k, n)).astype(np.float32)
    c = rng.standard_normal((m, n)).astype(np.float32)
    ref = golden_spmm(CSRMatrix.from_coo(coo), b, alpha, beta, c)
    try:
        plan = SpmmPlan(packed, n, backend=backend)
        b_dev = jnp.asarray(b); c_dev = jnp.asarray(c)
        got = np.asarray(plan(b_dev, alpha, beta, c_dev))
        res = verify(ref, got)
        secs = time_repeat(plan, b_dev, alpha, beta, c_dev, times=times)
        print(f"{tag:50s} N={n:4d} {secs*1e3:8.3f} ms {gflops(coo.nnz, m, n, secs):8.1f} GFLOPS verify={'pass' if res.passed else 'FAIL'} maxabs={res.max_abs_err:.2e}", flush=True)
        return secs
    except Exception as e:
        print(f"{tag:50s} N={n:4d} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None

# --- canary: VPU kernel, round-1 best config ---
vpu_packed = pack(coo, SpmmConfig())
run("canary vpu bk8 tm512 wk2048 gb256", vpu_packed, "pallas", 512)

# --- MXU configs, N=512 ---
for bk, tm, wk, gb, un in [
    (8, 512, 2048, 64, 1),
    (32, 512, 2048, 16, 1),
    (32, 512, 2048, 16, 2),
    (128, 512, 2048, 8, 2),
]:
    cfg = SpmmConfig(tile_m=tm, window_k=wk, block_k=bk, group_blocks=gb, chunk_unroll=un)
    t0 = time.perf_counter()
    p = pack_mxu(coo, cfg)
    print(f"  pack_mxu bk={bk}: {time.perf_counter()-t0:.2f}s blocks={p.stats.blocks} fill={p.stats.block_fill:.3f} groups={p.n_groups}", flush=True)
    run(f"mxu bk{bk} tm{tm} wk{wk} gb{gb} un{un}", p, "mxu", 512)

# --- N=16 comparison ---
run("canary vpu bk8 (N=16)", vpu_packed, "pallas", 16, times=1024)
for bk, tm, wk, gb, un in [
    (32, 512, 2048, 16, 2),
    (128, 512, 2048, 8, 2),
    (128, 1024, 4096, 8, 2),
]:
    cfg = SpmmConfig(tile_m=tm, window_k=wk, block_k=bk, group_blocks=gb, chunk_unroll=un)
    p = pack_mxu(coo, cfg)
    run(f"mxu bk{bk} tm{tm} wk{wk} gb{gb} un{un}", p, "mxu", 16, times=1024)
