"""Probe 3: single-window B, big tiles, precision ladder on nasa4704."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from sextans_tpu.io.mtx import read_mtx
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
refs = {}
def run(tag, cfg, n, times=1024, tile_n=None):
    if n not in refs:
        b = rng.standard_normal((k, n)).astype(np.float32)
        c = rng.standard_normal((m, n)).astype(np.float32)
        refs[n] = (b, c, golden_spmm(CSRMatrix.from_coo(coo), b, alpha, beta, c))
    b, c, ref = refs[n]
    try:
        p = pack_mxu(coo, cfg)
        plan = SpmmPlan(p, n, backend="mxu", tile_n=tile_n)
        b_dev = jnp.asarray(b); c_dev = jnp.asarray(c)
        got = np.asarray(plan(b_dev, alpha, beta, c_dev))
        res = verify(ref, got)
        secs = time_repeat(plan, b_dev, alpha, beta, c_dev, times=times)
        print(f"{tag:48s} N={n:4d} {secs*1e3:8.3f} ms {gflops(coo.nnz, m, n, secs):8.1f} GFLOPS verify={'pass' if res.passed else 'FAIL'} maxabs={res.max_abs_err:.2e}", flush=True)
    except Exception as e:
        print(f"{tag:48s} N={n:4d} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)

C = lambda **kw: SpmmConfig(**kw)
WK1 = 4736  # single window: round_up(4704, 128)
# canary repeat of yesterday's best for session comparison
run("bk128 tm1024 wk4096 gb8 unF (prev best)", C(tile_m=1024, window_k=4096, block_k=128, group_blocks=8, chunk_unroll=2), 512, times=512)
run("bk128 tm1024 wk4736(1win) gb8 unF", C(tile_m=1024, window_k=WK1, block_k=128, group_blocks=8, chunk_unroll=2), 512, times=512)
run("bk128 tm2048 wk4736(1win) gb8 unF", C(tile_m=2048, window_k=WK1, block_k=128, group_blocks=8, chunk_unroll=2), 512, times=512)
run("bk128 tm2048 wk4736 gb16 unF", C(tile_m=2048, window_k=WK1, block_k=128, group_blocks=16, chunk_unroll=2), 512, times=512)
run("bk128 tm4864(1tile) wk4736 gb8 unF tn256", C(tile_m=4864, window_k=WK1, block_k=128, group_blocks=8, chunk_unroll=2), 512, times=512, tile_n=256)
run("bk128 tm1024 wk4736 gb8 unF", C(tile_m=1024, window_k=WK1, block_k=128, group_blocks=8, chunk_unroll=2), 16)
run("bk128 tm2048 wk4736 gb8 unF", C(tile_m=2048, window_k=WK1, block_k=128, group_blocks=8, chunk_unroll=2), 16)
run("bk128 tm4864 wk4736 gb8 unF", C(tile_m=4864, window_k=WK1, block_k=128, group_blocks=8, chunk_unroll=2), 16)
run("bk128 tm4864 wk4736 gb32 unF", C(tile_m=4864, window_k=WK1, block_k=128, group_blocks=32, chunk_unroll=2), 16)
