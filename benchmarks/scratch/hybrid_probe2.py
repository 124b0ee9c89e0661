"""Hybrid probe 2: tiled DIA + head rows + recalibrated residue configs."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from benchmarks.matrices import suite as suite_gens
from sextans_tpu.format.csr import CSRMatrix
from sextans_tpu.ops.golden import golden_spmm
from sextans_tpu.ops.hybrid import HybridSpmmPlan, split_structure
from sextans_tpu.utils.config import SpmmConfig
from sextans_tpu.utils.timing import time_repeat
from sextans_tpu.utils.verify import gflops, verify
from sextans_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
print("devices:", jax.devices(), flush=True)
gens = suite_gens("small")

def run(nm, n, residue_cfg=None, residue_fmt=None, times0=64, split_kw=None):
    coo = gens[nm]()
    m, k = coo.shape
    rng = np.random.default_rng(0)
    b = rng.standard_normal((k, n)).astype(np.float32)
    c = rng.standard_normal((m, n)).astype(np.float32)
    try:
        split = split_structure(coo, **(split_kw or {}))
        plan = HybridSpmmPlan(split, n, residue_config=residue_cfg, residue_fmt=residue_fmt)
        b_dev = jnp.asarray(b); c_dev = jnp.asarray(c)
        got = np.asarray(plan(b_dev, 0.85, -2.06, c_dev))
        ref = golden_spmm(CSRMatrix.from_coo(coo), b, 0.85, -2.06, c)
        ver = verify(ref, got)
        times = times0
        secs = time_repeat(plan, b_dev, 0.85, -2.06, c_dev, times=times)
        while secs * times < 0.3 and times < 4096:
            times = min(4096, max(times * 4, int(0.35 / max(secs, 1e-6))))
            secs = time_repeat(plan, b_dev, 0.85, -2.06, c_dev, times=times)
        rc = plan.residue_config
        print(f"{nm:16s} N={n:4d} res={plan.residue_fmt} bk{rc.block_k} tm{rc.tile_m} tn{rc.tile_n} "
              f"{secs*1e3:9.3f} ms {gflops(coo.nnz, m, n, secs):8.1f} GF "
              f"[d{split.diag_offsets.size} h{split.head_cols.size} r{split.head_rows.size} res{split.residue.nnz}] "
              f"verify={'pass' if ver.passed else 'FAIL'} (T={times})", flush=True)
    except Exception as e:
        print(f"{nm:16s} N={n:4d} FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)

C = SpmmConfig
# tiled-DIA check first (pure-diag matrices)
run("laplace3d_64", 512)
run("mac_econ_like", 512)
run("scircuit_like", 512)
# webgraph residue A/B
run("webgraph_like", 512)  # autotuned residue (new model)
run("webgraph_like", 512, C(tile_m=2048, window_k=4096, block_k=8, group_blocks=128, tile_n=512), "vpu")
run("webgraph_like", 512, C(tile_m=4096, window_k=4096, block_k=8, group_blocks=128, tile_n=256), "vpu")
run("webgraph_like", 512, C(tile_m=2048, window_k=4096, block_k=2, group_blocks=512, tile_n=512), "vpu")
run("webgraph_like", 16)
