"""Bisect the tile_m~4864 MXU compiler-crash boundary (round-2 STATUS #3).

Round 2 observed: tile_m=4864 (wk=4736, tn=256) dies in the TPU compiler
(tpu_compile_helper exit 1) at ~20 MiB accounted working set while other
~21.8 MiB configs pass — so the 22 MiB guard may be modeling the wrong
variable. This probe bypasses check_kernel_vmem and sweeps tile_m, tile_n,
and window_k independently to find what the boundary actually tracks.
Compile-only verdicts (PASS/COMPILE-CRASH/RUN-FAIL) — no timing, so pool
contention is irrelevant.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

import sextans_tpu.utils.config as ucfg
from benchmarks.matrices import suite as suite_gens
from sextans_tpu.format.pack_mxu import pack_mxu
from sextans_tpu.format.pack_edge import pack_edge
from sextans_tpu.ops.plan import SpmmPlan
from sextans_tpu.utils.config import SpmmConfig
from sextans_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
print("devices:", jax.devices(), flush=True)

# bypass the guard: we want the compiler's own verdict
_real_check = ucfg.check_kernel_vmem
ucfg.check_kernel_vmem = lambda **kw: None

gens = suite_gens("small")
nasa = gens["nasa4704"]()


def ws_mib(cfg, tn, with_c=True, fmt="mxu"):
    if fmt == "mxu":
        total = (
            4 * cfg.tile_m * tn                      # acc
            + 4 * cfg.window_k * tn                  # B window
            + 4 * (2 if with_c else 1) * cfg.tile_m * tn   # C in+out
            + 2 * 4 * cfg.group_blocks * cfg.block_k * 8   # vals dbl-buf
        )
    else:
        total = (
            4 * cfg.tile_m * tn
            + 4 * cfg.window_k * tn
            + 4 * (2 if with_c else 1) * cfg.tile_m * tn
            + 2 * 8 * cfg.edge_chunk
        )
    return total / 2**20


def probe(tag, coo, cfg, fmt, n=512, tn=None):
    m, k = coo.shape
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    tn_eff = tn or cfg.resolve_tile_n(n)
    mib = ws_mib(cfg, tn_eff, fmt=fmt)
    try:
        packed = pack_mxu(coo, cfg) if fmt == "mxu" else pack_edge(coo, cfg)
        plan = SpmmPlan(packed, n, backend=fmt, tile_n=tn)
    except Exception as e:
        print(f"{tag:34s} ws={mib:6.1f}MiB PACK-FAIL {str(e)[-120:]}", flush=True)
        return
    try:
        out = np.asarray(plan(b, 0.85, -2.06, c))
        ok = np.isfinite(out).all()
        print(f"{tag:34s} ws={mib:6.1f}MiB PASS (finite={ok})", flush=True)
    except Exception as e:
        kind = "COMPILE-CRASH" if ("remote_compile" in str(e) or "500" in str(e)
                                   or "exit code" in str(e)) else type(e).__name__
        print(f"{tag:34s} ws={mib:6.1f}MiB {kind} {str(e)[-140:]}", flush=True)


C = SpmmConfig
# --- axis 1: tile_m at fixed tn=256, wk=4736 (the round-2 crash line) ---
for tm in (4096, 4352, 4608, 4864, 5120, 5632, 6144, 8192):
    probe(f"mxu tm={tm} tn=256 wk=4736", nasa,
          C(tile_m=tm, window_k=4736, block_k=128, group_blocks=8,
            chunk_unroll=2), "mxu", tn=256)

# --- axis 2: same tile_m=4864, smaller window (separates wk from tm) ---
for wk in (1024, 2048, 4096):
    probe(f"mxu tm=4864 tn=256 wk={wk}", nasa,
          C(tile_m=4864, window_k=wk, block_k=128, group_blocks=8,
            chunk_unroll=2), "mxu", tn=256)

# --- axis 3: same working set via tn=512 at half tile_m ---
for tm in (2048, 2432, 2560, 3072):
    probe(f"mxu tm={tm} tn=512 wk=4736", nasa,
          C(tile_m=tm, window_k=4736, block_k=128, group_blocks=8,
            chunk_unroll=2), "mxu", tn=512)

# --- edge kernel large windows (round-2 STATUS #4, untested envelope) ---
wg = gens["webgraph_like"]()
for wk, tn in ((32768, 128), (32768, 256), (16384, 512), (32768, 512)):
    probe(f"edge wk={wk} tn={tn}", wg,
          C(tile_m=8192, window_k=wk, edge_chunk=2048, edge_lanes=4),
          "edge", tn=tn)

ucfg.check_kernel_vmem = _real_check
print("done", flush=True)
