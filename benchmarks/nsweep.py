"""N-sweep on nasa4704: both kernel families across N in {8..512}.

The reference's canonical workload is N=16 (CMakeLists.txt:49) and its
N-slab design keeps throughput N-independent; this sweep documents how the
TPU engines behave across output widths (the round-2 skinny-N story:
MXU CT kernel at N<=32, standard MXU above).

Usage: python benchmarks/nsweep.py [--out benchmarks/results_r2_nsweep.json]
"""
import argparse
import json
import sys
from datetime import datetime, timezone
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--ns", type=int, nargs="+",
                    default=[8, 16, 32, 64, 128, 256, 512])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from benchmarks.matrices import suite as suite_gens
    from benchmarks.suite import HEALTHY_CANARY_MS, make_fast_canary
    from sextans_tpu.format.csr import CSRMatrix
    from sextans_tpu.format.pack import pack
    from sextans_tpu.format.pack_mxu import pack_mxu
    from sextans_tpu.ops.golden import golden_spmm
    from sextans_tpu.ops.plan import SpmmPlan
    from sextans_tpu.utils.cache import enable_compilation_cache
    from sextans_tpu.utils.config import SpmmConfig
    from sextans_tpu.utils.timing import time_repeat
    from sextans_tpu.utils.verify import gflops, verify

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    coo = suite_gens("small")["nasa4704"]()
    m, k = coo.shape
    canary = make_fast_canary()
    session = {
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "device": str(jax.devices()[0]),
        "nasa_canary_ms": canary(),
    }
    log(f"canary: {session['nasa_canary_ms']} ms")

    vpu_packed = pack(coo, SpmmConfig())
    mxu_small = pack_mxu(coo, SpmmConfig(
        tile_m=2048, window_k=4736, block_k=128, group_blocks=32,
        chunk_unroll=2))
    mxu_big = pack_mxu(coo, SpmmConfig(
        tile_m=1024, window_k=4096, block_k=128, group_blocks=8,
        chunk_unroll=2))

    rng = np.random.default_rng(0)
    alpha, beta = 0.85, -2.06
    rows = []
    for n in args.ns:
        b = rng.standard_normal((k, n)).astype(np.float32)
        c = rng.standard_normal((m, n)).astype(np.float32)
        ref = golden_spmm(CSRMatrix.from_coo(coo), b, alpha, beta, c)
        b_dev, c_dev = jnp.asarray(b), jnp.asarray(c)
        for fmt, packed in (("vpu", vpu_packed),
                            ("mxu", mxu_small if n <= 32 else mxu_big)):
            try:
                plan = SpmmPlan(packed, n,
                                backend="pallas" if fmt == "vpu" else "mxu")
                got = np.asarray(plan(b_dev, alpha, beta, c_dev))
                ver = verify(ref, got)
                # canary-gated timing (same protocol as suite.py)
                import time as _t

                pre = None
                for attempt in range(6):
                    pre = canary()
                    if pre <= HEALTHY_CANARY_MS:
                        break
                    log(f"  canary {pre} ms: contended, backing off 60s")
                    _t.sleep(60)
                times = 256
                secs = time_repeat(plan, b_dev, alpha, beta, c_dev,
                                   times=times)
                while secs * times < 0.3 and times < 4096:
                    times = min(4096, int(0.35 / max(secs, 1e-6)))
                    secs = time_repeat(plan, b_dev, alpha, beta, c_dev,
                                       times=times)
                post = canary()
                row = {
                    "n": n, "fmt": fmt, "ms": round(secs * 1e3, 4),
                    "gflops": round(gflops(coo.nnz, m, n, secs), 1),
                    "verify": "pass" if ver.passed else "FAIL",
                    "ct_kernel": fmt == "mxu" and n <= 32,
                    "canary_pre_ms": pre, "canary_post_ms": post,
                }
                if post > HEALTHY_CANARY_MS:
                    row["canary_unhealthy"] = True
            except Exception as e:
                row = {"n": n, "fmt": fmt, "error": repr(e)[:160]}
            rows.append(row)
            log(str(row))

    doc = {"session": session, "matrix": "nasa4704", "rows": rows}
    print(json.dumps(doc, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(doc, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
