"""Benchmark suite runner: SpMM GFLOPS across matrices and N widths.

The measurement protocol mirrors the reference host (src/sextans-host.cpp):
GFLOPS = 2*N*(nnz+M)/t with the kernel repeated through a data-dependency
chain (the rp_time analog), after a golden-model verification gate.

Usage:
    python benchmarks/suite.py [--scale small|full] [--n 16 128 512]
        [--backend auto|pallas|xla] [--autotune] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_one(name, coo, n, backend, use_autotune, rp_time=10, verify_gate=True,
            reorder_cols=False):
    import jax.numpy as jnp

    from sextans_tpu.format.csr import CSRMatrix
    from sextans_tpu.format.pack import pack
    from sextans_tpu.ops.golden import golden_spmm
    from sextans_tpu.ops.plan import SpmmPlan
    from sextans_tpu.utils.autotune import choose_config
    from sextans_tpu.utils.config import SpmmConfig
    from sextans_tpu.utils.timing import time_repeat
    from sextans_tpu.utils.verify import gflops, verify

    m, k = coo.shape
    alpha, beta = 0.85, -2.06
    rng = np.random.default_rng(0)
    b = rng.standard_normal((k, n)).astype(np.float32)
    c = rng.standard_normal((m, n)).astype(np.float32)

    coo_for_tuning = coo
    if reorder_cols:
        from sextans_tpu.format.pack import reorder_columns

        coo_for_tuning, _ = reorder_columns(coo)
    cfg = (
        choose_config(coo_for_tuning)[0].config if use_autotune else SpmmConfig()
    )
    t0 = time.perf_counter()
    packed = pack(coo, cfg, reorder_cols=reorder_cols)
    t_pack = time.perf_counter() - t0

    plan = SpmmPlan(packed, n, backend=backend)
    b_dev = jnp.asarray(b)
    c_dev = jnp.asarray(c)

    rec = {
        "matrix": name,
        "m": m,
        "k": k,
        "nnz": coo.nnz,
        "n": n,
        "backend": plan.backend,
        "block_k": cfg.block_k,
        "tile_m": cfg.tile_m,
        "window_k": cfg.window_k,
        "block_fill": round(packed.stats.block_fill, 4),
        "pack_s": round(t_pack, 3),
    }

    if verify_gate:
        got = np.asarray(plan(b_dev, alpha, beta, c_dev))
        ref = golden_spmm(CSRMatrix.from_coo(coo), b, alpha, beta, c)
        res = verify(ref, got)
        rec["verify"] = "pass" if res.passed else "FAIL"
        rec["max_abs_err"] = float(res.max_abs_err)
        if not res.passed:
            log(f"  !! verification failed: {res}")
            return rec

    secs = time_repeat(plan, b_dev, alpha, beta, c_dev, times=rp_time)
    rec["ms"] = round(secs * 1e3, 3)
    rec["gflops"] = round(gflops(coo.nnz, m, n, secs), 2)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="small", choices=["small", "full"])
    ap.add_argument("--n", type=int, nargs="+", default=[16, 128, 512])
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--autotune", action="store_true")
    ap.add_argument("--reorder-cols", action="store_true")
    ap.add_argument("--rp-time", type=int, default=10)
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument("--only", default=None, help="substring filter on matrix name")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from benchmarks.matrices import suite

    import jax

    from sextans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    results = []
    for name, gen in suite(args.scale).items():
        if args.only and args.only not in name:
            continue
        log(f"== {name} ==")
        t0 = time.perf_counter()
        coo = gen()
        log(f"  generated/loaded in {time.perf_counter()-t0:.1f}s: "
            f"{coo.shape} nnz={coo.nnz}")
        for n in args.n:
            rec = run_one(
                name, coo, n, args.backend, args.autotune,
                rp_time=args.rp_time, verify_gate=not args.no_verify,
                reorder_cols=args.reorder_cols,
            )
            results.append(rec)
            log(f"  N={n}: {rec.get('gflops', '-')} GFLOPS "
                f"({rec.get('ms', '-')} ms, bk={rec['block_k']}, "
                f"fill={rec['block_fill']}, verify={rec.get('verify', 'skipped')})")

    print(json.dumps(results, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))
    bad = [r for r in results if r.get("verify") == "FAIL"]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
