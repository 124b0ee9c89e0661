"""On-device kernel parameter sweep.

Run on the real TPU to map the kernel's performance surface:

    python benchmarks/tune_kernel.py [--matrix nasa4704|cant_like|...] [--n 512]

Sweeps (block_k, tile_m, window_k, group_blocks, n_acc, chunk_unroll, tile_n)
one axis at a time around the current default, timing each with the chained
harness after a correctness spot-check. Prints a sorted table and the best
config; use the result to update SpmmConfig defaults / autotune constants.
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", default="nasa4704")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--rp-time", type=int, default=10)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--full-grid", action="store_true",
                    help="cartesian product instead of one-axis-at-a-time")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from benchmarks.matrices import suite
    from sextans_tpu.format.pack import pack
    from sextans_tpu.ops.golden import golden_spmm
    from sextans_tpu.format.csr import CSRMatrix
    from sextans_tpu.ops.plan import SpmmPlan
    from sextans_tpu.utils.config import SpmmConfig
    from sextans_tpu.utils.timing import time_repeat
    from sextans_tpu.utils.verify import gflops, verify

    gens = suite("full")
    if args.matrix not in gens:
        raise SystemExit(f"unknown matrix {args.matrix}; have {list(gens)}")
    coo = gens[args.matrix]()
    m, k = coo.shape
    n = args.n
    log(f"{args.matrix}: {coo.shape} nnz={coo.nnz}, N={n}")

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    ref = golden_spmm(
        CSRMatrix.from_coo(coo), np.asarray(b), 0.85, -2.06, np.asarray(c)
    )

    axes = {
        "block_k": [2, 4, 8, 16],
        "tile_m": [256, 512, 1024],
        "window_k": [1024, 2048, 4096],
        "group_blocks": [128, 256, 512],
        "n_acc": [1, 2, 4],
        "chunk_unroll": [1, 2],
        "tile_n": [256, 512],
    }
    base = dict(block_k=8, tile_m=512, window_k=2048, group_blocks=256,
                n_acc=1, chunk_unroll=1, tile_n=512)

    if args.full_grid:
        combos = [dict(zip(axes, v)) for v in itertools.product(*axes.values())]
    else:
        combos = [dict(base)]
        for ax, vals in axes.items():
            for v in vals:
                if v != base[ax]:
                    d = dict(base)
                    d[ax] = v
                    combos.append(d)

    results = []
    packed_cache = {}
    for combo in combos:
        try:
            tn = combo.pop("tile_n")
            key = tuple(sorted(combo.items()))
            cfg = SpmmConfig(tile_n=tn, **combo)
            if key not in packed_cache:
                packed_cache[key] = pack(coo, cfg.with_(tile_n=None))
            packed = packed_cache[key]
            # rebind config w/ tile_n for the plan
            import dataclasses

            packed_cfg = packed.config.with_(
                tile_n=tn, n_acc=cfg.n_acc, chunk_unroll=cfg.chunk_unroll
            )
            packed2 = dataclasses.replace(packed, config=packed_cfg)
            plan = SpmmPlan(packed2, n, backend=args.backend)
            got = np.asarray(plan(b, 0.85, -2.06, c))
            res = verify(ref, got)
            if not res.passed:
                log(f"{combo} tile_n={tn}: VERIFY FAILED {res.mismatch_percent}%")
                continue
            secs = time_repeat(plan, b, 0.85, -2.06, c, times=args.rp_time)
            gf = gflops(coo.nnz, m, n, secs)
            rec = {**combo, "tile_n": tn, "ms": round(secs * 1e3, 3),
                   "gflops": round(gf, 1),
                   "fill": round(packed.stats.block_fill, 3)}
            results.append(rec)
            log(json.dumps(rec))
        except Exception as e:
            log(f"{combo}: failed {type(e).__name__}: {str(e)[:200]}")

    results.sort(key=lambda r: -r["gflops"])
    print(json.dumps(results, indent=1))
    if results:
        log(f"BEST: {results[0]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
