"""One-shot TPU measurement session.

Runs everything worth knowing in a single process (amortizing the device
claim + compiles, and minimizing risk on a fragile tunnel):

1. nasa4704 N=512 across kernel-config candidates (the bench headline);
2. nasa4704 N=16 (the reference's canonical config);
3. the small suite at N=512 with analytic autotune.

Writes JSON records to --out (default benchmarks/tpu_session_results.json)
as it goes (flushed after every record, so a crash keeps partial results).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/tpu_session_results.json")
    ap.add_argument("--times", type=int, default=32)
    ap.add_argument("--skip-suite", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from benchmarks.matrices import suite
    from sextans_tpu.format.csr import CSRMatrix
    from sextans_tpu.format.pack import pack
    from sextans_tpu.ops.golden import golden_spmm
    from sextans_tpu.ops.plan import SpmmPlan
    from sextans_tpu.utils.autotune import choose_config
    from sextans_tpu.utils.config import SpmmConfig
    from sextans_tpu.utils.timing import time_repeat
    from sextans_tpu.utils.verify import gflops, verify

    log(f"devices: {jax.devices()}")
    results = []
    out_path = Path(args.out)

    def record(rec):
        results.append(rec)
        out_path.write_text(json.dumps(results, indent=1))
        log(json.dumps(rec))

    def measure(name, coo, n, cfg, tile_n=None, backend="pallas"):
        m, k = coo.shape
        alpha, beta = 0.85, -2.06
        rng = np.random.default_rng(0)
        b = rng.standard_normal((k, n)).astype(np.float32)
        c = rng.standard_normal((m, n)).astype(np.float32)
        rec = {
            "matrix": name, "n": n, "nnz": coo.nnz, "backend": backend,
            "block_k": cfg.block_k, "tile_m": cfg.tile_m,
            "window_k": cfg.window_k, "group_blocks": cfg.group_blocks,
            "n_acc": cfg.n_acc, "tile_n": tile_n,
        }
        try:
            packed = pack(coo, cfg)
            if tile_n is not None:
                packed = dataclasses.replace(
                    packed, config=packed.config.with_(tile_n=tile_n)
                )
            rec["fill"] = round(packed.stats.block_fill, 3)
            plan = SpmmPlan(packed, n, backend=backend)
            b_dev, c_dev = jnp.asarray(b), jnp.asarray(c)
            got = np.asarray(plan(b_dev, alpha, beta, c_dev))
            ref = golden_spmm(CSRMatrix.from_coo(coo), b, alpha, beta, c)
            v = verify(ref, got)
            rec["verify"] = "pass" if v.passed else "FAIL"
            rec["max_abs_err"] = float(v.max_abs_err)
            if v.passed:
                secs = time_repeat(
                    plan, b_dev, alpha, beta, c_dev, times=args.times
                )
                rec["ms"] = round(secs * 1e3, 4)
                rec["gflops"] = round(gflops(coo.nnz, m, n, secs), 1)
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        record(rec)
        return rec

    gens = suite("small")
    nasa = gens["nasa4704"]() if "nasa4704" in gens else None

    if nasa is not None:
        # 1. headline config race at N=512
        for cfg, tn in [
            (SpmmConfig(), None),                      # proven default
            (SpmmConfig(n_acc=2), None),               # dual accumulator
            (SpmmConfig(n_acc=2), 256),                # low VMEM
            (SpmmConfig(n_acc=4), 256),                # more ILP, low VMEM
            (SpmmConfig(n_acc=2, tile_m=1024), 256),   # fewer B refetches
            (SpmmConfig(n_acc=2, window_k=4096), 256), # bigger windows
            (SpmmConfig(block_k=4, group_blocks=512, n_acc=2), 256),
            (SpmmConfig(group_blocks=512, n_acc=2), 256),
            (SpmmConfig(group_blocks=1024, n_acc=2), 256),
        ]:
            measure("nasa4704", nasa, 512, cfg, tile_n=tn)
        # 2. the reference's canonical N=16 run
        measure("nasa4704", nasa, 16, SpmmConfig(n_acc=2))

    if not args.skip_suite:
        for name, gen in gens.items():
            if name == "nasa4704":
                continue
            coo = gen()
            cfg = choose_config(coo)[0].config.with_(n_acc=2)
            measure(name, coo, 512, cfg, tile_n=256)

    log(f"wrote {len(results)} records to {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
