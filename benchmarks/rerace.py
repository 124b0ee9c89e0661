"""Targeted re-race driver: revisit canonical rows the model now beats.

Coverage-first overnight passes never re-time a canary-healthy row
(suite.py --skip-covered), so a row frozen on an early weak winner stays
frozen even after the engine roster or cost models improve (round-3
examples: mac_econ N=16 at 1.6 GFLOPS from a mis-ranked hybrid; amazon
N=128 at 8 GFLOPS before the ELL gather engine existed). This driver is
the host-side reverse store challenge applied to the WHOLE canonical
table:

1. load the canonical results file;
2. for each row, compute the CURRENT best analytic prediction across all
   kernel families (`choose_backend`, pure host work — no device time);
3. rank rows by predicted_speedup = measured_time / predicted_time;
4. re-run every row above ``--ratio`` (worst first) through suite.py
   WITHOUT --skip-covered, writing numbered pass files the canonical
   merge picks up (fastest healthy sample wins, so a re-race can only
   improve the table).

Usage:
    python benchmarks/rerace.py --results benchmarks/results_r3.json \
        [--ratio 2.0] [--hours 2] [--max-nnz 25000000] [--dry-run]
        [--also-merge benchmarks/results_r2.json]
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
import time
from datetime import datetime
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

CLOCK_HZ = 0.94e9  # v5e core clock the cost models are calibrated against


def log(msg):
    print(f"[rerace {datetime.now().strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def candidates(results_path, ratio, max_nnz, n_filter=None):
    import json

    import numpy as np

    from benchmarks.matrices import suite
    from benchmarks.suite import _gen_cached, cover_upper_bound
    from sextans_tpu.utils.autotune import choose_backend, hybrid_cost

    doc = json.loads(Path(results_path).read_text())
    gens = suite("full")
    rows = [r for r in doc.get("results", []) if "gflops" in r]
    out = []
    coo_cache = {}
    split_cache = {}
    for r in rows:
        name, n = r["matrix"], r["n"]
        if n_filter and n not in n_filter:
            continue
        if name not in gens:
            continue
        if name not in coo_cache:
            coo_cache[name] = _gen_cached(name, gens[name])
        coo = coo_cache[name]
        if coo.nnz > max_nnz:
            continue
        best = choose_backend(coo, n=n, top=1)[0]
        pred_s = best.predicted_cost / CLOCK_HZ
        fmt = best.fmt
        # The blocked chooser is blind to the hybrid/DIA family, so a
        # stencil-class row frozen on a weak winner never ranks (r4
        # example: mc2depi's DIA headroom). Screen with the same cheap
        # cover bound the suite uses, then cost the real split (cached
        # per matrix — the split is N-independent, its cost is not).
        if cover_upper_bound(coo) >= 0.3 and coo.nnz >= 50_000:
            if name not in split_cache:
                from sextans_tpu.ops.hybrid import split_structure

                try:
                    split_cache[name] = split_structure(coo)
                except Exception:
                    split_cache[name] = None
            if split_cache[name] is not None:
                h_s = hybrid_cost(split_cache[name], n=n) / CLOCK_HZ
                if h_s < pred_s:
                    pred_s, fmt = h_s, "hybrid"
        meas_s = 2.0 * n * (coo.nnz + coo.shape[0]) / (r["gflops"] * 1e9)
        speedup = meas_s / max(pred_s, 1e-9)
        if speedup >= ratio:
            out.append((speedup, name, n, r["gflops"], fmt,
                        pred_s * 1e3, meas_s * 1e3))
    out.sort(reverse=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default=str(HERE / "results_r3.json"))
    ap.add_argument("--pass-dir", default=str(HERE / "passes_r3"))
    ap.add_argument("--ratio", type=float, default=2.0)
    ap.add_argument("--hours", type=float, default=2.0)
    ap.add_argument("--max-nnz", type=int, default=25_000_000)
    ap.add_argument("--n", type=int, nargs="*", default=None,
                    help="restrict to these N values")
    ap.add_argument("--tuned-configs",
                    default=str(HERE / "tuned_configs.json"))
    ap.add_argument("--also-merge", nargs="*", default=[])
    ap.add_argument("--dry-run", action="store_true",
                    help="print the ranked re-race list and exit (no device)")
    ap.add_argument("--rows", default=None,
                    help="explicit re-race list 'matrix:16,512;matrix2:128' "
                         "— bypasses the model-headroom ranking (for "
                         "provenance/measured-floor races the ratio filter "
                         "would skip)")
    args = ap.parse_args(argv)

    if args.rows:
        todo = []
        for spec in args.rows.split(";"):
            name, _, ns = spec.partition(":")
            for n in ns.split(","):
                todo.append((0.0, name.strip(), int(n), 0.0, "?", 0.0, 0.0))
    else:
        todo = candidates(args.results, args.ratio, args.max_nnz,
                          set(args.n) if args.n else None)
    if not todo:
        log("no rows above the ratio — table is model-consistent")
        return 0
    for sp, name, n, gf, fmt, pred_ms, meas_ms in todo:
        log(f"  {name} N={n}: {gf:.1f} GFLOPS measured ({meas_ms:.1f} ms) "
            f"vs {pred_ms:.1f} ms predicted ({fmt}) -> {sp:.1f}x headroom")
    if args.dry_run:
        return 0

    pass_dir = Path(args.pass_dir)
    pass_dir.mkdir(parents=True, exist_ok=True)
    deadline = time.time() + args.hours * 3600
    nums = [int(m.group(1)) for p in sorted(pass_dir.glob("pass_*.json"))
            if (m := re.match(r"pass_(\d+)", p.stem))]
    i = max(nums, default=0)
    # group by matrix so pack/upload work is shared across its N values
    by_matrix: dict = {}
    for sp, name, n, *_ in todo:
        by_matrix.setdefault(name, []).append(n)
    for name, ns in by_matrix.items():
        if time.time() > deadline:
            log("budget exhausted; merging what exists")
            break
        i += 1
        out = pass_dir / f"pass_{i:02d}.json"
        cmd = [
            sys.executable, str(HERE / "suite.py"),
            "--scale", "full",
            "--only", name,
            "--n", *[str(x) for x in sorted(set(ns))],
            "--autotune",
            "--force-race",
            "--canary-retries", "3",
            "--deadline-ts", str(deadline),
            "--tuned-configs", args.tuned_configs,
            "--out", str(out),
        ]
        log(f"re-race {name} N={sorted(set(ns))} -> {out.name}")
        subprocess.run(cmd, stdout=subprocess.DEVNULL, check=False)
    from benchmarks.overnight import merge

    # Seed the merge with the existing canonical file: rows whose winning
    # sample lives in an earlier round's merged doc (not in pass_dir)
    # must survive the re-merge (30 of 60 r4 rows are seeded that way).
    merge([Path(args.results)] + list(args.also_merge)
          + sorted(pass_dir.glob("pass_*.json")),
          args.results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
