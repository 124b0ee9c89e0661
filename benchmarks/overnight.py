"""Overnight benchmark driver: repeated suite passes + canonical merge.

The shared TPU pool's contention windows last minutes-to-hours, so one
suite pass cannot produce healthy timings for every row. This driver loops
full suite passes (each row canary-gated, benchmarks/suite.py) until a
wall-clock budget expires, then merges all passes into ONE canonical
results file: per (matrix, N) row, the fastest *canary-healthy* sample —
contention only ever understates a dependency-chained timing, so max-GFLOPS
among healthy rows is the least-biased estimator (see report.py).

Every merged row keeps its pass file, session header, and per-row canary,
so each published number is traceable (VERDICT round-1 item 7).

Usage:
    python benchmarks/overnight.py --hours 8 [--scale full]
        [--n 16 128 512] [--out benchmarks/results_r2.json]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))


def log(msg):
    print(f"[overnight {datetime.now().strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def _gate_strength(row):
    """Rank a sample's 1e-6 gate evidence. The gate is a property of the
    (matrix, N) WORKLOAD — any measured precise sample proves it for every
    sample of that workload — so the merge must not lose a banked pass
    just because a faster (gate-false) winner lands later."""
    ps = row.get("precise_sample") or {}
    err = ps.get("max_abs_vs_f64")
    if row.get("meets_1e6_gate"):
        return (2, -(err or 0.0))
    if err is not None:
        return (1, -err)
    return (0, 0.0)


def merge(pass_files, out_path):
    from benchmarks.report import is_healthy

    best = {}
    gate_ev = {}  # (matrix, n) -> sample with the strongest gate evidence
    failed = {}  # (matrix, n) -> last error row; surfaced when no pass timed it
    for p in pass_files:
        try:
            doc = json.loads(Path(p).read_text())
        except (OSError, json.JSONDecodeError):
            continue
        ses = doc.get("session", {})
        for r in doc.get("results", []):
            if "gflops" not in r:
                # keep a trace: a row that errored in EVERY pass must still
                # appear in the canonical file, not silently vanish
                if "matrix" in r and "n" in r:
                    err = dict(r)
                    err["pass_file"] = str(p)
                    failed[(r["matrix"], r["n"])] = err
                continue
            key = (r["matrix"], r["n"])
            cand = dict(r)
            # merged canonical docs (seeded via --also-merge) carry the
            # session on each row; raw pass files carry it on the doc —
            # never clobber row-level provenance with the (empty) doc header
            cand["session"] = r.get("session", ses)
            cand.setdefault("pass_file", str(p))
            ev = gate_ev.get(key)
            if ev is None or _gate_strength(cand) > _gate_strength(ev):
                gate_ev[key] = cand
            prev = best.get(key)
            if prev is None:
                best[key] = cand
                continue
            ch = is_healthy(cand, cand["session"])
            ph = is_healthy(prev, prev["session"])
            if (ch and not ph) or (
                ch == ph and cand["gflops"] > prev["gflops"]
            ):
                best[key] = cand
    for k, err in failed.items():
        if k not in best:
            best[k] = err
    rows = [best[k] for k in sorted(best)]
    # Carry workload-level gate evidence onto the winning sample: a precise
    # sample measured on ANY healthy sample of (matrix, N) banks the gate
    # for the workload, so a faster re-raced winner whose own precise
    # attempt failed (e.g. a compile-service outage) must not demote a
    # previously banked meets_1e6_gate=true.
    for k, r in best.items():
        ev = gate_ev.get(k)
        if ev is None or ev is r or not (
            _gate_strength(ev) > _gate_strength(r)
        ):
            continue
        if "precise_sample" in ev:
            ps = dict(ev["precise_sample"])
            ps.setdefault("carried_from", ev.get("pass_file"))
            r["precise_sample"] = ps
        if ev.get("meets_1e6_gate"):
            r["meets_1e6_gate"] = True
            r.pop("gate_unreachable", None)
        if ev.get("gate_note"):
            note = ev["gate_note"]
            r["gate_note"] = (
                note if note.endswith("(carried)") else note + "(carried)"
            )
        if ev.get("gate_floor_evidence"):
            r["gate_floor_evidence"] = ev["gate_floor_evidence"]
    # Retroactive 1e-6 gate accounting (BASELINE.md north star): rows
    # measured before the gate fields existed carry a silent
    # meets_1e6_gate=false. Their own c_max_abs decides reachability —
    # f32 cannot beat ulp(max|C|)/2, so ulp > 2e-6 stamps gate_unreachable
    # with on-row evidence; otherwise the row is marked for a precise-mode
    # re-measure rather than left silently false.
    import numpy as _np

    for r in rows:
        if (
            r.get("meets_1e6_gate") is False
            and not r.get("gate_unreachable")
            and not r.get("gate_note")
        ):
            if r.get("c_max_abs"):
                ulp = float(_np.spacing(_np.float32(r["c_max_abs"]))) or 1e-45
                if ulp > 2e-6:
                    r["gate_unreachable"] = True
                else:
                    r["gate_note"] = "precise-not-attempted:pre-r4-row"
            else:
                # r3-era row: no c_max_abs on the row, so ulp reachability
                # can't be judged from its own evidence — never leave the
                # false silent (a re-race replaces the row with stamped
                # evidence; until then the note records the gap)
                r["gate_note"] = "precise-not-attempted:pre-r4-row-no-ulp"
    # Cross-silicon bandwidth roofline (pure arithmetic from row fields;
    # docs/ROOFLINES.md). Stamped at merge time so a re-merge can never
    # wipe the parity-on-paper columns — the heavier scatter-model stamp
    # stays in stamp_rooflines.py (needs matrix generation).
    from benchmarks.stamp_rooflines import A100_HBM, V5E_HBM, bw_roofline_gflops

    for r in rows:
        if not all(k in r for k in ("gflops", "nnz", "m", "k", "n")):
            continue
        v5e_bw = bw_roofline_gflops(r["nnz"], r["m"], r["k"], r["n"], V5E_HBM)
        r["bw_roofline"] = {
            "v5e_gflops": round(v5e_bw, 1),
            "a100_gflops": round(
                bw_roofline_gflops(r["nnz"], r["m"], r["k"], r["n"], A100_HBM), 1
            ),
            "measured_over_v5e_bw": round(r["gflops"] / max(v5e_bw, 1e-9), 3),
        }
    doc = {
        "merged_at": datetime.now(timezone.utc).isoformat(),
        "merged_from": [str(p) for p in pass_files],
        "results": rows,
    }
    Path(out_path).write_text(json.dumps(doc, indent=1))
    healthy = sum(1 for r in rows if is_healthy(r, r.get("session", {})))
    log(f"merged {len(pass_files)} passes -> {out_path}: "
        f"{len(rows)} rows, {healthy} canary-healthy")
    return doc


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=6.0)
    ap.add_argument("--scale", default="full")
    ap.add_argument("--n", type=int, nargs="+", default=[16, 128, 512])
    ap.add_argument("--out", default=str(HERE / "results_r2.json"))
    ap.add_argument("--pass-dir", default=str(HERE / "passes"))
    ap.add_argument("--max-passes", type=int, default=20)
    ap.add_argument("--tuned-configs",
                    default=str(HERE / "tuned_configs.json"),
                    help="config store shared across passes (race winners "
                         "persist; later passes skip re-racing)")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra args forwarded to suite.py")
    ap.add_argument("--also-merge", nargs="*", default=[],
                    help="extra canonical/merged result files folded into "
                         "every merge (e.g. a previous round's results so "
                         "coverage-first passes skip its healthy rows)")
    ap.add_argument("--refine", action="store_true",
                    help="re-time rows that already have a healthy canonical "
                         "sample (default: coverage-first — each pass skips "
                         "covered rows so the budget reaches the tail)")
    ap.add_argument("--stall-minutes", type=float, default=45.0,
                    help="kill a pass whose incremental output file stops "
                         "advancing for this long (wedged device call)")
    args = ap.parse_args(argv)

    pass_dir = Path(args.pass_dir)
    pass_dir.mkdir(parents=True, exist_ok=True)
    deadline = time.time() + args.hours * 3600

    # Number from the highest existing index, not the count: a restarted
    # driver must never reuse (and silently overwrite) a live pass file.
    import re

    existing = sorted(pass_dir.glob("pass_*.json"))
    nums = [int(m.group(1)) for p in existing
            if (m := re.match(r"pass_(\d+)", p.stem))]
    i = max(nums, default=0)
    if args.also_merge or existing:
        # refresh the merge target up front so pass 1's --skip-covered set
        # already reflects prior passes and any --also-merge seed rows
        merge(list(args.also_merge) + existing, args.out)
    while time.time() < deadline and i < args.max_passes:
        i += 1
        out = pass_dir / f"pass_{i:02d}.json"
        cmd = [
            sys.executable, str(HERE / "suite.py"),
            "--scale", args.scale,
            "--n", *[str(n) for n in args.n],
            "--autotune",
            "--canary-retries", "3",
            "--deadline-ts", str(deadline),
            "--tuned-configs", args.tuned_configs,
            "--out", str(out),
            *args.extra,
        ]
        if not args.refine and Path(args.out).exists():
            cmd += ["--skip-covered", args.out]
        log(f"pass {i}: {' '.join(cmd)}")
        # The suite exits cleanly at --deadline-ts between rows; on top of
        # the generous overall backstop, a STALL watchdog kills the pass if
        # the incremental --out file stops advancing for ``stall`` seconds —
        # a single wedged device call (hung upload/compile on the flaky
        # relay, observed round 3: 1 h silent on one row) must not eat the
        # whole budget. Big-matrix rows legitimately take ~25 min, so the
        # threshold sits well above that.
        budget = max(60, int(deadline - time.time())) + 2400
        stall = args.stall_minutes * 60
        t_start = time.time()
        proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL)
        last_progress = time.time()
        last_mtime = 0.0
        while proc.poll() is None:
            time.sleep(15)
            try:
                mtime = out.stat().st_mtime
            except OSError:
                mtime = 0.0
            if mtime > last_mtime:
                last_mtime = mtime
                last_progress = time.time()
            if time.time() - last_progress > stall:
                log(f"pass {i}: no row progress for {stall/60:.0f} min; "
                    "killing the stalled pass")
                proc.terminate()
                try:
                    proc.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    proc.kill()
                break
            if time.time() - t_start > budget:
                log(f"pass {i} hit the backstop timeout; merging what exists")
                proc.terminate()
                try:
                    proc.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    proc.kill()
                break
        merge(list(args.also_merge)
              + sorted(pass_dir.glob("pass_*.json")), args.out)
    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
