"""Stamp 1e-6-gate reachability evidence onto rows missing it — host-only.

The BASELINE.md north star carries a max-abs<=1e-6 accuracy gate. Rows
measured before the gate fields existed (r3 passes) record
``meets_1e6_gate: false`` with no ``c_max_abs``, so the canonical merge
cannot judge reachability from on-row evidence and falls back to a
``precise-not-attempted`` note. This script closes those rows WITHOUT
device time: it recomputes ``c_max_abs = max|alpha*A@B + beta*C|`` in
float64 on the host (scipy CSR, row-chunked — the exact oracle the suite
verifies against, benchmarks/suite.py:329-332 synthesis), then applies the
same ulp rule the merge uses (benchmarks/overnight.py): float32 output
cannot beat ulp(max|C|)/2, so ulp > 2e-6 stamps ``gate_unreachable`` with
the evidence on the row; ulp <= 2e-6 leaves a ``reachable`` note naming
the row a precise-mode re-race candidate.

Reference gate being accounted for: the reference verifies every element
at rel-err 1e-4 (src/sextans-host.cpp:272-282); the 1e-6 max-abs gate is
this repo's stricter self-imposed target.

Usage: python benchmarks/stamp_gate_evidence.py [--results F] [--dry-run]
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def host_c_max_abs(coo, n, alpha=0.85, beta=-2.06, chunk_rows=65536):
    """max|alpha*A@B + beta*C| in f64 with the suite's exact synthesis."""
    from scipy.sparse import csr_matrix

    m, k = coo.shape
    rng = np.random.default_rng(0)
    b = rng.standard_normal((k, n)).astype(np.float32).astype(np.float64)
    # C is only needed per row chunk; regenerate deterministically by
    # drawing the full block then slicing (same stream as the suite).
    c = rng.standard_normal((m, n)).astype(np.float32).astype(np.float64)
    a = csr_matrix(
        (coo.vals.astype(np.float64), (coo.rows, coo.cols)), shape=(m, k)
    )
    best = 0.0
    for lo in range(0, m, chunk_rows):
        hi = min(m, lo + chunk_rows)
        out = alpha * (a[lo:hi] @ b) + beta * c[lo:hi]
        best = max(best, float(np.abs(out).max()))
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default=str(HERE / "results_r4.json"))
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    from benchmarks.matrices import suite
    from benchmarks.suite import _gen_cached

    path = Path(args.results)
    doc = json.loads(path.read_text())
    gens = suite("full")
    todo = [
        r for r in doc["results"]
        if r.get("meets_1e6_gate") is False
        and not r.get("gate_unreachable")
        and not r.get("c_max_abs")
        and (not r.get("gate_note")
             or "pre-r4-row" in str(r.get("gate_note")))
        and r["matrix"] in gens
    ]
    if not todo:
        log("no rows need gate evidence")
        return 0
    coo_cache = {}
    stamped = 0
    for r in sorted(todo, key=lambda r: (r["matrix"], r["n"])):
        name, n = r["matrix"], r["n"]
        if name not in coo_cache:
            coo_cache[name] = _gen_cached(name, gens[name])
        cmax = host_c_max_abs(coo_cache[name], n)
        ulp = float(np.spacing(np.float32(cmax))) or 1e-45
        r["c_max_abs"] = round(cmax, 4)
        r["gate_evidence"] = "host-f64-cmax"
        if r.get("max_abs_vs_f64"):
            r["max_abs_vs_f64_ulp"] = round(r["max_abs_vs_f64"] / ulp, 2)
        if ulp > 2e-6:
            r["gate_unreachable"] = True
            r.pop("gate_note", None)
            verdict = "unreachable"
        else:
            r["gate_note"] = "precise-not-attempted:reachable"
            verdict = "REACHABLE (precise re-race candidate)"
        stamped += 1
        log(f"{name} N={n}: c_max_abs={cmax:.3f} ulp={ulp:.2e} "
            f"err={r.get('max_abs_vs_f64')} -> {verdict}")
    if args.dry_run:
        log(f"dry-run: {stamped} rows would be stamped")
        return 0
    path.write_text(json.dumps(doc, indent=1))
    log(f"stamped {stamped} rows -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
