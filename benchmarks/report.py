"""Render a suite results JSON into the README markdown table.

Usage: python benchmarks/report.py benchmarks/results_r2_small.json [...]
Multiple files merge (later files override earlier rows with the same
(matrix, n) if their session canary is healthier).
"""
import json
import sys

U280 = 259.0
HEALTHY_CANARY_MS = 0.5  # matches benchmarks/suite.py gating threshold


def canary_rank(row, session):
    """Per-row canary (pre/post max) if recorded, else the session canary."""
    cs = [c for c in (row.get("canary_pre_ms"), row.get("canary_post_ms"))
          if c is not None]
    if cs:
        return max(cs)
    c = session.get("nasa_canary_ms")
    return c if c is not None else 9e9


def is_healthy(row, session):
    """Healthy = canary within the session's calibrated threshold (the
    quiet baseline varies ~3x between sessions; suite.py records
    canary_healthy_ms in the session header)."""
    thresh = session.get("canary_healthy_ms", HEALTHY_CANARY_MS)
    return canary_rank(row, session) <= thresh


def better(cand, prev):
    """Merge rule. Pool contention only ever *understates* a row (the timing
    chain cannot run faster than the hardware; memoization is defeated by
    alpha perturbation), so among canary-healthy rows the faster one is the
    better estimate; an unhealthy row never displaces a healthy one."""
    ch, ph = is_healthy(cand[0], cand[1]), is_healthy(prev[0], prev[1])
    if ch != ph:
        return ch
    return cand[0]["gflops"] > prev[0]["gflops"]


def main(paths):
    best = {}
    for p in paths:
        doc = json.load(open(p))
        ses = doc.get("session", {})
        for r in doc.get("results", []):
            if "gflops" not in r:
                continue
            key = (r["matrix"], r["n"])
            prev = best.get(key)
            if prev is None or better((r, ses, p), prev):
                best[key] = (r, ses, p)

    ns = sorted({k[1] for k in best})
    mats = sorted({k[0] for k in best})
    hdr = (
        "| matrix | nnz | "
        + " | ".join(f"N={n}" for n in ns)
        + " | err (ulp) |"
    )
    print(hdr)
    print("|" + "---|" * (len(ns) + 3))
    for mname in mats:
        cells = []
        nnz = ""
        worst_ulp = None
        gate = False
        for n in ns:
            e = best.get((mname, n))
            if e is None:
                cells.append("—")
                continue
            r = e[0]
            nnz = f"{r['nnz']:,}"
            flag = "" if r.get("verify") == "pass" else " ⚠"
            if r.get("timing", {}).get("method") == "amortized":
                # conservative bound: the differential did not resolve, so
                # the amortized wall (fixed costs included) was published —
                # the true kernel time can only be faster
                flag += " †"
            cells.append(f"{r['gflops']:.0f}{flag}")
            u = r.get("max_abs_vs_f64_ulp")
            if u is not None and (worst_ulp is None or u > worst_ulp):
                worst_ulp = u
            gate = gate or r.get("meets_1e6_gate", False)
        err = "—" if worst_ulp is None else f"≤{worst_ulp:.1f}"
        if gate:
            err += " ✓1e-6"
        print(f"| {mname} | {nnz} | " + " | ".join(cells) + f" | {err} |")
    print()
    if any(e[0].get("timing", {}).get("method") == "amortized"
           for e in best.values()):
        print("† amortized-wall timing (differential did not resolve): a "
              "conservative bound that includes fixed dispatch costs — the "
              "kernel itself can only be faster.")
        print()
    for p in paths:
        doc = json.load(open(p))
        ses = doc.get("session", {})
        if ses:
            print(f"* `{p}`: canary {ses.get('nasa_canary_ms')} ms, "
                  f"{ses.get('device')}, {ses.get('timestamp')}")
        else:  # merged doc: rows carry their own session/pass provenance
            print(f"* `{p}`: merged {doc.get('merged_at')} from "
                  f"{len(doc.get('merged_from', []))} passes")


if __name__ == "__main__":
    main(sys.argv[1:])
