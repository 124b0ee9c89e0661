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


def main(paths, merged_out=None):
    best = {}
    for p in paths:
        doc = json.load(open(p))
        doc_ses = doc.get("session", {})
        for r in doc.get("results", []):
            if "gflops" not in r:
                continue
            # merged docs carry per-row session provenance; fall back to
            # the doc-level session for raw pass files
            ses = r.get("session", doc_ses)
            key = (r["matrix"], r["n"])
            prev = best.get(key)
            if prev is None or better((r, ses, p), prev):
                best[key] = (r, ses, p)

    if merged_out:
        from datetime import datetime, timezone

        rows = []
        for (mname, n), (r, ses, p) in sorted(best.items()):
            row = dict(r)
            row.setdefault("session", ses)
            row["source_file"] = str(p)
            rows.append(row)
        with open(merged_out, "w") as f:
            json.dump(
                {
                    "merged_at": datetime.now(timezone.utc).isoformat(),
                    "merged_from": [str(p) for p in paths],
                    "results": rows,
                },
                f, indent=1,
            )

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
        gate_met, gate_unreach, gate_miss = 0, 0, 0
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
            if r.get("verify_rows") and r.get("verify_full_device") is not True:
                flag += " §"
            cells.append(f"{r['gflops']:.0f}{flag}")
            u = r.get("max_abs_vs_f64_ulp")
            if u is not None and (worst_ulp is None or u > worst_ulp):
                worst_ulp = u
            if r.get("meets_1e6_gate"):
                gate_met += 1
            elif r.get("gate_unreachable"):
                gate_unreach += 1
            else:
                gate_miss += 1
        err = "—" if worst_ulp is None else f"≤{worst_ulp:.1f}"
        # 1e-6-gate column (BASELINE.md north star): ✓ = every row meets it
        # (measured precise sample, benchmarks/precise_verify.py); ⊘ = the
        # gate is representation-impossible on every row (ulp(max|C|) >
        # 2e-6, docs/ACCURACY.md); a fraction = partially banked.
        if gate_miss == 0 and gate_met > 0:
            err += " ✓1e-6"
        elif gate_miss == 0 and gate_unreach > 0:
            err += " ⊘1e-6"
        elif gate_met > 0:
            err += f" {gate_met}/{gate_met + gate_miss} 1e-6"
        print(f"| {mname} | {nnz} | " + " | ".join(cells) + f" | {err} |")
    print()
    if any(e[0].get("timing", {}).get("method") == "amortized"
           for e in best.values()):
        print("† amortized-wall timing (differential did not resolve): a "
              "conservative bound that includes fixed dispatch costs — the "
              "kernel itself can only be faster.")
        print()
    if any(
        e[0].get("verify_rows")
        and e[0].get("verify_full_device") is not True
        for e in best.values()
    ):
        print("§ verified on a deterministic stratified row sample "
              "(full C exceeds the 512 MB fetch budget of the 1-CPU host; "
              "the error columns cover the sampled rows).")
        print()
    if any(e[0].get("gate_unreachable") for e in best.values()):
        print("⊘1e-6: the literal 1e-6 max-abs gate is representation-"
              "impossible on every row of this matrix (one f32 ulp of "
              "max|C| exceeds 2e-6 — docs/ACCURACY.md); ✓1e-6: every row "
              "meets the gate, via the fast kernel or a measured precise "
              "sample (the `precise_sample` field carries its own "
              "kernel/level/timing provenance).")
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
    argv = sys.argv[1:]
    out = None
    if "--merged-out" in argv:
        i = argv.index("--merged-out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    main(argv, merged_out=out)
