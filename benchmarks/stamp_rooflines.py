"""Stamp measured-roofline evidence on scattered-class rows below the
reference's ~259 GFLOPS structural peak (VERDICT r4 #3, second arm).

The FPGA sustains 64 nnz/cycle on ANY structure because each of its 64
PEs decodes an arbitrary B column per cycle from URAM banks
(src/sextans.cpp:388-419, sextans.h:7). The TPU has no 1-cycle random
row access: the structure-independent engines are bound by the measured
per-edge costs (VPU dynamic-sublane extract ~20-26 cycles, Pallas
chunk-gather DMA issue ~26-48 cycles — benchmarks/scratch probes,
docs/DESIGN.md). For every N=512 row under 259 GFLOPS this stamper
records, next to the measured number:

* the CURRENT analytic best across every engine family (cycles -> GFLOPS
  at the calibrated 0.94 GHz v5e clock) — the model roofline;
* the ratio measured/model — a row at >= ~0.7x its model bound with race
  provenance is AT its engine's measured floor, not under-tuned;
* which families the deciding race actually measured (from the row's
  race log).

Usage: python benchmarks/stamp_rooflines.py --results benchmarks/results_r5.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

CLOCK_HZ = 0.94e9
U280_CLASS_GFLOPS = 259.0

# HBM bandwidths for the cross-silicon roofline columns (public figures:
# jax-ml.github.io/scaling-book for v5e; NVIDIA A100-80GB datasheet).
V5E_HBM = 8.1e11
A100_HBM = 2.0e12


def bw_roofline_gflops(nnz: int, m: int, k: int, n: int, hbm: float) -> float:
    """Structure-independent SpMM bandwidth roofline for one device.

    Byte model (the cuSPARSE-class CSR traffic floor, every operand
    touched once): A = 8 B/nnz (value + column index), B = 4*K*N read
    once (perfect reuse — generous to the device), C = 8*M*N (read +
    write). Published cuSPARSE evaluations on scattered matrices land at
    10-30% of this floor (load balance, index processing); the column is
    an upper bound on ANY SpMM engine on that silicon, which is what the
    parity-per-silicon argument needs (docs/ROOFLINES.md).
    """
    flops = 2.0 * n * (nnz + m)
    bytes_ = 8.0 * nnz + 4.0 * k * n + 8.0 * m * n
    return flops / (bytes_ / hbm) / 1e9


def log(m):
    print(m, file=sys.stderr, flush=True)


def collect_pass_races(pass_dir):
    """Race evidence at the WORKLOAD level: (matrix, n) -> (families raced
    across every pass, best measured GFLOPS among those passes). A forced
    re-race lands in its own pass file; if its sample loses to the banked
    row, the canonical merge keeps the banked row — but the re-race is
    still the evidence that the model's best family was measured."""
    out = {}
    for f in sorted(Path(pass_dir).glob("pass_*.json")):
        try:
            d = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        for r in d.get("results", []):
            if not isinstance(r, dict) or "gflops" not in r:
                continue
            key = (r["matrix"], r.get("n"))
            fams, best = out.get(key, (set(), 0.0))
            fams |= {e.get("fmt") for e in r.get("race") or [] if "ms" in e}
            fams.add(r.get("fmt") or r.get("backend"))
            out[key] = (fams - {None}, max(best, r["gflops"]))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default=str(HERE / "results_r5.json"))
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--threshold", type=float, default=U280_CLASS_GFLOPS)
    ap.add_argument("--pass-dir", default=str(HERE / "passes_r5"))
    args = ap.parse_args(argv)
    pass_races = collect_pass_races(args.pass_dir) if args.pass_dir else {}

    from benchmarks.matrices import suite
    from benchmarks.suite import _gen_cached, cover_upper_bound
    from sextans_tpu.utils.autotune import choose_backend, hybrid_cost

    doc = json.loads(Path(args.results).read_text())
    gens = suite("full")
    coo_cache = {}
    stamped = 0
    for r in doc.get("results", []):
        if "gflops" not in r:
            continue
        # cross-silicon bandwidth rooflines on EVERY row (the
        # cuSPARSE-A100 parity-on-paper column, BASELINE.md north star)
        v5e_bw = bw_roofline_gflops(r["nnz"], r["m"], r["k"], r["n"], V5E_HBM)
        r["bw_roofline"] = {
            "v5e_gflops": round(v5e_bw, 1),
            "a100_gflops": round(
                bw_roofline_gflops(r["nnz"], r["m"], r["k"], r["n"], A100_HBM),
                1,
            ),
            "measured_over_v5e_bw": round(r["gflops"] / max(v5e_bw, 1e-9), 3),
        }
        if r.get("n") != args.n:
            continue
        if r["gflops"] >= args.threshold:
            r.pop("scatter_roofline", None)
            continue
        name = r["matrix"]
        if name not in gens:
            continue
        if name not in coo_cache:
            coo_cache[name] = _gen_cached(name, gens[name])
        coo = coo_cache[name]
        flops = 2.0 * args.n * (coo.nnz + coo.shape[0])
        picks = choose_backend(coo, n=args.n, top=4)
        fam_gf = {
            p.fmt: round(flops / (p.predicted_cost / CLOCK_HZ) / 1e9, 1)
            for p in picks
        }
        if cover_upper_bound(coo) >= 0.3 and coo.nnz >= 50_000:
            try:
                from sextans_tpu.ops.hybrid import split_structure

                h = hybrid_cost(split_structure(coo, n=args.n), n=args.n)
                fam_gf["hybrid"] = round(flops / (h / CLOCK_HZ) / 1e9, 1)
            except Exception:
                pass
        model_best = max(fam_gf.values())
        best_fam = max(fam_gf, key=fam_gf.get)
        row_raced = {e.get("fmt") for e in r.get("race") or [] if "ms" in e}
        pass_fams, pass_best = pass_races.get(
            (name, args.n), (set(), 0.0)
        )
        raced = sorted(
            {f.split("+")[0] for f in (row_raced | pass_fams) - {None}}
        )
        if r["gflops"] >= 0.7 * model_best:
            note = "at the measured engine floor"
        elif best_fam.split("+")[0] in raced:
            # the model's own best family WAS measured at this workload
            # (row race or a forced re-race pass) and did not beat the
            # banked row — the model is optimistic, the row is measured
            note = (
                f"model optimistic — {best_fam} measured at this workload "
                f"(best pass {round(pass_best, 1)} GF); banked row stands"
            )
        else:
            note = "below model — re-race candidate"
        r["scatter_roofline"] = {
            "model_gflops_by_family": fam_gf,
            "model_best_gflops": model_best,
            "measured_over_model": round(r["gflops"] / max(model_best, 1e-9), 2),
            "families_raced": raced,
            "note": note,
        }
        stamped += 1
        log(f"{name} N={args.n}: {r['gflops']} GF vs model best "
            f"{model_best} GF ({r['scatter_roofline']['note']}); "
            f"raced={raced}")
    Path(args.results).write_text(json.dumps(doc, indent=1))
    log(f"stamped {stamped} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
