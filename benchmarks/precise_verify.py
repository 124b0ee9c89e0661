"""Bank the 1e-6 max-abs gate on canonical rows via measured precise samples.

The BASELINE.md north star asks for max-abs error <= 1e-6 vs the f64
oracle (the reference's own gate is looser: 1e-4 relative / <2% mismatch,
src/sextans-host.cpp:272-282). Round 4 closed the *accounting* — every row
carries gate provenance — but banked zero passes. This module closes the
*evidence*:

* ``attempt_precise_gate`` — shared by suite.py's per-row flow and the
  standalone driver below: builds the precise twin of a row's winning
  plan (precise=1 Neumaier-compensated, escalating to precise=2 full-EFT
  — ops/df32.py), measures its error against the row's oracle, times it,
  and returns the gate fields. The row's HEADLINE timing stays the fast
  kernel's; the gate rides the measured ``precise_sample`` (kernel, run,
  verified, timed — not an estimate).
* ``main`` — the banking driver: walks a canonical results file, re-runs
  the precise sample for every reachable row whose gate is still false
  (``precise-not-attempted``/``precise-missed``/``precise-unsupported``),
  and rewrites the rows in place with provenance.

Usage:
    python benchmarks/precise_verify.py --results benchmarks/results_r5.json
        [--only amazon] [--n 16 512] [--max-nnz N] [--dry-run]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))


def log(msg):
    print(f"[precise {datetime.now().strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


# Backends whose kernels implement compensated accumulation (ops/df32.py).
PRECISE_BACKENDS = {
    "pallas", "pallas_interpret", "mxu", "mxu_interpret",
    "edge", "edge_interpret", "ell", "ell_pallas", "ell_pallas_interpret",
}
# Engines that trace an f64 fold under precise — need x64 live at trace.
_X64_BACKENDS = {"ell", "ell_pallas", "ell_pallas_interpret"}


def _precise_plan(plan, packed, cfg, split, n, level, pack_cache=None,
                  cache_name=None):
    """Precise twin of a winning plan at ``level`` (1 or 2), sharing the
    pack's device uploads. Returns None when the winner has no precise
    path (unknown backend)."""
    from sextans_tpu.ops.plan import SpmmPlan

    if split is not None:
        from sextans_tpu.ops.hybrid import HybridSpmmPlan

        return HybridSpmmPlan(
            split, n,
            residue_config=plan.residue_config.with_(precise=level),
            residue_fmt=plan.residue_fmt,
            pack_cache=pack_cache,
            cache_name=cache_name,
            precise=level,
        )
    if plan.backend not in PRECISE_BACKENDS:
        return None
    ppacked = dataclasses.replace(packed, config=cfg.with_(precise=level))
    ppacked.__dict__["_dev_cache"] = packed.__dict__.setdefault(
        "_dev_cache", {}
    )
    return SpmmPlan(ppacked, n, backend=plan.backend)


def _x64_scope(plan):
    import contextlib

    import jax

    backend = getattr(plan, "backend", None)
    if backend in _X64_BACKENDS or (
        backend is None
        and getattr(getattr(plan, "_residue_plan", None), "backend", None)
        in _X64_BACKENDS
    ):
        return jax.enable_x64(True)
    return contextlib.nullcontext()


def _time_sample(pplan, b_dev, c_dev, alpha, beta):
    """Short measured timing of the precise plan (sample provenance, not
    the headline protocol): escalate an in-device repeat chain until the
    span clears the dispatch RTT, capped so a 10x-slower EFT kernel on a
    1M-row matrix stays under ~60 s."""
    from sextans_tpu.utils.timing import time_repeat

    times = 4
    with _x64_scope(pplan):
        secs = time_repeat(pplan, b_dev, alpha, beta, c_dev, times=times)
        while secs * times < 0.25 and times < 256:
            times = min(256, max(times * 4, int(0.3 / max(secs, 1e-7))))
            secs = time_repeat(pplan, b_dev, alpha, beta, c_dev, times=times)
    return secs, times


def attempt_precise_gate(
    *,
    plan,
    packed,
    cfg,
    split,
    n,
    name,
    coo,
    csr,
    b_dev,
    c_dev,
    alpha,
    beta,
    exact,
    fetch,
    ulp,
    full_device: bool,
    c_host=None,
    pack_cache=None,
    time_it: bool = True,
    release_winner=None,
) -> dict:
    """Run the precise gate sample for one row; returns the rec updates.

    ``exact``/``fetch`` are the row's oracle and its (possibly sampled)
    fetch projection; ``full_device`` upgrades a passing sample to the
    exact full-matrix max-abs via utils/device_verify. The headline row
    timing is untouched — the sample carries its own measured ms/gflops.
    """
    from sextans_tpu.utils.verify import gflops

    m = coo.shape[0]
    best = None  # (err, level, pplan)
    unsupported = None
    for level in (1, 2):
        cache_name = f"{name}@n{n}-residue" if split is not None else None
        try:
            pplan = _precise_plan(
                plan, packed, cfg, split, n, level,
                pack_cache=pack_cache, cache_name=cache_name,
            )
        except Exception as e:
            log(f"  precise level {level} plan build failed: {str(e)[:90]}")
            continue
        if pplan is None:
            # winner has no precise path (e.g. an xla-backend rebuild) —
            # fall through to the vpu EFT fallback below, which proves the
            # workload gate with any compilable precise config
            unsupported = f"precise-unsupported:{plan.backend}"
            break
        try:
            with _x64_scope(pplan):
                pgot_dev = pplan(b_dev, alpha, beta, c_dev)
                pgot = fetch(pgot_dev)
            err = float(np.abs(pgot - exact).max())
            if err <= 1e-6 and full_device:
                from sextans_tpu.utils.device_verify import device_full_check

                fv = device_full_check(
                    pgot_dev, csr, b_dev, alpha, beta,
                    c_host if c_host is not None else np.asarray(c_dev),
                )
                err = max(err, fv["max_abs_vs_f64"])
            del pgot
            pgot_dev = None
        except Exception as e:
            log(f"  precise level {level} run failed: {str(e)[:120]}")
            continue
        log(f"  precise level {level}: max_abs {err:.2e}"
            f" ({err / ulp:.2f} ulp)")
        if best is None or err < best[0]:
            best = (err, level, pplan)
        if err <= 1e-6:
            break
    if best is None:
        # both levels failed (e.g. the winner's tiles blow the precise
        # epilogue's VMEM — check_kernel_vmem); the safe-tile vpu fallback
        # below is still a valid gate sample for the workload
        err, level, pplan = float("inf"), 0, None
        sample_backend = None
    else:
        err, level, pplan = best
        sample_backend = getattr(pplan, "backend", "hybrid")
    # MXU contractions round internally (the systolic f32 accumulate has
    # no EFT), so mxu/hybrid winners floor at ~0.6 ulp — above the gate
    # when ulp(max|C|) ~ 1.9e-6. The VPU EFT kernel is measured correctly
    # rounded (excess-over-floor = 0, benchmarks/scratch/
    # precise_floor_probe.py); run it as the gate sample for the same
    # (matrix, N, alpha, beta) workload and stamp its backend.
    if err > 1e-6 and sample_backend != "pallas":
        if best is None and release_winner is not None:
            # no level plan survives to be timed — drop the winner's device
            # buffers before the fallback packs its own copy (HBM headroom
            # on the shared pool is what OOM'd webbase1M N=512)
            release_winner()
        try:
            from sextans_tpu.format.pack import pack as _pack
            from sextans_tpu.ops.plan import SpmmPlan
            from sextans_tpu.utils.autotune import choose_config

            base = choose_config(coo, n=n, top=1)[0].config
            # The gate sample does not need the winner's tiles — any
            # compilable precise config proves the workload gate. Clamp
            # to tiles whose compensated-epilogue working set fits VMEM
            # (unclamped 4096x512 tiles crash the Mosaic compiler —
            # check_kernel_vmem's epilogue_bytes note).
            vcfg = base.with_(
                precise=2,
                tile_m=min(base.tile_m, 1024),
                tile_n=min(base.resolve_tile_n(n), 256),
                window_k=min(base.window_k, 8192),
            )
            if pack_cache is not None:
                vpacked = pack_cache.get_or_pack(
                    name, coo, vcfg.with_(precise=0), "vpu", False
                )
                vpacked = dataclasses.replace(vpacked, config=vcfg)
            else:
                vpacked = _pack(coo, vcfg)
            vplan = SpmmPlan(vpacked, n, backend="pallas")
            vgot_dev = vplan(b_dev, alpha, beta, c_dev)
            verr = float(np.abs(fetch(vgot_dev) - exact).max())
            if verr <= 1e-6 and full_device:
                from sextans_tpu.utils.device_verify import (
                    device_full_check,
                )

                fv = device_full_check(
                    vgot_dev, csr, b_dev, alpha, beta,
                    c_host if c_host is not None else np.asarray(c_dev),
                )
                verr = max(verr, fv["max_abs_vs_f64"])
            vgot_dev = None
            log(f"  precise vpu-fallback: max_abs {verr:.2e}"
                f" ({verr / ulp:.2f} ulp)")
            if verr < err:
                err, level, pplan = verr, 2, vplan
                sample_backend = "pallas"
        except Exception as e:
            log(f"  precise vpu-fallback failed: {str(e)[:120]}")
    if pplan is None:
        return {"gate_note": unsupported or "precise-failed:no-level-ran"}
    sample = {
        "level": level,
        "backend": sample_backend,
        "max_abs_vs_f64": err,
        "max_abs_vs_f64_ulp": round(err / ulp, 2),
    }
    if time_it:
        try:
            secs, times = _time_sample(pplan, b_dev, c_dev, alpha, beta)
            sample["ms"] = round(secs * 1e3, 3)
            sample["rp_time"] = times
            sample["gflops"] = round(gflops(coo.nnz, m, n, secs), 2)
        except Exception as e:
            sample["timing_error"] = str(e)[:90]
    out = {"precise_sample": sample}
    if err <= 1e-6:
        out["meets_1e6_gate"] = True
        out["gate_note"] = f"precise-gate:level{level}"
    else:
        out["gate_note"] = f"precise-missed:{err:.2e}"
        # measured floor evidence: both compensated levels ran; the best
        # sits within ~1 ulp of max|C| — the f32 faithful-rounding floor
        # (docs/ACCURACY.md "the last half ulp")
        if err <= 1.05 * ulp:
            out["gate_floor_evidence"] = (
                f"best-compensated:{err / ulp:.2f}ulp"
            )
    return out


# ----------------------------------------------------------------- driver


def _rebuild_row(row, coo, store, pack_cache, n):
    """Reconstruct a canonical row's winning plan from the tuned store.

    Returns (plan, packed, cfg, split)."""
    from sextans_tpu.ops.plan import SpmmPlan

    name = row["matrix"]
    key = f"{name}|n={n}"
    cfg = store.get(key) if store is not None else None
    meta = (store.meta(key) or {}) if store is not None else {}
    fmt = meta.get("fmt", row.get("fmt", "vpu"))
    if cfg is None:
        # fall back to the row's recorded shape knobs
        from sextans_tpu.utils.config import SpmmConfig

        cfg = SpmmConfig(
            tile_m=row.get("tile_m", 512),
            window_k=row.get("window_k", 2048),
            block_k=row.get("block_k", 8),
        )
    if fmt.startswith("hybrid"):
        from sextans_tpu.ops.hybrid import HybridSpmmPlan

        residue_fmt = fmt.split("+", 1)[1] if "+" in fmt else None
        split = pack_cache.get_or_split(name, coo, n=n)
        plan = HybridSpmmPlan(
            split, n,
            residue_config=cfg if residue_fmt else None,
            residue_fmt=residue_fmt,
            pack_cache=pack_cache,
            cache_name=f"{name}@n{n}-residue",
        )
        return plan, plan._residue_plan.packed, plan.residue_config, split
    reorder2d = bool(meta.get("reorder2d"))
    reorder_cols = bool(row.get("reorder") in ("cols", "2d")) or reorder2d
    packed = pack_cache.get_or_pack(
        name, coo, cfg, fmt, reorder_cols, reorder_rows=reorder2d
    )
    plan = SpmmPlan(packed, n)
    return plan, packed, cfg, None


def bank_row(row, coo, store, pack_cache, session):
    """Run the precise gate sample for one canonical row; mutates row."""
    import jax.numpy as jnp

    from benchmarks.suite import (
        VERIFY_SAMPLE_BYTES,
        _csr_take_rows,
        _verify_sample_blocks,
    )
    from sextans_tpu.format.csr import CSRMatrix
    from sextans_tpu.ops.golden import golden_spmm_exact

    n = row["n"]
    m, k = coo.shape
    alpha, beta = 0.85, -2.06
    rng = np.random.default_rng(0)
    b = rng.standard_normal((k, n)).astype(np.float32)
    c = rng.standard_normal((m, n)).astype(np.float32)

    plan, packed, cfg, split = _rebuild_row(row, coo, store, pack_cache, n)
    b_dev = jnp.asarray(b)
    c_dev = jnp.asarray(c)
    csr = CSRMatrix.from_coo(coo)

    full_device = False
    if m * n * 4 > VERIFY_SAMPLE_BYTES:
        blocks = _verify_sample_blocks(m)
        rows_s = np.concatenate(
            [np.arange(s, e, dtype=np.int64) for s, e in blocks]
        )

        def fetch(out):
            if isinstance(out, np.ndarray):
                return out[rows_s]
            return np.asarray(
                jnp.take(out, jnp.asarray(rows_s, dtype=jnp.int32), axis=0)
            )

        sub = _csr_take_rows(csr, rows_s)
        touched = np.unique(sub.indices)
        sub = CSRMatrix(
            (sub.shape[0], int(touched.size)), sub.indptr,
            np.searchsorted(touched, sub.indices).astype(np.int32),
            sub.vals,
        )
        exact = golden_spmm_exact(sub, b[touched], alpha, beta, c[rows_s])
        full_device = True
    else:
        def fetch(out):
            return np.asarray(out)

        exact = golden_spmm_exact(csr, b, alpha, beta, c)

    cmax = row.get("c_max_abs") or float(np.abs(exact).max())
    ulp = float(np.spacing(np.float32(cmax))) or 1e-45

    def release_winner():
        for p in (plan, getattr(plan, "_residue_plan", None)):
            if p is not None:
                p.__dict__.pop("_dev", None)
                # HybridSpmmPlan also pins the same device arrays in the
                # jit-arg tuples (ops/hybrid.py: _dense_args/_res_args) —
                # popping _dev alone leaves the HBM allocated
                p.__dict__.pop("_dense_args", None)
                p.__dict__.pop("_res_args", None)
        getattr(packed, "__dict__", {}).get("_dev_cache", {}).clear()

    upd = attempt_precise_gate(
        plan=plan, packed=packed, cfg=cfg, split=split, n=n,
        name=row["matrix"], coo=coo, csr=csr,
        b_dev=b_dev, c_dev=c_dev, alpha=alpha, beta=beta,
        exact=exact, fetch=fetch, ulp=ulp, full_device=full_device,
        c_host=c, pack_cache=pack_cache, release_winner=release_winner,
    )
    if "precise_sample" in upd:
        upd["precise_sample"]["session"] = session
    row.update(upd)
    return row


def reachable_todo(rows, only=None, n_filter=None, max_nnz=None):
    todo = []
    for r in rows:
        if "gflops" not in r or r.get("meets_1e6_gate"):
            continue
        if r.get("gate_unreachable"):
            continue
        if only and only not in r["matrix"]:
            continue
        if n_filter and r["n"] not in n_filter:
            continue
        if max_nnz and r.get("nnz", 0) > max_nnz:
            continue
        todo.append(r)
    return todo


def _bank_isolated(args, todo):
    """Spawn one child process per todo row (same CLI, --no-isolate with an
    exact row selector). A device OOM poisons a JAX client for good
    (STATUS.md) — in round 5's first banking passes a single webbase1M OOM
    killed every row sorted after it. Isolation bounds the blast radius to
    the row that OOM'd; each child rewrites the results file itself, so
    the parent never writes (it would clobber child updates). Rows that
    stay gate-false after the first pass get ONE more child each — the
    observed failure modes (remote-compile HTTP 500 outage windows,
    shared-pool HBM contention OOMs) are partly transient, and a fresh
    child minutes later is the cheapest retry."""
    import subprocess

    def run_children(rows_to_bank):
        for r in rows_to_bank:
            if args.deadline_ts and time.time() > args.deadline_ts:
                log("deadline reached; stopping")
                break
            cmd = [
                sys.executable, str(Path(__file__).resolve()),
                "--results", args.results,
                "--tuned-configs", args.tuned_configs,
                "--only", r["matrix"], "--n", str(r["n"]),
                "--no-isolate",
            ]
            if args.deadline_ts:
                cmd += ["--deadline-ts", str(args.deadline_ts)]
            log(f"-- child: {r['matrix']} N={r['n']} --")
            try:
                rc = subprocess.run(cmd, timeout=1800).returncode
            except subprocess.TimeoutExpired:
                log(f"  !! child timed out: {r['matrix']} N={r['n']}")
                continue
            if rc != 0:
                log(f"  !! child rc={rc}: {r['matrix']} N={r['n']}")

    run_children(todo)
    doc = json.loads(Path(args.results).read_text())
    still = [
        r for r in doc.get("results", [])
        if not r.get("meets_1e6_gate")
        and any(t["matrix"] == r["matrix"] and t["n"] == r["n"] for t in todo)
    ]
    if still and not (args.deadline_ts and time.time() > args.deadline_ts):
        log(f"retry pass: {len(still)} rows still gate-false")
        run_children(still)
        doc = json.loads(Path(args.results).read_text())
    banked = sum(
        1 for r in doc.get("results", [])
        if r.get("meets_1e6_gate")
        and any(t["matrix"] == r["matrix"] and t["n"] == r["n"] for t in todo)
    )
    log(f"banked {banked}/{len(todo)} rows (isolated children)")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default=str(HERE / "results_r5.json"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--n", type=int, nargs="*", default=None)
    ap.add_argument("--max-nnz", type=int, default=None)
    ap.add_argument("--tuned-configs",
                    default=str(HERE / "tuned_configs.json"))
    ap.add_argument("--deadline-ts", type=float, default=None)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--no-isolate", dest="isolate", action="store_false",
                    default=True,
                    help="bank in-process instead of one child per row")
    args = ap.parse_args(argv)

    doc = json.loads(Path(args.results).read_text())
    rows = doc.get("results", [])
    todo = reachable_todo(rows, args.only,
                          set(args.n) if args.n else None, args.max_nnz)
    log(f"{len(todo)} reachable gate-false rows to bank")
    for r in todo:
        log(f"  {r['matrix']} N={r['n']}: {r.get('gate_note', '(no note)')}")
    if args.dry_run or not todo:
        return 0
    if args.isolate:
        todo.sort(key=lambda r: (r.get("nnz", 0), r["n"]))
        return _bank_isolated(args, todo)

    import jax

    from benchmarks.suite import _gen_cached
    from benchmarks.matrices import suite as suite_gens
    from sextans_tpu.format.pack_cache import PackCache
    from sextans_tpu.utils.autotune import ConfigStore
    from sextans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    session = {
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "device": str(jax.devices()[0]),
        "platform": jax.devices()[0].platform,
    }
    log(f"device: {session['device']}")
    store = ConfigStore(args.tuned_configs)
    pack_cache = PackCache()
    gens = suite_gens("full")

    # small rows first: bank the cheap evidence before any big-row OOM
    todo.sort(key=lambda r: (r.get("nnz", 0), r["n"]))
    done = 0
    coo_cache = {}
    for row in todo:
        if args.deadline_ts and time.time() > args.deadline_ts:
            log("deadline reached; stopping")
            break
        name = row["matrix"]
        if name not in gens:
            log(f"  {name}: no generator; skipping")
            continue
        log(f"== {name} N={row['n']} ({row.get('gate_note', '')}) ==")
        try:
            if name not in coo_cache:
                coo_cache[name] = _gen_cached(name, gens[name])
            bank_row(row, coo_cache[name], store, pack_cache, session)
            done += 1
            log(f"  -> gate={row.get('meets_1e6_gate')} "
                f"note={row.get('gate_note')}")
        except Exception as e:
            log(f"  !! failed: {type(e).__name__}: {str(e)[:200]}")
            row["gate_note"] = (
                f"precise-failed:{type(e).__name__}:{str(e)[:60]}"
            )
            if "RESOURCE_EXHAUSTED" in str(e):
                log("device OOM: stopping this pass (client poisoned)")
                break
        # incremental flush after every row
        Path(args.results).write_text(json.dumps(doc, indent=1))
    log(f"banked {done}/{len(todo)} rows")
    Path(args.results).write_text(json.dumps(doc, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
