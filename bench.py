"""Headline benchmark: SpMM GFLOPS on the real TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "GFLOPS", "vs_baseline": N}

Baseline = the reference U280 bitstream's structural peak, ~259 FP32 GFLOP/s
(BASELINE.md: 64 nnz/cycle x 16 FLOP x 253 MHz). GFLOPS formula matches the
reference host: 2*N*(nnz+M)/t (src/sextans-host.cpp:255-259). Timing uses
the in-device repeat loop (the rp_time analog, src/sextans.cpp:54-60) with
differential fetch-based measurement — see docs/BENCHMARKING.md for the
measurement traps this defeats.

Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

U280_PEAK_GFLOPS = 259.0
NASA4704 = Path("/root/reference/matrices/nasa4704/nasa4704.mtx")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_workload():
    """nasa4704 if the reference mount is present, else an equivalent
    synthetic FEM-like banded matrix."""
    from sextans_tpu.format.coo import COOMatrix
    from sextans_tpu.io.mtx import read_mtx

    if NASA4704.exists():
        log(f"workload: {NASA4704}")
        return "nasa4704", read_mtx(NASA4704)
    log("workload: synthetic banded (reference mount absent)")
    return "synthetic4704", COOMatrix.random(
        4704, 4704, 104756, seed=42, banded=True, bandwidth=300
    )


SCHEDULER_PIDFILES = ("/tmp/night.pid", "/tmp/day.pid", "/tmp/final.pid")
SCHEDULER_MARKERS = (b"r5_night", b"r5_day", b"r5_final")


def busy_scheduler(pidfiles=SCHEDULER_PIDFILES, markers=SCHEDULER_MARKERS):
    """Return (pidfile, pid) of a live round scheduler, else None. The
    cmdline match guards against pid reuse after the scheduler exits."""
    for pidfile in pidfiles:
        try:
            pid = int(Path(pidfile).read_text().strip())
            cmd = Path(f"/proc/{pid}/cmdline").read_bytes()
        except (OSError, ValueError):
            continue
        if any(m in cmd for m in markers):
            return (pidfile, pid)
    return None


def wait_for_quiet_pool(max_wait_s=900, poll_s=30, _clock=time, **probe_kw):
    """The shared TPU pool corrupts timings when anything else dispatches
    (STATUS.md). The round schedulers record their pids in /tmp/{night,day}
    .pid — if one is still measuring, wait (bounded) before taking the
    headline number instead of racing it."""
    deadline = _clock.time() + max_wait_s
    while _clock.time() < deadline:
        busy = busy_scheduler(**probe_kw)
        if busy is None:
            return
        log(f"waiting for scheduler {busy[0]} (pid {busy[1]}) to finish "
            f"({int(deadline - _clock.time())}s left)")
        _clock.sleep(min(poll_s, max(0.0, deadline - _clock.time())))
    log("scheduler still running at wait deadline; measuring anyway "
        "(min-of-samples defends against contention)")


def main():
    import jax
    import jax.numpy as jnp
    from sextans_tpu.utils.cache import enable_compilation_cache

    wait_for_quiet_pool()
    enable_compilation_cache()

    from sextans_tpu.format.csr import CSRMatrix
    from sextans_tpu.ops.golden import golden_spmm, golden_spmm_exact
    from sextans_tpu.format.pack import pack
    from sextans_tpu.format.pack_mxu import pack_mxu
    from sextans_tpu.utils.config import SpmmConfig
    from sextans_tpu.utils.timing import time_repeat
    from sextans_tpu.utils.verify import gflops, verify

    platform = jax.devices()[0].platform
    log(f"devices: {jax.devices()}")

    name, coo = load_workload()
    m, k = coo.shape
    n = 512
    nnz = coo.nnz

    rng = np.random.default_rng(0)
    b = rng.standard_normal((k, n)).astype(np.float32)
    c = rng.standard_normal((m, n)).astype(np.float32)
    alpha, beta = 0.85, -2.06

    ref = golden_spmm(CSRMatrix.from_coo(coo), b, alpha, beta, c)
    b_dev = jnp.asarray(b)  # upload dense operands once (host link is slow)

    # Candidate configs, best first; fall back if a kernel variant fails to
    # compile on this runtime (bench must never zero out on a variant bug).
    preferred = "pallas" if platform == "tpu" else "xla"
    # In-device repeat counts: the tunnel adds 10-40 ms dispatch jitter, so
    # the differential timing needs T large enough that T*kernel_time >> jitter.
    race_times, final_times = (512, 2048) if platform == "tpu" else (4, 8)
    # MXU dense-slab kernel first (round-2 measurements: 938 GFLOPS vs the
    # VPU kernel's 438 in the same session on nasa4704 N=512); VPU block
    # kernel and the portable XLA backend as fallbacks.
    mxu_cfg = SpmmConfig(
        tile_m=1024, window_k=4096, block_k=128, group_blocks=8,
        chunk_unroll=2,
    )
    # single-tile config: M fits one 4864-row tile and K one 4736-col
    # window, so the whole product is one (tile, window) job — zero C-tile
    # switching, B resident throughout. Legal since the round-3 VMEM
    # envelope measurement (docs/DESIGN.md §8).
    mxu_one = SpmmConfig(
        tile_m=4864, window_k=4736, block_k=128, group_blocks=8,
        chunk_unroll=2,
    )
    candidates = [
        (mxu_cfg, "mxu"),
        (mxu_one, "mxu"),
        (mxu_one.with_(tile_n=256), "mxu"),
        (mxu_cfg.with_(tile_n=256), "mxu"),
        (SpmmConfig(), preferred),  # stable VPU config: n_acc=1, tile_n=512
        (SpmmConfig(), "xla"),
    ]
    best_plan = None
    best_secs = None
    got = None
    c0 = jnp.asarray(c)
    for cfg, backend in candidates:
        if backend == "xla" and best_plan is not None:
            break  # xla is the last resort, only used if no pallas variant ran
        if backend == "mxu" and platform != "tpu":
            continue  # interpret-mode mxu is not a benchmark candidate
        try:
            from sextans_tpu.ops.plan import SpmmPlan

            t0 = time.perf_counter()
            packed = (
                pack_mxu(coo, cfg) if backend == "mxu" else pack(coo, cfg)
            )
            log(
                f"pack[{backend}, bk={cfg.block_k}, tm={cfg.tile_m}]: "
                f"{time.perf_counter()-t0:.3f}s, blocks={packed.stats.blocks} "
                f"fill={packed.stats.block_fill:.3f} groups={packed.n_groups}"
            )
            plan = SpmmPlan(packed, n, backend=backend)
            got_cand = np.asarray(plan(b_dev, alpha, beta, c0))
            res_cand = verify(ref, got_cand)
            if not res_cand.passed:
                log(
                    f"  candidate ({backend}, bk={cfg.block_k}) FAILED "
                    f"verification: {res_cand.mismatch_percent:.2f}% mismatch"
                )
                continue
            # min-of-2 race samples: the shared pool's dispatch jitter can
            # inflate a single differential sample 3-4x
            secs = min(
                time_repeat(plan, b_dev, alpha, beta, c0, times=race_times)
                for _ in range(2)
            )
            log(f"  candidate ({backend}, bk={cfg.block_k}, tm={cfg.tile_m}): "
                f"{secs*1e3:.3f} ms")
            if best_secs is None or secs < best_secs:
                best_plan, best_secs, got = plan, secs, got_cand
        except Exception as e:  # compile/runtime failure → next candidate
            log(f"candidate ({backend}, bk={cfg.block_k}) failed: {e!r}")
    if best_plan is None:
        print(
            json.dumps(
                {
                    "metric": f"spmm_gflops_{name}_n{n}",
                    "value": 0.0,
                    "unit": "GFLOPS",
                    "vs_baseline": 0.0,
                    "error": "no backend ran",
                }
            )
        )
        return 1

    # correctness gate (reference verifier semantics) + the 1e-6 north-star
    # error accounting vs the float64 oracle (BASELINE.md; docs/ACCURACY.md
    # documents the f32 output representation bound this is judged against)
    res = verify(ref, got)
    log(str(res))
    exact = golden_spmm_exact(CSRMatrix.from_coo(coo), b, alpha, beta, c)
    max_abs_f64 = float(np.abs(got - exact).max())
    ulp_bound = float(np.spacing(np.float32(np.abs(exact).max())))
    log(
        f"max_abs vs float64 oracle: {max_abs_f64:.3e} "
        f"({max_abs_f64 / ulp_bound:.2f} ulp of max|C|={np.abs(exact).max():.1f})"
    )
    if not res.passed:
        print(
            json.dumps(
                {
                    "metric": f"spmm_gflops_{name}_n{n}",
                    "value": 0.0,
                    "unit": "GFLOPS",
                    "vs_baseline": 0.0,
                    "error": "verification failed",
                }
            )
        )
        return 1

    # The shared device pool shows up-to-18x dispatch-queueing inflation in
    # contended windows (a dependency-chained timing can only be understated
    # by contention, never overstated). Sample across a window, keep the
    # minimum, and keep sampling while the samples look contended.
    samples = [
        time_repeat(best_plan, b_dev, alpha, beta, c0, times=final_times)
        for _ in range(3)
    ]
    t_end = time.perf_counter() + 240  # bounded: driver timeouts are real
    while (
        max(samples) > 2.5 * min(samples)  # spread says contention
        or len(samples) < 4
    ) and time.perf_counter() < t_end:
        time.sleep(10)
        samples.append(
            time_repeat(best_plan, b_dev, alpha, beta, c0, times=final_times)
        )
    secs = min(samples)
    log(
        f"samples (ms): {[round(s * 1e3, 3) for s in samples]} "
        f"-> min {secs * 1e3:.3f}"
    )
    value = gflops(nnz, m, n, secs)
    log(f"kernel: {secs*1e3:.3f} ms -> {value:.1f} GFLOPS (incl. host padding path)")

    print(
        json.dumps(
            {
                "metric": f"spmm_gflops_{name}_n{n}",
                "value": round(value, 2),
                "unit": "GFLOPS",
                "vs_baseline": round(value / U280_PEAK_GFLOPS, 3),
                "backend": best_plan.backend,
                "max_abs_vs_f64": max_abs_f64,
                "max_abs_vs_f64_ulp": round(max_abs_f64 / ulp_bound, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
