"""Benchmark timing harness.

The reference repeats the kernel in-device ``rp_time`` times and divides the
wall time (src/sextans-host.cpp:223,237-252; src/sextans.cpp:53-57). The TPU
analog chains ``rp_time`` kernel invocations through a data dependency
(feeding C back in) so the device cannot overlap the repeats, then divides by
the repeat count. A plain loop of independent dispatches overlaps under the
async runtime and reports impossibly low latency.
"""

from __future__ import annotations

import time
from typing import Callable

import jax

__all__ = ["time_chained", "time_repeat", "time_repeat_chained"]


def time_chained(
    step: Callable[[jax.Array], jax.Array],
    c0: jax.Array,
    rp_time: int = 10,
    warmup: int = 2,
) -> float:
    """Time ``step`` (C -> C') chained ``rp_time`` times; returns seconds/call.

    ``step`` must consume and produce an array of the same shape so the chain
    forms a true data dependency (the rp_time loop of src/sextans.cpp:54-60).
    """
    c = c0
    for _ in range(warmup):
        c = step(c)
    jax.block_until_ready(c)
    c = c0
    t0 = time.perf_counter()
    for _ in range(rp_time):
        c = step(c)
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / max(rp_time, 1)


def time_repeat(plan, b, alpha, beta, c0, times: int = 10, detail: bool = False):
    """Time an SpmmPlan with the in-device repeat loop (the faithful rp_time
    analog). Returns seconds per kernel invocation; with ``detail=True``
    returns ``(seconds, info)`` where ``info`` records which protocol
    produced the number (``method``: "differential" when wall(2T)-wall(T)
    resolved, "amortized" when the fallback engaged) plus the raw walls —
    so every published row can carry its own error-bar provenance.

    Measurement is *differential*: wall(2T) - wall(T), each wall including a
    full result fetch. This cancels every fixed cost — dispatch RTT, result
    transfer, host overhead — and defeats two remote-runtime hazards observed
    on the axon tunnel: result memoization of identical dispatches (alpha is
    perturbed in the last mantissa bits per sample) and ``block_until_ready``
    returning before execution completes (the fetch is the real barrier).
    """
    import numpy as np

    times = max(times, 1)

    def wall(t, al):
        t0 = time.perf_counter()
        out = plan.repeat(b, al, beta, c0, times=t)
        # Completion barrier: fetch ONE element. The slice op queues behind
        # the producer, so its arrival implies the chain finished — without
        # pulling the full M x N result through the tunnel (a 9.6 MB C at
        # N=512 costs 100-250 ms of transfer per wall, swamping sub-ms
        # kernels; block_until_ready alone has been observed returning
        # before execution completes on the remote runtime).
        np.asarray(out[:1, :1])
        return time.perf_counter() - t0

    wall(times, alpha)  # compile T
    wall(2 * times, alpha)  # compile 2T
    return _differential(wall, times, alpha, detail, "")


def _differential(wall, times, alpha, detail, tag):
    """Shared differential protocol: wall(2T) - wall(T) with alpha perturbed
    per sample (defeats result memoization), amortized fallback when the two
    walls agree within noise."""
    eps = abs(alpha) * 1e-7 + 1e-12
    w1 = min(wall(times, alpha + eps), wall(times, alpha + 2 * eps))
    w2 = min(wall(2 * times, alpha + 3 * eps), wall(2 * times, alpha + 4 * eps))
    dt = (w2 - w1) / times
    avg2 = w2 / (2 * times)  # conservative: includes fixed costs, amortized
    method = "differential"
    if dt < 0.25 * avg2:
        # The two walls agree within noise — the differential is meaningless
        # (can report absurd near-zero marginals). Use the amortized wall,
        # which can only overestimate.
        dt = avg2
        method = "amortized"
    if detail:
        return dt, {
            "method": tag + method,
            "wall_T_s": round(w1, 6),
            "wall_2T_s": round(w2, 6),
            "times": times,
        }
    return dt


def time_repeat_chained(plan, b, alpha, beta, c0, times: int = 10,
                        detail: bool = False):
    """``time_repeat`` fallback for plans whose in-device repeat program
    cannot compile (observed: webbase1M N=512 hybrid+ell — jit(rep)'s
    while-loop carries the kernel's padded steering temps and OOMs HBM by
    77 MB while the single-call program fits comfortably). Chains ``times``
    single-call dispatches through the C carry on the host — same data
    dependency, same differential/fetch protocol, no while-loop program.
    Dispatch overhead rides on every step, so this can only overestimate."""
    import numpy as np

    times = max(times, 1)

    def wall(t, al):
        t0 = time.perf_counter()
        c = c0
        for _ in range(t):
            c = plan(b, al, beta, c)
        np.asarray(c[:1, :1])  # fetch barrier (see time_repeat)
        return time.perf_counter() - t0

    wall(1, alpha)  # compile (usually already compiled by the verify pass)
    return _differential(wall, times, alpha, detail, "chained-")
