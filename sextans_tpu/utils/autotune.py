"""Autotuner: pick pack/kernel parameters per sparsity pattern.

The reference fixes its architecture at bitstream-build time
(src/sextans.h:7-15) and eats load imbalance as scheduler bubbles
(src/sparse_helper.h:390-400). Here the equivalent knobs are runtime
parameters, so we pick them per matrix:

* **analytic mode** (:func:`choose_config`) — exact block counts for each
  candidate ``block_k`` are computed with one O(nnz) pass each (no packing),
  and a simple VPU cost model picks the config minimizing modeled kernel
  time. Zero device time needed.
* **measured mode** (:func:`autotune`) — packs the top analytic candidates
  and times the real kernel on device, returning the fastest plan.

Cost model (per block, VPU micro-kernel in ops/spmm_pallas.py):
``cost ~ C_FIXED + C_FMA * block_k`` vector-op slots per (block, tile_n
panel), plus a per-group overhead. Minimizing
``n_blocks(bk) * (C_FIXED + C_FMA*bk)`` trades padding waste (large bk,
low fill) against per-block overhead (small bk, many blocks).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from sextans_tpu.format.coo import COOMatrix
from sextans_tpu.utils.config import SpmmConfig, cdiv

__all__ = ["choose_config", "autotune", "block_counts", "TuneResult"]

# Relative vector-op costs in the Pallas micro-kernel (per block, per 256-wide
# N panel): accumulator read+write + B-row loads + index/address overhead.
C_FIXED = 10.0
# Per block column: one (8, tile_n) broadcast FMA + its share of the B load.
C_FMA = 3.0
# Per group: grid-step + epilogue amortization.
C_GROUP = 600.0
# HBM bytes moved per VPU-cycle-equivalent (~800 GB/s at ~0.94 GHz); used to
# charge the B-window refetch per (M-tile, K-window) job and the C tile
# read+write per M-tile.
BYTES_PER_CYCLE = 850.0


def block_counts(
    coo: COOMatrix, block_ks: Sequence[int] = (1, 2, 4, 8, 16)
) -> dict:
    """Exact number of 8 x bk blocks A occupies, for each candidate bk."""
    br = coo.rows.astype(np.int64) >> 3
    out = {}
    for bk in block_ks:
        bc = coo.cols.astype(np.int64) // bk
        keys = br * ((coo.shape[1] // bk) + 1) + bc
        out[bk] = int(np.unique(keys).size)
    return out


def job_counts(coo: COOMatrix, tile_m: int, window_k: int) -> int:
    """Exact number of (M-tile, K-window) jobs with nonzeros — each one costs
    a B-window fetch (the window_k x tile_n VMEM fill)."""
    mt = coo.rows.astype(np.int64) // tile_m
    kw = coo.cols.astype(np.int64) // window_k
    keys = mt * ((coo.shape[1] // window_k) + 1) + kw
    return int(np.unique(keys).size)


VMEM_BUDGET = 14 * 1024 * 1024  # ~16 MB/core minus headroom


def vmem_estimate(cfg: SpmmConfig, tile_n: int) -> int:
    """Approximate kernel VMEM footprint in bytes (double-buffered inputs)."""
    acc = cfg.n_acc * cfg.tile_m * tile_n
    cio = 4 * cfg.tile_m * tile_n  # C_in + out, double-buffered
    bwin = 2 * cfg.window_k * tile_n
    vals = 2 * 8 * cfg.group_blocks * cfg.block_k
    return 4 * (acc + cio + bwin + vals)


@dataclass
class TuneResult:
    config: SpmmConfig
    predicted_cost: float
    measured_ms: Optional[float] = None


def choose_config(
    coo: COOMatrix,
    base: SpmmConfig = SpmmConfig(),
    block_ks: Sequence[int] = (1, 2, 4, 8, 16),
    tile_ms: Sequence[int] = (512, 1024, 2048),
    top: int = 1,
    tile_n: int = 512,
) -> List[TuneResult]:
    """Analytic config choice; returns the ``top`` candidates, best first.

    Modeled kernel cost per N-panel (VPU-cycle units):
    blocks * (C_FIXED + C_FMA*bk)          — micro-kernel work
    + groups * C_GROUP                     — grid-step overhead
    + jobs * window_k*tile_n*4 / BYTES_PER_CYCLE   — B window refetch DMA
    + m_tiles * 2*tile_m*tile_n*4 / BYTES_PER_CYCLE — C tile in+out DMA
    """
    counts = block_counts(coo, block_ks)
    results = []
    for tm in tile_ms:
        njobs = None
        for bk, nb in counts.items():
            chunk = max(128 // bk, 1)
            cfg0 = base.with_(block_k=bk, tile_m=tm)
            if njobs is None:
                njobs = job_counts(coo, tm, cfg0.window_k)
            # Size groups near the average job so per-job group padding
            # (each job is padded to a multiple of group_blocks) stays small;
            # padding blocks cost the same kernel time as real ones.
            avg_job = max(1, nb // max(njobs, 1))
            # cap at 16 chunks so the kernel's full chunk-loop unroll applies
            gb = chunk
            while gb * 2 <= min(2 * avg_job, 16 * chunk):
                gb *= 2
            cfg = cfg0.with_(group_blocks=gb)
            if vmem_estimate(cfg, tile_n) > VMEM_BUDGET:
                continue
            padded_blocks = nb + njobs * gb // 2  # expected half-group waste/job
            ngroups = max(1, cdiv(padded_blocks, gb))
            n_mtiles = cdiv(max(coo.shape[0], 1), tm)
            cost = (
                padded_blocks * (C_FIXED + C_FMA * bk)
                + ngroups * C_GROUP
                + njobs * (cfg.window_k * tile_n * 4) / BYTES_PER_CYCLE
                + n_mtiles * (2 * tm * tile_n * 4) / BYTES_PER_CYCLE
            )
            results.append(TuneResult(cfg, cost))
    if not results:  # every candidate exceeded the VMEM budget: shrink tile_n
        return choose_config(
            coo, base, block_ks, tile_ms=(min(tile_ms),), top=top,
            tile_n=max(tile_n // 2, 128),
        )
    results.sort(key=lambda r: r.predicted_cost)
    return results[:top]


def autotune(
    coo: COOMatrix,
    n: int,
    base: SpmmConfig = SpmmConfig(),
    block_ks: Sequence[int] = (2, 4, 8, 16),
    candidates: int = 3,
    backend: str = "auto",
    rp_time: int = 5,
) -> TuneResult:
    """Measured autotune: time the top analytic candidates on device."""
    import jax.numpy as jnp

    from sextans_tpu.format.pack import pack
    from sextans_tpu.ops.plan import SpmmPlan
    from sextans_tpu.utils.timing import time_chained

    cands = choose_config(coo, base, block_ks, top=candidates)
    m, k = coo.shape
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))

    best: Optional[TuneResult] = None
    for cand in cands:
        packed = pack(coo, cand.config)
        plan = SpmmPlan(packed, n, backend=backend)
        secs = time_chained(
            lambda c: plan(b, 1.0, 0.5, c), c0, rp_time=rp_time, warmup=1
        )
        cand.measured_ms = secs * 1e3
        if best is None or cand.measured_ms < best.measured_ms:
            best = cand
    return best
