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

import dataclasses
import json
import logging
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from sextans_tpu.format.coo import COOMatrix
from sextans_tpu.utils.config import SpmmConfig, cdiv

__all__ = [
    "choose_config",
    "choose_config_mxu",
    "choose_config_edge",
    "choose_backend",
    "autotune",
    "block_counts",
    "block_counts_mxu",
    "TuneResult",
    "ConfigStore",
]

logger = logging.getLogger("sextans_tpu.autotune")

# Cost-model constants, calibrated against v5e measurements (docs/BENCHMARKING.md):
# scalar/addressing cycles per block visit (a visit = block x N-panel)
S_FIXED = 5.0
# Scalar steering is per-BLOCK while vector work is per-vreg-chunk of
# 128/bk blocks, so small-bk configs pay ~S_BLOCK/bk extra per visit.
# Round-2 calibration: bk=1 measured ~107 cycles/visit (webgraph residue),
# bk=2 ~80 (r1 webgraph), bk=8 ~26 (nasa full-unroll).
S_BLOCK = 100.0
# vector cycles per visit ~ (bk + C_VEC) * (tile_n/128) / VREGS_PER_CYCLE
C_VEC = 3.0
VREGS_PER_CYCLE = 4.0  # VPU ALUs retire ~4 (8,128) ops/cycle
# Per grid step (group x panel): pipeline + epilogue amortization.
C_GROUP = 600.0
# HBM bytes moved per cycle (~800 GB/s at ~0.94 GHz): charges the B-window
# refetch per (M-tile, K-window) job, C in/out, and the A re-stream per panel.
BYTES_PER_CYCLE = 850.0


def _tune_cache(coo) -> dict:
    """Per-matrix memo for the O(nnz log nnz) count primitives below: one
    suite row invokes the family choosers several times (top-pick, race
    diversity, hybrid gate), and each np.unique over a 45M-edge matrix
    costs seconds — uncached, ldoor-class rows spent ~20 min in pure
    analytics."""
    c = getattr(coo, "_tune_cache", None)
    if c is None:
        c = {}
        try:
            coo._tune_cache = c
        except AttributeError:
            pass
    return c


def block_counts(
    coo: COOMatrix, block_ks: Sequence[int] = (1, 2, 4, 8, 16)
) -> dict:
    """Exact number of 8 x bk blocks A occupies, for each candidate bk."""
    cache = _tune_cache(coo)
    br = None
    out = {}
    for bk in block_ks:
        key = ("bc8", bk)
        if key not in cache:
            if br is None:
                br = coo.rows.astype(np.int64) >> 3
            bc = coo.cols.astype(np.int64) // bk
            keys = br * ((coo.shape[1] // bk) + 1) + bc
            cache[key] = int(np.unique(keys).size)
        out[bk] = cache[key]
    return out


def job_counts(coo: COOMatrix, tile_m: int, window_k: int) -> int:
    """Exact number of (M-tile, K-window) jobs with nonzeros — each one costs
    a B-window fetch (the window_k x tile_n VMEM fill)."""
    cache = _tune_cache(coo)
    key = ("jc", tile_m, window_k)
    if key not in cache:
        mt = coo.rows.astype(np.int64) // tile_m
        kw = coo.cols.astype(np.int64) // window_k
        keys = mt * ((coo.shape[1] // window_k) + 1) + kw
        cache[key] = int(np.unique(keys).size)
    return cache[key]


# Candidate gate for the analytic choosers. Tracks the MEASURED scoped-VMEM
# envelope (utils/config.VMEM_BYTES = 98 MiB, bisected on v5e round 3 —
# docs/DESIGN.md §8) with 2 MiB slack so a proposed config never dies at the
# kernel guard. The old 14 MiB value predated the bisection and silently
# excluded the big-tile/big-window configs (the ldoor-class B-restream
# lever, edge wk=32768) from every race.
VMEM_BUDGET = 96 * 1024 * 1024


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
    # packed format / backend family this config targets:
    # "vpu" -> format/pack.py + ops/spmm_pallas.py (backend "pallas"/"xla")
    # "mxu" -> format/pack_mxu.py + ops/spmm_mxu_pallas.py (backend "mxu")
    fmt: str = "vpu"


def choose_config(
    coo: COOMatrix,
    base: SpmmConfig = SpmmConfig(),
    block_ks: Sequence[int] = (1, 2, 4, 8),
    tile_ms: Sequence[int] = (512, 1024, 2048, 4096),
    tile_ns: Sequence[int] = (128, 256, 512),
    window_ks: Sequence[int] = (2048, 4096, 8192, 16384),
    top: int = 1,
    n: int = 512,
) -> List[TuneResult]:
    """Analytic config choice over (block_k, tile_m, tile_n); best first.

    Modeled total kernel cycles for an (M,K) x (K,N) product with
    panels = N / tile_n:

      blocks * [ S_FIXED * panels                      — scalar/addressing
                 + (bk + C_VEC) * N/128 / VREGS_PER_CYCLE ]   — vector work
      + groups * C_GROUP * panels                      — grid-step overhead
      + [ jobs * window_k * 4 * N                      — B window refetches
          + 2 * M * N * 4                              — C in + out
          + A_bytes * panels ] / BYTES_PER_CYCLE       — A re-stream per panel

    Group padding (each job padded to a multiple of group_blocks) is modeled
    as half a group per job. Candidates exceeding the VMEM budget are
    dropped; tile_n is chosen jointly so large tile_m (fewer B refetches)
    remains reachable at small tile_n.
    """
    m = max(coo.shape[0], 1)
    counts = block_counts(coo, block_ks)
    results = []
    for tm, wk in [(a, b) for a in tile_ms for b in window_ks]:
        njobs = job_counts(coo, tm, wk)
        for bk, nb in counts.items():
            chunk = max(128 // bk, 1)
            cfg0 = base.with_(block_k=bk, tile_m=tm, window_k=wk)
            # Size groups near the average job, capped at 16 chunks (= 2048
            # value lanes): in-session A/B on v5e showed gb past that cliff
            # (cant-like bk=4: 415 GFLOPS at 16 chunks vs 89 at 32).
            avg_job = max(1, nb // max(njobs, 1))
            gb = chunk
            while gb * 2 <= min(2 * avg_job, 16 * chunk):
                gb *= 2
            cfg = cfg0.with_(group_blocks=gb)
            padded_blocks = nb + njobs * gb // 2
            ngroups = max(1, cdiv(padded_blocks, gb))
            a_bytes = padded_blocks * (32 * bk + 8)
            for tn in tile_ns:
                if tn > ((n + 127) // 128) * 128:
                    continue
                if vmem_estimate(cfg, tn) > VMEM_BUDGET:
                    continue
                panels = max(1, cdiv(n, tn))
                cost = (
                    padded_blocks
                    * (
                        (S_FIXED + S_BLOCK / bk) * panels
                        + (bk + C_VEC) * (n / 128.0) / VREGS_PER_CYCLE
                    )
                    + ngroups * C_GROUP * panels
                    + (
                        njobs * cfg.window_k * 4 * n
                        + 2 * m * n * 4
                        + a_bytes * panels
                    )
                    / BYTES_PER_CYCLE
                )
                results.append(TuneResult(cfg.with_(tile_n=tn), cost))
    if not results:  # nothing fits VMEM: smallest safe fallback
        return [
            TuneResult(
                base.with_(tile_m=min(tile_ms), tile_n=128), float("inf")
            )
        ]
    results.sort(key=lambda r: r.predicted_cost)
    return results[:top]


# Measured on v5e (nasa4704 probes, round 2): one MXU block visit — dynamic
# B-slab slice + (bk,128)x(bk,tile_n) HIGHEST-precision contraction + slab
# accumulate — costs ~160-220 cycles per (block, N-panel), near-independent
# of bk (weight-load / issue bound). Deep blocks therefore win whenever the
# A-stream DMA they inflate stays under the per-visit saving.
MXU_BLOCK_CYCLES = 190.0
# Packed-A inflation ceiling for MXU candidates (bytes of packed vals per
# nonzero; CSR is ~8, the nasa bk=128 pack is ~127).
MXU_MAX_BYTES_PER_NNZ = 512.0


def block_counts_mxu(
    coo: COOMatrix, block_ks: Sequence[int] = (32, 64, 128)
) -> dict:
    """Exact number of 128 x bk dense slabs A occupies, per candidate bk."""
    cache = _tune_cache(coo)
    ms = None
    out = {}
    for bk in block_ks:
        key = ("bc128", bk)
        if key not in cache:
            if ms is None:
                ms = coo.rows.astype(np.int64) >> 7  # 128-row slab
            bc = coo.cols.astype(np.int64) // bk
            keys = ms * ((coo.shape[1] // bk) + 1) + bc
            cache[key] = int(np.unique(keys).size)
        out[bk] = cache[key]
    return out


def choose_config_mxu(
    coo: COOMatrix,
    base: SpmmConfig = SpmmConfig(),
    block_ks: Sequence[int] = (32, 64, 128),
    tile_ms: Sequence[int] = (512, 1024, 2048, 4096),
    tile_ns: Sequence[int] = (128, 256, 512),
    window_ks: Sequence[int] = (2048, 4096, 8192),
    top: int = 1,
    n: int = 512,
) -> List[TuneResult]:
    """Analytic config choice for the MXU dense-slab kernel; best first.

    Modeled cycles: blocks * MXU_BLOCK_CYCLES * panels + group overhead +
    (A re-stream per panel + B window refetch per job + C in/out) DMA.

    Candidates whose packed A would exceed ``MXU_MAX_BYTES_PER_NNZ`` are
    dropped: on scattered patterns the dense-slab format inflates to
    KB-per-nonzero (scircuit-class measured ~8.7 KB/nnz), which is a
    host-memory and upload bomb long before it is a kernel-time problem.
    """
    m = max(coo.shape[0], 1)
    counts = block_counts_mxu(coo, block_ks)
    results = []
    for tm, wk in [(a, b) for a in tile_ms for b in window_ks]:
        if tm % 128 != 0:
            continue
        njobs = job_counts(coo, tm, wk)
        for bk, nb in counts.items():
            if bk % 8 != 0 or wk % bk != 0:
                continue
            if nb * bk * 128 * 4 > MXU_MAX_BYTES_PER_NNZ * max(coo.nnz, 1):
                continue
            # group ~512-1024 vals sublanes per DMA step
            gb = max(1, min(64, 1024 // bk))
            avg_job = max(1, nb // max(njobs, 1))
            while gb > 1 and gb > 2 * avg_job:
                gb //= 2
            cfg = base.with_(
                block_k=bk, tile_m=tm, window_k=wk, group_blocks=gb
            )
            padded_blocks = nb + njobs * gb // 2
            ngroups = max(1, cdiv(padded_blocks, gb))
            a_bytes = padded_blocks * (bk * 128 * 4 + 8)
            for tn in tile_ns:
                if tn > ((n + 127) // 128) * 128:
                    continue
                if vmem_estimate(cfg.with_(n_acc=1), tn) > VMEM_BUDGET:
                    continue
                panels = max(1, cdiv(n, tn))
                cost = (
                    padded_blocks * MXU_BLOCK_CYCLES * panels
                    + ngroups * C_GROUP * panels
                    + (
                        njobs * cfg.window_k * 4 * n
                        + 2 * m * n * 4
                        + a_bytes * panels
                    )
                    / BYTES_PER_CYCLE
                )
                results.append(
                    TuneResult(cfg.with_(tile_n=tn), cost, fmt="mxu")
                )
    if not results:
        return []
    results.sort(key=lambda r: r.predicted_cost)
    return results[:top]


# Edge-stream kernel (ops/spmm_edge_pallas.py) per-slot cost: SMEM decode +
# one (1, tile_n) unaligned gather-FMA + amortized row flush. v5e round-2
# measurements (nasa4704, mildly contended session): ~21 cyc/slot at
# tile_n=128, ~113 at tile_n=512 (L=4) — the dynamic-sublane extract cost
# scales with tile_n. The per-edge paths on this hardware are latency-bound
# 20-100x above the FPGA's 1/64-cycle URAM scatter (docs/DESIGN.md bound).
EDGE_CYCLES_FIXED = 6.0
EDGE_CYCLES_PER_128LANES = 20.0


def choose_config_edge(
    coo: COOMatrix,
    base: SpmmConfig = SpmmConfig(),
    tile_ms: Sequence[int] = (1024, 2048, 4096, 8192, 16384),
    tile_ns: Sequence[int] = (128, 256, 512),
    window_ks: Sequence[int] = (4096, 8192, 16384, 32768),
    top: int = 1,
    n: int = 512,
) -> List[TuneResult]:
    """Analytic config choice for the structure-independent edge-stream
    kernel; best first. Cost is pattern-independent per edge (the format
    never pads beyond job-chunk tails), so this family wins exactly where
    block fill collapses — scattered/power-law residues."""
    from sextans_tpu.format.pack_edge import MAX_TILE_M, MAX_WINDOW_K

    m = max(coo.shape[0], 1)
    nnz = max(coo.nnz, 1)
    E = base.edge_chunk
    results = []
    for tm in tile_ms:
        if tm > MAX_TILE_M:
            continue
        for wk in window_ks:
            if wk > MAX_WINDOW_K:
                continue
            njobs = job_counts(coo, tm, wk)
            padded_edges = nnz + njobs * E // 2
            nchunks = max(1, cdiv(padded_edges, E))
            a_bytes = 8 * nchunks * E
            cfg = base.with_(tile_m=tm, window_k=wk)
            for tn in tile_ns:
                if tn > ((n + 127) // 128) * 128:
                    continue
                vmem = 4 * (
                    tm * tn + 4 * tm * tn + 2 * wk * tn
                ) + 16 * E
                if vmem > VMEM_BUDGET:
                    continue
                panels = max(1, cdiv(n, tn))
                cost = (
                    padded_edges
                    * (EDGE_CYCLES_FIXED + EDGE_CYCLES_PER_128LANES * tn / 128)
                    * panels
                    + nchunks * C_GROUP * panels
                    + (
                        njobs * wk * 4 * n
                        + 2 * m * n * 4
                        + a_bytes * panels
                    )
                    / BYTES_PER_CYCLE
                )
                results.append(
                    TuneResult(cfg.with_(tile_n=tn), cost, fmt="edge")
                )
    results.sort(key=lambda r: r.predicted_cost)
    return results[:top]


# HBM-gather engine, XLA variant (ops/spmm_ell_xla.py): modeled as pure
# bandwidth with a derating factor for XLA's gather lowering.
# 4.0 is a deliberately pessimistic placeholder — the model should only
# claim the row where even derated bandwidth beats the ~20-cycle
# per-edge VPU floor.
ELL_GATHER_FACTOR = 4.0
ELL_SCAN_STEP_CYCLES = 3000.0  # lax.map step dispatch overhead

# Pallas chunk-gather variant (ops/spmm_ell_pallas.py): one 4 KiB chunk DMA
# per slot, scalar-issue bound. v5e calibration (940 MHz), from
# benchmarks/scratch/ell_issue_probe.py (variant C, uniform 262k-row sweep)
# and ell_fold_probe.py (real amazon_like packs):
#   cycles/DMA ~ (18 + 2*ns) * depth_factor(R)
#     ns=1 (n_pad=128): R=8 -> 19.6 meas / 20 model; R=4 -> 24.7 / 25
#     ns=4 (n_pad=512): R=8 -> 26.5 / 26; R=4 -> 33.3 / 32.5; R=2 -> 36.4
#   (shallow R starves the double-buffered DMA pipeline, hence the factor)
# hub fold (XLA scatter-add): full-array copy (aliased functional update)
#   plus ~11.6 * ns cycles per virtual row (62 ms @ 1.25M rows, ns=4).
_ELL_PALLAS_DEPTH_FACTOR = {1: 1.7, 2: 1.4, 3: 1.3, 4: 1.25, 6: 1.1}
ELL_PALLAS_FOLD_CYCLES_PER_NS = 11.6


def _ell_pallas_n_pad(n: int) -> int:
    from sextans_tpu.utils.config import round_up

    for c in (128, 256, 512, 1024):
        if n <= c:
            return c
    return round_up(n, 1024)


def _ell_pallas_cycles(deg: np.ndarray, r: int, n_pad: int) -> float:
    """Modeled cycles of one Pallas chunk-gather call at slots_per_row=r
    (pad rows from tile_m rounding excluded — added per-candidate)."""
    chunks = np.maximum(-(-deg // r), (deg > 0).astype(np.int64))
    slots = int(np.maximum(chunks, 1).sum()) * r
    virt = int(np.maximum(chunks - 1, 0).sum())
    m = deg.shape[0]
    panels = max(1, n_pad // 1024)
    ns = min(n_pad, 1024) // 128
    per_dma = max(
        (18.0 + 2.0 * ns) * _ELL_PALLAS_DEPTH_FACTOR.get(r, 1.0),
        4096.0 / BYTES_PER_CYCLE,
    )
    stream = (
        slots * 8.0  # cols/vals
        + (m + virt) * n_pad * 4.0  # AB write
    )
    cost = slots * panels * per_dma + stream / BYTES_PER_CYCLE
    if virt:
        # XLA scatter-add fold: aliased read+write copy of the whole
        # padded output, plus the per-virtual-row scatter work
        cost += (m + virt) * n_pad * 8.0 / BYTES_PER_CYCLE
        cost += virt * ELL_PALLAS_FOLD_CYCLES_PER_NS * ns * panels
    return cost


def choose_config_ell(
    coo: COOMatrix,
    base: SpmmConfig = SpmmConfig(),
    tile_ms: Sequence[int] = (8192, 16384, 32768, 65536),
    top: int = 1,
    n: int = 512,
    engine: str = "auto",
) -> List[TuneResult]:
    """Analytic config choice for the HBM-gather ELL engines; best first.

    ``engine`` selects the cost model for the variant SpmmPlan's auto
    backend will actually run: "pallas" (chunk-gather kernel, DMA-issue
    bound — the TPU path) or "xla" (bulk jnp.take, bandwidth model); "auto"
    resolves by jax.default_backend(). Candidates whose slot inflation
    would make ``pack_ell`` refuse are dropped here so the race never
    wastes a pack."""
    from sextans_tpu.format.pack_ell import (
        DEFAULT_MAX_BYTES_PER_NNZ,
        ELL_MIN_FETCH,
        choose_slots_per_row,
        ell_traffic_bytes,
    )
    from sextans_tpu.utils.config import round_up

    if engine == "auto":
        # SEXTANS_ELL_ENGINE pins the model when the choosing process is
        # not the executing one (benchmarks/prepack.py warms pack caches on
        # a CPU-pinned process for a TPU suite run — candidate enumeration
        # must match or every warmed ELL pack misses)
        import os

        engine = os.environ.get("SEXTANS_ELL_ENGINE", "")
        if engine not in ("pallas", "xla"):
            import jax

            engine = "pallas" if jax.default_backend() == "tpu" else "xla"

    m = max(coo.shape[0], 1)
    nnz = max(coo.nnz, 1)
    deg = np.bincount(coo.rows, minlength=m).astype(np.int64)
    if engine == "pallas":
        n_pad = _ell_pallas_n_pad(max(n, 1))
        r_cands = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32)
        r = min(r_cands, key=lambda rc: _ell_pallas_cycles(deg, rc, n_pad))
        base_cycles = _ell_pallas_cycles(deg, r, n_pad)
        panels = max(1, n_pad // 1024)
        ns = min(n_pad, 1024) // 128
        per_dma = max(
            (18.0 + 2.0 * ns) * _ELL_PALLAS_DEPTH_FACTOR.get(r, 1.0),
            4096.0 / BYTES_PER_CYCLE,
        )
        pad_row_cycles = r * panels * per_dma + n_pad * 4.0 / BYTES_PER_CYCLE
        step_cycles = 0.0
    else:
        r = choose_slots_per_row(coo, n=n)
        base_cycles = (
            ell_traffic_bytes(deg, r, n) / BYTES_PER_CYCLE * ELL_GATHER_FACTOR
        )
        # same minimum-fetch constant as ell_traffic_bytes: recalibrating
        # pack_ell.ELL_MIN_FETCH must move both cost terms together
        row_bytes = max(4 * n, ELL_MIN_FETCH)
        pad_row_cycles = (
            r * (row_bytes + 8.0) / BYTES_PER_CYCLE * ELL_GATHER_FACTOR
        )
        step_cycles = ELL_SCAN_STEP_CYCLES
    chunks = np.maximum(-(-deg // r), (deg > 0).astype(np.int64))
    virt = int(np.maximum(chunks - 1, 0).sum())
    m_total = m + virt
    results = []
    for tm in tile_ms:
        m_padded = round_up(max(m_total, 1), tm)
        if (
            8.0 * m_padded * r / nnz > DEFAULT_MAX_BYTES_PER_NNZ
            and 8 * m_padded * r > (1 << 20)
        ):
            continue  # pack_ell would refuse this inflation
        pad_rows = m_padded - m_total
        cost = (
            base_cycles
            + pad_rows * pad_row_cycles
            + (m_padded // tm) * step_cycles
        )
        cfg = base.with_(tile_m=tm, ell_r=r)
        results.append(TuneResult(cfg, cost, fmt="ell"))
    results.sort(key=lambda t: t.predicted_cost)
    return results[:top]


def choose_backend(
    coo: COOMatrix,
    n: int = 512,
    base: SpmmConfig = SpmmConfig(),
    top: int = 1,
) -> List[TuneResult]:
    """Joint analytic choice across the three kernel families (VPU block
    format, MXU dense-slab format, structure-independent edge stream) — the
    per-sparsity-pattern dispatch the reference resolves at bitstream-build
    time. Returns the merged top-N, best first; ``TuneResult.fmt`` says
    which pack pass to run."""
    vpu = choose_config(coo, base, top=max(top, 1), n=n)
    mxu = choose_config_mxu(coo, base, top=max(top, 1), n=n)
    edge = choose_config_edge(coo, base, top=max(top, 1), n=n)
    ell = choose_config_ell(coo, base, top=max(top, 1), n=n)
    merged = sorted(vpu + mxu + edge + ell, key=lambda r: r.predicted_cost)
    return merged[:top]


def autotune(
    coo: COOMatrix,
    n: int,
    base: SpmmConfig = SpmmConfig(),
    block_ks: Sequence[int] = (2, 4, 8),
    candidates: int = 3,
    backend: str = "auto",
    rp_time: int = 64,
) -> TuneResult:
    """Measured autotune: time the top analytic candidates on device.

    Candidates span BOTH kernel families (VPU block format and MXU
    dense-slab format); ``backend`` applies to VPU candidates only ("auto"
    resolves per format).
    """
    import jax.numpy as jnp

    from sextans_tpu.format.pack import pack
    from sextans_tpu.format.pack_edge import pack_edge
    from sextans_tpu.format.pack_mxu import pack_mxu
    from sextans_tpu.ops.plan import SpmmPlan
    from sextans_tpu.utils.timing import time_repeat

    cands = choose_config(coo, base, block_ks, top=candidates, n=n)
    cands += choose_config_mxu(coo, base, top=max(1, candidates - 1), n=n)
    cands += choose_config_edge(coo, base, top=1, n=n)
    cands += choose_config_ell(coo, base, top=1, n=n)
    m, k = coo.shape
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))

    best: Optional[TuneResult] = None
    errors = []
    for cand in cands:
        try:
            if cand.fmt == "mxu":
                packed = pack_mxu(coo, cand.config)
                plan = SpmmPlan(packed, n, backend="auto")
            elif cand.fmt == "edge":
                packed = pack_edge(coo, cand.config)
                plan = SpmmPlan(packed, n, backend="auto")
            elif cand.fmt == "ell":
                from sextans_tpu.format.pack_ell import pack_ell

                packed = pack_ell(coo, cand.config)
                plan = SpmmPlan(packed, n, backend="auto")
            else:
                packed = pack(coo, cand.config)
                plan = SpmmPlan(packed, n, backend=backend)
            secs = time_repeat(plan, b, 1.0, 0.5, c0, times=rp_time)
        except Exception as e:  # candidate failed to compile/run — skip it,
            # but never silently (a flaky session would otherwise degrade the
            # chosen config with no trace).
            logger.warning("autotune candidate %s failed: %r", cand.config, e)
            errors.append((cand.config, repr(e)))
            continue
        cand.measured_ms = secs * 1e3
        logger.info("autotune candidate %s: %.3f ms", cand.config, cand.measured_ms)
        if best is None or cand.measured_ms < best.measured_ms:
            best = cand
    if best is None:
        raise RuntimeError(
            f"no autotune candidate ran successfully; failures: {errors}"
        )
    return best


def hybrid_cost(split, n: int = 512) -> float:
    """Modeled cycles for executing a HybridSplit: dense parts (DIA kernel
    traffic + VPU FLOPs, head MXU matmuls) plus the residue's best blocked
    cost. Comparable against choose_backend(...)[0].predicted_cost for the
    engage/skip decision."""
    m, k = split.m, split.k
    D = int(split.diag_offsets.size)
    cost = 0.0
    if D:
        from sextans_tpu.ops.spmm_dia_pallas import cluster_offsets

        nbb = sum(
            (cl[-1] - cl[0]) // 512 + 2
            for cl in cluster_offsets([int(o) for o in split.diag_offsets], 512)
        )
        # B blocks + C in/out traffic, plus VPU FMA work
        cost += (nbb * m * n * 4 + 2 * m * n * 4) / BYTES_PER_CYCLE
        cost += D * m * n * 2 / 2048.0
    H = int(split.head_cols.size)
    if H:
        cost += 2.0 * m * H * n / 10000.0  # MXU f32 ~10k FLOP/cycle
        cost += m * H * 4 / BYTES_PER_CYCLE
    R = int(split.head_rows.size)
    if R:
        cost += 2.0 * R * k * n / 10000.0
        cost += R * k * 4 / BYTES_PER_CYCLE
    if split.residue.nnz:
        cost += choose_backend(split.residue, n=n)[0].predicted_cost
    return cost


class ConfigStore:
    """Persisted per-workload tuned configs — the analog of the reference's
    prebuilt-bitstream library (TAPAB env, README.md:46-48): tune once,
    reuse the winning configuration across sessions.

    Keys are free-form strings (suite rows use ``"{matrix}|n={n}"``). Values
    carry the full :class:`SpmmConfig` plus optional metadata (measured
    GFLOPS, session id) so published benchmark rows stay reproducible.
    """

    def __init__(self, path):
        self.path = Path(path)
        self._data = {}
        if self.path.exists():
            try:
                self._data = json.loads(self.path.read_text())
            except (json.JSONDecodeError, OSError) as e:
                logger.warning("config store %s unreadable: %r", self.path, e)

    def get(self, key: str) -> Optional[SpmmConfig]:
        rec = self._data.get(key)
        if rec is None:
            return None
        kw = dict(rec["config"])
        return SpmmConfig(**kw)

    def meta(self, key: str) -> Optional[dict]:
        rec = self._data.get(key)
        return None if rec is None else rec.get("meta", {})

    def put(self, key: str, config: SpmmConfig, **meta) -> None:
        self._data[key] = {
            "config": dataclasses.asdict(config),
            "meta": meta,
        }
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(self._data, indent=1, sort_keys=True))
