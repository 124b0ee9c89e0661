"""Typed configuration for the SpMM pipeline.

The reference hard-codes its architecture knobs as compile-time constants
(NUM_CH_SPARSE / WINDOW_SIZE / DEP_DIST_LOAD_STORE / URAM_DEPTH,
src/sextans.h:7-15). Here they become a runtime dataclass the autotuner can
sweep (SURVEY.md §5 "Config / flag system").
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

__all__ = ["SpmmConfig", "cdiv", "round_up", "check_kernel_vmem"]

# Scoped-VMEM envelope, measured by bisection on v5e (round 3,
# benchmarks/scratch/vmem_bisect.py): Pallas double-buffers every
# grid-streamed block (B window, C in, C out, vals), so the real working
# set is acc + 2*(B + C + vals), and the compiler's hard cap is the
# kernels' vmem_limit_bytes=100 MiB — the probe config accounted 56 MiB
# single-copy died with "ran out of scoped vmem ... by 4.00M" (104 MiB
# double-buffered), while a 49 MiB double-buffered config runs fine.
# 98 MiB leaves 2 MiB headroom for Mosaic's own scratch. (The round-2
# tile_m=4864 "crash" that motivated the old 22 MiB guard no longer
# reproduces — every config in that class now compiles and runs; it was a
# transient compile-service failure, not a real limit.)
VMEM_BYTES = 98 * 1024 * 1024


def check_kernel_vmem(
    *,
    acc_bytes: int,
    b_window_bytes: int,
    c_bytes: int,
    vals_bytes: int,
    epilogue_bytes: int = 0,
    limit: int = VMEM_BYTES,
) -> None:
    """Reject kernel configs whose VMEM working set cannot fit.

    Models Pallas double-buffering of the streamed blocks (B window, C
    in+out, vals) against the 100 MiB scoped-VMEM cap; oversized configs
    otherwise die inside the TPU compiler with an opaque scoped-vmem OOM —
    the autotuner must see a typed error it can log and skip instead.
    ``acc_bytes`` (kernel scratch) is single-copy; ``c_bytes`` already
    includes the C-in + C-out pair. ``epilogue_bytes`` models the peak of
    full-tile temporaries the epilogue keeps live at once — ~zero for the
    plain ``alpha*acc + beta*cin`` form, but the compensated (precise)
    epilogue's error-free transforms hold ~8 (tile_m, tile_n) vectors
    live (ops/df32.py compensated_epilogue: two two_prod splits, a
    two_sum, and their residuals), which is what crashed the Mosaic
    compiler on 4096x512-tile precise configs (v5e, 2026-08) while the
    fast twin of the same config compiled fine.
    """
    total = acc_bytes + epilogue_bytes + 2 * (
        b_window_bytes + c_bytes + vals_bytes
    )
    if total > limit:
        raise ValueError(
            f"kernel VMEM working set {total / 2**20:.1f} MiB "
            f"(double-buffered) exceeds {limit / 2**20:.1f} MiB "
            f"(acc {acc_bytes / 2**20:.1f} + "
            f"epilogue {epilogue_bytes / 2**20:.1f} + "
            f"2*B window {2 * b_window_bytes / 2**20:.1f} + "
            f"2*C {2 * c_bytes / 2**20:.1f} + "
            f"2*vals {2 * vals_bytes / 2**20:.1f}); "
            "reduce tile_m/tile_n/window_k"
        )


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@dataclass(frozen=True)
class SpmmConfig:
    """Tiling configuration for pack + kernel.

    TPU mapping of the reference's architecture constants:

    * ``tile_m``   — rows per C tile resident in VMEM during accumulation;
      the analog of the 64-PE x URAM accumulator partition (src/sextans.h:15).
    * ``window_k`` — columns of A (= rows of B) per VMEM-resident B panel;
      the analog of WINDOW_SIZE=4096 (src/sextans.h:11).
    * ``block_k``  — BSR block width: A is packed into dense 8 x block_k
      sub-blocks (8 = float32 sublane count). Replaces the reference's
      per-nonzero 64-bit edge encoding (src/sparse_helper.h:406-473) with an
      MXU/VPU-friendly dense micro-tile.
    * ``group_blocks`` — blocks per kernel grid step (the unit of double
      buffering); analog of the FIFO batch granularity.
    * ``tile_n``   — N-panel width (lane-dim tile); the analog of the 8-column
      output slab (src/sextans.cpp:57), widened to the TPU's 128 lanes.
    * ``interleave`` — round-robin blocks across row-stripes inside a tile so
      consecutive FMAs hit different accumulator rows; the spiritual successor
      of the out-of-order RAW scheduler (src/sparse_helper.h:292-342) — here
      it is a pure performance hint, never a correctness requirement.
    """

    tile_m: int = 512
    window_k: int = 2048
    block_k: int = 8
    group_blocks: int = 256
    tile_n: Optional[int] = None  # None → chosen from N at spmm time
    interleave: bool = True
    # Kernel micro-architecture knobs (ops/spmm_pallas.py):
    # n_acc — parallel accumulator buffers; alternating buffers break the
    #   store→load chain between dynamic accumulator slices (the TPU echo of
    #   DEP_DIST_LOAD_STORE, src/sextans.h:12, as a pure throughput hint).
    # chunk_unroll — fori_loop unroll factor for the 16-block chunk loop.
    # Measured on TPU v5e (nasa4704, N=512): n_acc=1 + tile_n=512 is stable
    # at ~470 GFLOPS across runs; n_acc=2 + tile_n=256 peaked at 771 GFLOPS
    # but is bimodal (0.15-0.5 ms) — kept as a bench/autotune candidate.
    n_acc: int = 1
    # chunk_unroll != 1 requests FULL unroll of the chunk loop (Mosaic only
    # supports 1 or all); applied when the group has <= 16 chunks.
    chunk_unroll: int = 2
    # precise — compensated accumulation in the kernels (docs/ACCURACY.md;
    # ops/df32.py):
    #   0/False — fast path (plain f32 accumulate).
    #   1/True  — Neumaier two_sum compensation across visits + the
    #             double-float alpha/beta epilogue: ~1 ulp of the f64
    #             oracle at a modest throughput cost.
    #   2       — full error-free-transformed inner chain (every product
    #             and partial sum compensated): faithful-to-correct
    #             rounding, ~9x the inner-op count — the 1e-6-gate sample
    #             setting, never a headline timing path.
    precise: int = 0
    # edge_chunk — edges per grid step of the edge-stream kernel
    # (format/pack_edge.py + ops/spmm_edge_pallas.py), the structure-
    # independent path: per-edge decode like the reference PEG
    # (src/sextans.cpp:388-419), no block padding at all.
    edge_chunk: int = 2048
    # edge_lanes — independent accumulation registers in the edge kernel;
    # row runs are padded to a multiple of this, buying L-way ILP on the
    # otherwise-serial register FMA chain (measured ~100 cycles/edge at
    # L=1 on v5e: latency-bound). L=1 packs with zero run padding.
    edge_lanes: int = 1
    # ell_r — slots per row of the ELL gather format (format/pack_ell.py +
    # ops/spmm_ell_xla.py); None → cost-based choice from the degree
    # histogram at pack time (choose_slots_per_row).
    ell_r: Optional[int] = None
    # edge_masked — select away pad-slot contributions in the edge kernel
    # (one vselect per edge) so non-finite B values cannot leak NaN through
    # 0*Inf at padding; off by default (finite-B precondition documented in
    # format/pack_edge.py).
    edge_masked: bool = False

    def __post_init__(self):
        if self.tile_m % 8 != 0 or self.tile_m <= 0:
            raise ValueError("tile_m must be a positive multiple of 8")
        if self.block_k not in (1, 2, 4, 8, 16, 32, 64, 128):
            raise ValueError("block_k must be a power of two <= 128")
        if self.window_k % self.block_k != 0:
            raise ValueError("window_k must be a multiple of block_k")
        if self.window_k % 8 != 0:
            raise ValueError("window_k must be a multiple of 8")
        if self.group_blocks <= 0:
            raise ValueError("group_blocks must be positive")
        if self.tile_n is not None and self.tile_n % 128 != 0:
            raise ValueError("tile_n must be a multiple of 128 (TPU lane count)")
        if self.n_acc < 1 or self.chunk_unroll < 1:
            raise ValueError("n_acc and chunk_unroll must be >= 1")
        if int(self.precise) not in (0, 1, 2):
            raise ValueError("precise must be 0/False, 1/True, or 2")
        if self.edge_chunk <= 0 or self.edge_chunk % 8 != 0:
            raise ValueError("edge_chunk must be a positive multiple of 8")
        if self.edge_lanes not in (1, 2, 4, 8):
            raise ValueError("edge_lanes must be 1, 2, 4, or 8")
        if self.edge_chunk % self.edge_lanes != 0:
            raise ValueError("edge_chunk must be a multiple of edge_lanes")
        if self.ell_r is not None and self.ell_r < 1:
            raise ValueError("ell_r must be >= 1")

    def validate_vpu(self) -> None:
        """Extra constraints of the VPU block format (format/pack.py +
        ops/spmm_pallas.py): group vals are consumed in (8, 128)-register
        chunks of 128//block_k blocks each."""
        chunk = max(1, 128 // self.block_k)
        if self.group_blocks % chunk != 0:
            raise ValueError(
                f"group_blocks must be a multiple of {chunk} (=128/block_k) "
                "for the VPU block format"
            )

    @property
    def stripes_per_tile(self) -> int:
        return self.tile_m // 8

    def with_(self, **kw) -> "SpmmConfig":
        return replace(self, **kw)

    def resolve_tile_n(self, n: int) -> int:
        if self.tile_n is not None:
            return self.tile_n
        return min(round_up(n, 128), 512)
