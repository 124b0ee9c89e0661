"""Shape-generic serving: one compiled kernel serves a family of matrices.

The reference serves *arbitrary* A/B/C sizes at runtime with one compiled
bitstream — NUM_ITE/M/P_N/K are kernel ARGUMENTS (src/sextans.h:20-26;
README.md:4 "no need to re-compile... for different input matrices").
Under XLA every shape is a fresh compilation, so a naive port pays 20-40 s
of compile per new matrix. This module restores the reference's property
the XLA way: **shape bucketing**.

All kernel entry points (ops/spmm_pallas.py etc.) are module-level
``jax.jit`` functions whose cache keys are (operand shapes, static
knobs). A pack padded to canonical *bucket* dimensions — group count,
M-tile count, K-window count rounded up a geometric series — therefore
hits the SAME compiled executable as every other matrix in its bucket.
B and C are padded on the host (a memcpy, no compile), and the padded
output is sliced on the host after fetch. The group padding extends the
last real group's m-tile run with zero-valued blocks (the same
SPMD-uniformity machinery as multi-chip stacking,
parallel/partition._pad_shard_groups), so the kernels' first/last-group
epilogue logic is untouched and padded work contributes exact zeros.

Measured on TPU v5e (benchmarks/scratch/serve_probe.py): the first matrix
of a bucket pays the one-time compile; the second, previously-unseen
matrix in the same bucket serves with ZERO recompile (sub-ms plan build,
first call at steady-state kernel latency).

Bucket overhead: padded groups are real (zero-valued) kernel work — the
geometric growth factor bounds it at <= ``growth - 1`` (default 25%) of
the A-stream; padded M-tiles/K-windows add only zero C/B traffic.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from sextans_tpu.format.pack import PackedSpMatrix, pack
from sextans_tpu.format.pack_edge import PackedSpMatrixEdge, pack_edge
from sextans_tpu.format.pack_ell import PackedSpMatrixELL, pack_ell
from sextans_tpu.format.pack_mxu import PackedSpMatrixMXU, pack_mxu
from sextans_tpu.utils.config import SpmmConfig, cdiv, round_up

__all__ = ["SpmmServer", "ServePlan", "bucketize_pack", "bucket_up"]


def bucket_up(x: int, growth: float = 1.25) -> int:
    """Smallest member >= x of the geometric bucket series 1, 2, 3, 4, 5,
    7, 9, ... (each step the previous rounded up by ``growth``)."""
    b = 1
    while b < x:
        b = max(b + 1, int(np.ceil(b * growth)))
    return b


def _bucketize_ell(packed: PackedSpMatrixELL, growth: float):
    """Pad an ELL pack so every shape the engine jit keys on sits on the
    bucket series: slots R, the real-row region (m_base), the virtual-row
    count, total padded rows, and the gather space K. All padding
    contributes exact zeros: pad slots compute 0 * B[0, :], pad rows are
    all-zero slots, and pad virtual rows fold 0.0 into the last real fold
    target (repeating it keeps ``fold_rows`` ascending — the engine's
    scatter-add declares ``indices_are_sorted``)."""
    cfg = packed.config
    m_block = cfg.tile_m
    r = packed.slots_per_row
    n_virt = packed.n_virt
    r_b = bucket_up(r, growth)
    m_base_b = round_up(bucket_up(packed.m_base, growth), 8)
    n_virt_b = bucket_up(n_virt, growth) if n_virt else 0
    blocks_b = bucket_up(cdiv(m_base_b + n_virt_b, m_block), growth)
    m_padded_b = blocks_b * m_block
    cols = np.zeros((m_padded_b, r_b), np.int32)
    vals = np.zeros((m_padded_b, r_b), np.float32)
    cols[: packed.m_base, :r] = packed.cols[: packed.m_base]
    vals[: packed.m_base, :r] = packed.vals[: packed.m_base]
    fold = np.zeros(n_virt_b, np.int32)
    if n_virt:
        cols[m_base_b : m_base_b + n_virt, :r] = packed.cols[
            packed.m_base : packed.m_base + n_virt
        ]
        vals[m_base_b : m_base_b + n_virt, :r] = packed.vals[
            packed.m_base : packed.m_base + n_virt
        ]
        fold[:n_virt] = packed.fold_rows
        fold[n_virt:] = packed.fold_rows[-1]
    out = dataclasses.replace(
        packed, cols=cols, vals=vals, fold_rows=fold,
        slots_per_row=r_b, m_base=m_base_b,
    )
    # K only enters the kernel through B's gather-space extent; serve pads
    # B rows to this bucket (gathered indices stay < k, so pad rows are
    # never read with nonzero weight)
    out.__dict__["k_bucket"] = bucket_up(packed.k, growth)
    return out


def bucketize_pack(packed, growth: float = 1.25):
    """Pad a packed matrix to canonical bucket dimensions.

    Returns a pack whose (ngroups, n_mtiles, n_kwins) are bucket values —
    the full shape signature the kernel jit keys on — with zero-valued
    padding groups extending the last real group's m-tile run. ELL packs
    bucket on (R, m_base, n_virt, row blocks, K) instead — see
    :func:`_bucketize_ell`.
    """
    from sextans_tpu.parallel.partition import _pad_shard_groups

    if isinstance(packed, PackedSpMatrixELL):
        return _bucketize_ell(packed, growth)
    if isinstance(packed, PackedSpMatrixEdge):
        n_units = packed.n_chunks
    else:
        n_units = packed.n_groups
    target_units = bucket_up(n_units, growth)
    target_mtiles = bucket_up(packed.n_mtiles, growth)
    target_kwins = bucket_up(packed.n_kwins, growth)
    out = _pad_shard_groups(packed, target_units)
    if (
        target_mtiles != packed.n_mtiles
        or target_kwins != packed.n_kwins
        or out is packed
    ):
        out = dataclasses.replace(
            out, n_mtiles=target_mtiles, n_kwins=target_kwins
        )
    return out


class ServePlan:
    """Executor for one served matrix; shares compiled kernels bucket-wide.

    Unlike :class:`~sextans_tpu.ops.plan.SpmmPlan` (which jit-compiles a
    per-instance pad→kernel→slice wrapper), a ServePlan pads B/C on the
    HOST and invokes the module-level kernel jit directly, so its device
    program is exactly the bucket's shared executable.
    """

    def __init__(self, packed, n: int, backend: str, tile_n: int):
        import jax.numpy as jnp

        # ServePlan feeds B/C to the kernel untouched (the bucket's shared
        # executable has no per-matrix gather). A degree-reordered pack
        # (pack(..., reorder_cols=True)) needs B[col_perm] / C[row_perm]
        # plumbing that only SpmmPlan implements — reject it loudly instead
        # of serving silently wrong values.
        for perm in ("col_perm", "row_perm"):
            if getattr(packed, perm, None) is not None:
                raise ValueError(
                    f"ServePlan does not support reordered packs "
                    f"(packed.{perm} is set); pack without reorder_cols/"
                    f"reorder_rows for serving, or use SpmmPlan"
                )
        self.packed = packed
        self.backend = backend
        self.m, self.k = packed.shape
        self.n = n
        self.tile_n = tile_n
        self.n_padded = round_up(n, tile_n)
        self.m_padded = packed.m_padded
        # ELL buckets K too (k_bucket stamped by _bucketize_ell): B pads to
        # the bucketed gather space so the engine jit never sees a raw K
        self.k_padded = getattr(packed, "k_bucket", packed.k_padded)
        is_edge = isinstance(packed, PackedSpMatrixEdge)
        is_ell = isinstance(packed, PackedSpMatrixELL)
        dev_cache = packed.__dict__.setdefault("_dev_cache", {})
        import jax

        dev_key = ("dev", jax.devices()[0].id, jax.devices()[0].platform)
        if dev_key in dev_cache:
            self._dev = dev_cache[dev_key]
        elif is_ell:
            self._dev = (
                jnp.asarray(packed.vals),
                jnp.asarray(packed.cols),
                jnp.asarray(packed.fold_rows),
            )
            dev_cache[dev_key] = self._dev
        else:
            self._dev = (
                jnp.asarray(packed.vals),
                jnp.asarray(
                    packed.meta
                    if is_edge
                    else (
                        packed.qm
                        if isinstance(packed, PackedSpMatrixMXU)
                        else packed.qrow
                    )
                ),
                jnp.asarray(
                    jnp.zeros((1,), jnp.int32) if is_edge else packed.bcol
                ),
                jnp.asarray(packed.group_mtile),
                jnp.asarray(packed.group_kwin),
            )
            dev_cache[dev_key] = self._dev

    def _pad_host(self, b, c):
        bp = np.zeros((self.k_padded, self.n_padded), np.float32)
        bp[: self.k, : self.n] = b
        cp = np.zeros((self.m_padded, self.n_padded), np.float32)
        if c is not None:
            cp[: self.m, : self.n] = c
        return bp, cp

    def call_padded(self, b_padded, c_padded, alpha, beta):
        """Raw bucket-shaped call: (k_padded, n_padded) B and
        (m_padded, n_padded) C in, padded output device array out."""
        import jax.numpy as jnp

        cfg = self.packed.config
        a32, b32 = jnp.float32(alpha), jnp.float32(beta)
        if self.backend == "ell":
            from sextans_tpu.ops.spmm_ell_xla import spmm_ell_padded

            return spmm_ell_padded(
                *self._dev, b_padded, c_padded, a32, b32,
                m_block=cfg.tile_m, m_base=self.packed.m_base,
                with_c=True, precise=bool(cfg.precise),
            )
        if self.backend == "mxu":
            from sextans_tpu.ops.spmm_mxu_pallas import spmm_mxu_padded

            return spmm_mxu_padded(
                *self._dev, b_padded, c_padded, a32, b32,
                tile_m=cfg.tile_m, window_k=cfg.window_k,
                block_k=cfg.block_k, group_blocks=cfg.group_blocks,
                tile_n=self.tile_n, unroll=cfg.chunk_unroll,
                precise=cfg.precise,
            )
        if self.backend == "edge":
            from sextans_tpu.ops.spmm_edge_pallas import spmm_edge_padded

            vals, meta, _, gmt, gkw = self._dev
            return spmm_edge_padded(
                vals, meta, gmt, gkw, b_padded, c_padded, a32, b32,
                tile_m=cfg.tile_m, window_k=cfg.window_k,
                edge_chunk=cfg.edge_chunk, edge_lanes=cfg.edge_lanes,
                tile_n=self.tile_n, masked=cfg.edge_masked,
                precise=cfg.precise,
            )
        if self.backend == "xla":
            from sextans_tpu.ops.spmm_xla import spmm_xla_padded

            return spmm_xla_padded(
                *self._dev, b_padded, c_padded, a32, b32,
                tile_m=cfg.tile_m, window_k=cfg.window_k,
                block_k=cfg.block_k, group_blocks=cfg.group_blocks,
            )
        from sextans_tpu.ops.spmm_pallas import spmm_pallas_padded

        return spmm_pallas_padded(
            *self._dev, b_padded, c_padded, a32, b32,
            tile_m=cfg.tile_m, window_k=cfg.window_k,
            block_k=cfg.block_k, group_blocks=cfg.group_blocks,
            tile_n=self.tile_n,
            interpret=(self.backend == "pallas_interpret"),
            n_acc=cfg.n_acc, chunk_unroll=cfg.chunk_unroll,
            precise=cfg.precise,
        )

    def __call__(self, b, alpha=1.0, beta=0.0, c=None) -> np.ndarray:
        b = np.asarray(b, dtype=np.float32)
        if b.shape != (self.k, self.n):
            raise ValueError(f"B must be ({self.k}, {self.n}), got {b.shape}")
        if c is None and float(beta) != 0.0:
            raise ValueError("beta != 0 requires an input C")
        if c is not None:
            c = np.asarray(c, dtype=np.float32)
            if c.shape != (self.m, self.n):
                raise ValueError(
                    f"C must be ({self.m}, {self.n}), got {c.shape}"
                )
        bp, cp = self._pad_host(b, c)
        out = self.call_padded(bp, cp, alpha, beta)
        return np.asarray(out)[: self.m, : self.n]


class SpmmServer:
    """Bucketed multi-matrix SpMM service — the "one bitstream" analog.

    Fixes (N, tiling config, engine) once, like the reference fixes its
    architecture at synthesis; then ``plan(coo)`` serves ANY matrix:
    matrices landing in an already-compiled bucket run with zero
    recompile. See module docstring for the mechanism.
    """

    def __init__(
        self,
        n: int,
        *,
        config: SpmmConfig = SpmmConfig(),
        fmt: str = "vpu",
        backend: str = "auto",
        growth: float = 1.25,
        pack_cache=None,
    ):
        if fmt not in ("vpu", "mxu", "edge", "ell"):
            raise ValueError(
                f"SpmmServer supports vpu/mxu/edge/ell formats, got {fmt!r}"
            )
        if backend == "auto":
            import jax

            on_tpu = jax.devices()[0].platform == "tpu"
            backend = {
                "mxu": "mxu" if on_tpu else "mxu_interpret",
                "edge": "edge" if on_tpu else "edge_interpret",
                # the ELL HBM-gather engine is stock XLA: servable on both
                # TPU and CPU (the Pallas chunk-gather twin is not — its
                # scalar-prefetch chunk tables are per-matrix shaped)
                "ell": "ell",
            }.get(fmt, "pallas" if on_tpu else "xla")
        if backend in ("mxu_interpret", "edge_interpret",
                       "ell_pallas", "ell_pallas_interpret"):
            raise ValueError(
                f"backend {backend!r} not servable (interpret re-traces per "
                "shape; ell_pallas's scalar-prefetch chunk tables are "
                "per-matrix shaped — serve fmt='ell' uses the XLA gather "
                "engine)"
            )
        self.n = n
        self.config = config
        self.fmt = fmt
        self.backend = backend
        self.growth = growth
        self.pack_cache = pack_cache
        self.tile_n = config.resolve_tile_n(n)
        self._buckets: set = set()

    def bucket_signature(self, packed) -> tuple:
        """The full jit-cache key surrogate for a bucketized pack."""
        if isinstance(packed, PackedSpMatrixELL):
            return (
                packed.m_padded,
                packed.slots_per_row,
                packed.n_virt,
                packed.m_base,
                getattr(packed, "k_bucket", packed.k),
                self.tile_n,
                self.backend,
            )
        return (
            packed.n_groups
            if not isinstance(packed, PackedSpMatrixEdge)
            else packed.n_chunks,
            packed.n_mtiles,
            packed.n_kwins,
            self.tile_n,
            self.backend,
        )

    def plan(self, coo, name: Optional[str] = None) -> ServePlan:
        """Pack (cached if a pack_cache/name is given), bucket-pad, and
        return the ServePlan. ``plan.bucket_new`` says whether this bucket
        was seen before by THIS server (a warm bucket implies a warm jit
        cache process-wide)."""
        if self.pack_cache is not None and name is not None:
            packed = self.pack_cache.get_or_pack(
                name, coo, self.config, self.fmt, False
            )
        elif self.fmt == "mxu":
            packed = pack_mxu(coo, self.config)
        elif self.fmt == "edge":
            packed = pack_edge(coo, self.config)
        elif self.fmt == "ell":
            packed = pack_ell(coo, self.config)
        else:
            packed = pack(coo, self.config)
        bucketed = bucketize_pack(packed, self.growth)
        sig = self.bucket_signature(bucketed)
        p = ServePlan(bucketed, self.n, self.backend, self.tile_n)
        p.bucket_new = sig not in self._buckets
        self._buckets.add(sig)
        return p
