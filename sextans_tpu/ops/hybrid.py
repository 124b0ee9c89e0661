"""Hybrid structure-split SpMM: diagonals + dense head columns + residue.

The reference FPGA is *structure-independent*: its PEs decode an arbitrary
per-edge column every cycle (src/sextans.cpp:388-419), so webgraph-class and
stencil-class matrices run at the same 64 nnz/cycle as FEM matrices. Block
formats lose that property — a power-law or pure-diagonal pattern shatters
into nearly-empty blocks. The TPU-native answer is not a gather PE but a
*representation split*: decompose A by structure and give each part the
execution engine it maps onto:

* **Diagonals** (stencil / KKT / banded class): a diagonal ``c`` stores
  ``A[i, i+c]`` as a dense vector; its SpMM contribution is
  ``diag[:, None] * B[i+c, :]`` — a shifted elementwise FMA over (M, N)
  that XLA fuses across diagonals into full-width VPU work with zero
  padding or steering. (DIA format, reborn as fused XLA.)
* **Dense head columns** (power-law class): the hub columns — for the
  webgraph generator the top 128 columns carry ~70% of nnz — are lifted
  into a dense (M, H) matrix; their contribution is one MXU matmul
  ``head @ B[head_cols]`` at full systolic-array rate.
* **Residue**: whatever structure remains goes through the blocked Pallas
  kernels (VPU 8xBK blocks or MXU dense slabs), picked by the analytic
  autotuner.

``C = beta*C + alpha*(diag_part + head_part) `` feeds the residue kernel as
its C input with beta=1, so the whole composition is ONE jitted program and
two kernel launches at most.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

from sextans_tpu.format.coo import COOMatrix
from sextans_tpu.utils.config import SpmmConfig

__all__ = ["HybridSplit", "split_structure", "HybridSpmmPlan",
           "SPLIT_VERSION"]

# Bump when split_structure's selection logic changes: cached splits
# (PackCache.get_or_split) key on this, so stale decompositions can never
# be served after an algorithm change.
SPLIT_VERSION = 3


@dataclass
class HybridSplit:
    """Structure decomposition of a sparse matrix (host-side)."""

    m: int
    k: int
    nnz: int
    # diagonals: offsets c (col - row); vals[d, i] = A[i, i + offsets[d]]
    diag_offsets: np.ndarray  # (D,) int64
    diag_vals: np.ndarray  # (D, m) float32
    # dense head columns (original column ids) and their dense values
    head_cols: np.ndarray  # (H,) int32
    head_dense: np.ndarray  # (m, H) float32
    # dense head rows (hub rows, e.g. circuit power nets): full dense rows
    head_rows: np.ndarray  # (R,) int32
    head_rows_dense: np.ndarray  # (R, k) float32
    residue: COOMatrix

    @property
    def diag_nnz(self) -> int:
        return int(np.count_nonzero(self.diag_vals))

    @property
    def head_nnz(self) -> int:
        return int(np.count_nonzero(self.head_dense))

    @property
    def head_row_nnz(self) -> int:
        return int(np.count_nonzero(self.head_rows_dense))

    def summary(self) -> str:
        return (
            f"HybridSplit(m={self.m}, k={self.k}, nnz={self.nnz}: "
            f"{self.diag_offsets.size} diagonals ({self.diag_nnz}), "
            f"{self.head_cols.size} head cols ({self.head_nnz}), "
            f"{self.head_rows.size} head rows ({self.head_row_nnz}), "
            f"residue {self.residue.nnz})"
        )

    # -- persistence: split_structure costs minutes of host scatter work on
    #    10M+-edge matrices and is re-run per (matrix, N) benchmark row, so
    #    it joins the pack cache (format/pack_cache.py) as a cacheable
    #    preprocessing artifact. The dense planes compress well (they are
    #    mostly zeros: only head/diag entries are populated). --
    def save(self, path) -> None:
        np.savez_compressed(
            Path(path),
            dims=np.array([self.m, self.k, self.nnz], dtype=np.int64),
            diag_offsets=self.diag_offsets,
            diag_vals=self.diag_vals,
            head_cols=self.head_cols,
            head_dense=self.head_dense,
            head_rows=self.head_rows,
            head_rows_dense=self.head_rows_dense,
            residue_rows=self.residue.rows,
            residue_cols=self.residue.cols,
            residue_vals=self.residue.vals,
        )

    @staticmethod
    def load(path) -> "HybridSplit":
        z = np.load(Path(path))
        m, k, nnz = (int(x) for x in z["dims"])
        return HybridSplit(
            m=m,
            k=k,
            nnz=nnz,
            diag_offsets=z["diag_offsets"],
            diag_vals=z["diag_vals"],
            head_cols=z["head_cols"],
            head_dense=z["head_dense"],
            head_rows=z["head_rows"],
            head_rows_dense=z["head_rows_dense"],
            residue=COOMatrix(
                (m, k), z["residue_rows"], z["residue_cols"],
                z["residue_vals"],
            ),
        )


def _residue_edge_cycles(n: int) -> float:
    """Best-case modeled cycles to process ONE residue nonzero across the
    full N width (edge-kernel model, utils/autotune.py constants)."""
    from sextans_tpu.utils.autotune import (
        EDGE_CYCLES_FIXED,
        EDGE_CYCLES_PER_128LANES,
    )

    best = float("inf")
    for tn in (128, 256, 512):
        panels = max(1, -(-n // tn))
        best = min(
            best,
            EDGE_CYCLES_FIXED * panels + EDGE_CYCLES_PER_128LANES * n / 128,
        )
    return best


def _cost_based_degree(m_other: int, n: int, length: int) -> int:
    """Marginal break-even degree for lifting one column (or row) into the
    dense head: lift when ``deg * residue_edge_cycles`` exceeds the dense
    strip's cost (MXU flops at ~10k FLOP/cycle + its HBM read)."""
    from sextans_tpu.utils.autotune import BYTES_PER_CYCLE

    dense_cycles = 2.0 * length * n / 10000.0 + length * 4 / BYTES_PER_CYCLE
    return max(4, int(dense_cycles / max(_residue_edge_cycles(n), 1e-9)))


def _cost_based_diag(m: int, n: int) -> int:
    """Marginal break-even count for lifting one DIAGONAL: the tiled DIA
    kernel adds ~``2*M*n/2048`` VPU FMA cycles + an ``M*4``-byte dvals read
    per diagonal (clustered offsets share the B window, so the window
    traffic is not marginal). Circuit/stencil bands of many ~3%-dense
    diagonals clear this easily where the old fixed 15% rule rejected
    them (round-3: scircuit-class)."""
    from sextans_tpu.utils.autotune import BYTES_PER_CYCLE

    dia_cycles = 2.0 * m * n / 2048.0 + m * 4 / BYTES_PER_CYCLE
    return max(4, int(dia_cycles / max(_residue_edge_cycles(n), 1e-9)))


def split_structure(
    coo: COOMatrix,
    *,
    n: Optional[int] = None,
    diag_min_density: float = 0.15,
    max_diags: int = 48,
    head_min_degree_frac: float = 0.004,
    max_head_cols: int = 2048,
    min_head_cols: int = 32,
    row_min_degree_frac: float = 0.004,
    max_head_rows: int = 256,
    min_head_rows: int = 8,
) -> HybridSplit:
    """Decompose ``coo`` into diagonals + dense head columns + residue.

    Selection heuristics (cost-motivated):

    * a diagonal is lifted when it holds >= ``diag_min_density * m``
      nonzeros — below that, the (M, N) elementwise pass costs more memory
      traffic than the nonzeros justify;
    * a column is lifted into the head when it pays: with ``n`` given, the
      threshold is the *marginal break-even degree* — the dense MXU strip
      costs ``2*M*n/10k + M*4/BW`` cycles vs ~``deg * edge-kernel
      per-edge`` cycles in the residue (round-3 widening: on webgraph-class
      at N=512 this lifts columns down to degree ~125 where the old fixed
      0.4%% rule stopped at 400). Without ``n``, the fixed
      ``head_min_degree_frac * m`` rule applies. Either way the head is
      capped at ``max_head_cols`` densest columns (M x H x 4 bytes);
    * everything else is the residue, in ORIGINAL coordinates (no global
      permutation: B is only gathered for the head's H rows).
    """
    m, k = coo.shape
    rows = coo.rows.astype(np.int64)
    cols = coo.cols.astype(np.int64)
    vals = coo.vals
    n_edges = rows.size

    taken = np.zeros(n_edges, dtype=bool)

    # --- diagonals ---
    d = cols - rows  # in [-(m-1), k-1]
    dmin = int(d.min(initial=0))
    counts = np.bincount((d - dmin).astype(np.int64))
    if n is not None:
        thresh = _cost_based_diag(m, n)
        # dvals is (D, m) dense: cap its footprint at ~1.5 GB
        max_diags = min(max(max_diags, 256),
                        max(8, int(1.5e9 / max(4 * m, 1))))
    else:
        thresh = max(1, int(diag_min_density * min(m, k)))
    cand = np.flatnonzero(counts >= thresh)
    order = np.argsort(-counts[cand], kind="stable")
    cand = cand[order[:max_diags]]
    diag_offsets = np.sort(cand + dmin)
    if diag_offsets.size:
        on_diag = np.isin(d, diag_offsets)
        taken |= on_diag
        diag_vals = np.zeros((diag_offsets.size, m), dtype=np.float32)
        off_index = {int(c): i for i, c in enumerate(diag_offsets)}
        dsel = np.flatnonzero(on_diag)
        didx = np.fromiter(
            (off_index[int(x)] for x in d[dsel]), count=dsel.size, dtype=np.int64
        )
        np.add.at(diag_vals, (didx, rows[dsel]), vals[dsel])
    else:
        diag_vals = np.zeros((0, m), dtype=np.float32)

    # --- dense head columns (degree computed on what's left) ---
    rem = ~taken
    deg = np.bincount(cols[rem], minlength=k)
    # absolute floor: a column below ~4 nnz never beats the residue
    if n is not None:
        deg_thresh = _cost_based_degree(k, n, length=m)
    else:
        deg_thresh = max(4, int(head_min_degree_frac * m))
    head_cols = np.flatnonzero(deg >= deg_thresh)
    # memory cap: the dense head costs M x H x 4 bytes on host AND device —
    # bound it at ~1.5 GB so 1M-row matrices cannot blow up under the
    # cost-widened threshold
    max_head_eff = min(max_head_cols, max(min_head_cols,
                                          int(1.5e9 / max(4 * m, 1))))
    if head_cols.size > max_head_eff:
        top = np.argsort(-deg[head_cols], kind="stable")[:max_head_eff]
        head_cols = np.sort(head_cols[top])
    if head_cols.size < min_head_cols:
        head_cols = np.zeros(0, dtype=np.int64)
    if head_cols.size:
        in_head = np.zeros(k, dtype=bool)
        in_head[head_cols] = True
        on_head = rem & in_head[cols]
        taken |= on_head
        col_rank = np.zeros(k, dtype=np.int64)
        col_rank[head_cols] = np.arange(head_cols.size)
        head_dense = np.zeros((m, head_cols.size), dtype=np.float32)
        hsel = np.flatnonzero(on_head)
        np.add.at(head_dense, (rows[hsel], col_rank[cols[hsel]]), vals[hsel])
    else:
        head_dense = np.zeros((m, 0), dtype=np.float32)

    # --- dense head rows (hub rows — circuit nets, supernode rows) ---
    rem = ~taken
    rdeg = np.bincount(rows[rem], minlength=m)
    if n is not None:
        rdeg_thresh = _cost_based_degree(m, n, length=k)
    else:
        rdeg_thresh = max(4, int(row_min_degree_frac * k))
    head_rows = np.flatnonzero(rdeg >= rdeg_thresh)
    if head_rows.size > max_head_rows:
        top = np.argsort(-rdeg[head_rows], kind="stable")[:max_head_rows]
        head_rows = np.sort(head_rows[top])
    if head_rows.size < min_head_rows:
        head_rows = np.zeros(0, dtype=np.int64)
    if head_rows.size:
        in_hrow = np.zeros(m, dtype=bool)
        in_hrow[head_rows] = True
        on_hrow = rem & in_hrow[rows]
        taken |= on_hrow
        row_rank = np.zeros(m, dtype=np.int64)
        row_rank[head_rows] = np.arange(head_rows.size)
        head_rows_dense = np.zeros((head_rows.size, k), dtype=np.float32)
        rsel_ = np.flatnonzero(on_hrow)
        np.add.at(head_rows_dense, (row_rank[rows[rsel_]], cols[rsel_]), vals[rsel_])
    else:
        head_rows_dense = np.zeros((0, k), dtype=np.float32)

    # --- residue ---
    rsel = np.flatnonzero(~taken)
    residue = COOMatrix(
        (m, k),
        coo.rows[rsel],
        coo.cols[rsel],
        coo.vals[rsel],
    )
    return HybridSplit(
        m=m,
        k=k,
        nnz=coo.nnz,
        diag_offsets=diag_offsets.astype(np.int64),
        diag_vals=diag_vals,
        head_cols=head_cols.astype(np.int32),
        head_dense=head_dense,
        head_rows=head_rows.astype(np.int32),
        head_rows_dense=head_rows_dense,
        residue=residue,
    )


class HybridSpmmPlan:
    """Compiled executor for a HybridSplit: one jitted program computing

        C' = residue_kernel(B, C_in = beta*C + alpha*(diag + head parts))

    with the residue kernel invoked at beta=1. Exposes the same
    ``__call__``/``repeat`` surface as SpmmPlan.
    """

    def __init__(
        self,
        split: HybridSplit,
        n: int,
        *,
        residue_config: Optional[SpmmConfig] = None,
        residue_fmt: Optional[str] = None,
        backend: str = "auto",
        dia_backend: str = "auto",
        pack_cache=None,
        cache_name: Optional[str] = None,
        precise: int = 0,
    ):
        """``pack_cache``/``cache_name``: optional ``PackCache`` routing for
        the residue pack (cache_name must be unique per split — e.g.
        ``f"{matrix}@n{n}-residue"`` — the cache's content fingerprint
        protects non-trust_name callers either way).

        ``precise``: 0 = fast path. 1/2 = the 1e-6-gate sample composition
        (docs/ACCURACY.md): the residue kernel runs at the same precise
        level with alpha=1/beta=0, the DIA kernel runs compensated, and the
        parts combine through error-free transforms (ops/df32.py) with one
        final rounding per element — instead of the fast path's chained
        ``C_in = beta*C + alpha*(dense parts)`` feed into the residue,
        which rounds at full magnitude once per stage."""
        import jax
        import jax.numpy as jnp

        from sextans_tpu.format.pack import pack
        from sextans_tpu.format.pack_mxu import pack_mxu
        from sextans_tpu.ops.plan import SpmmPlan

        self.split = split
        self.m, self.k = split.m, split.k
        self.n = n
        self.precise = int(precise)

        if residue_config is None or residue_fmt is None:
            from sextans_tpu.utils.autotune import choose_backend

            if split.residue.nnz > 0:
                best = choose_backend(split.residue, n=n)[0]
                residue_config = residue_config or best.config
                residue_fmt = residue_fmt or best.fmt
            else:
                residue_config = residue_config or SpmmConfig()
                residue_fmt = residue_fmt or "vpu"
        self.residue_fmt = residue_fmt
        self.residue_config = residue_config

        if pack_cache is not None and cache_name is not None:
            packed = pack_cache.get_or_pack(
                cache_name, split.residue, residue_config, residue_fmt
            )
        elif residue_fmt == "mxu":
            packed = pack_mxu(split.residue, residue_config)
        elif residue_fmt == "edge":
            from sextans_tpu.format.pack_edge import pack_edge

            packed = pack_edge(split.residue, residue_config)
        elif residue_fmt == "ell":
            from sextans_tpu.format.pack_ell import pack_ell

            packed = pack_ell(split.residue, residue_config)
        else:
            packed = pack(split.residue, residue_config)
        if self.precise and not packed.config.precise:
            # precise is kernel-only: swap the config on the (possibly
            # cached) pack and share its device-upload memo — the packed
            # arrays are identical (same trick as the suite's precise
            # attempt, benchmarks/suite.py)
            import dataclasses

            repacked = dataclasses.replace(
                packed, config=packed.config.with_(precise=self.precise)
            )
            repacked.__dict__["_dev_cache"] = packed.__dict__.setdefault(
                "_dev_cache", {}
            )
            packed = repacked
        self._residue_plan = SpmmPlan(packed, n, backend=backend)

        # device-resident dense components
        self._dev = {}
        self.has_diag = split.diag_offsets.size > 0
        self.has_head = split.head_cols.size > 0
        self.has_hrows = split.head_rows.size > 0
        if self.has_diag:
            self._dev["dvals"] = jnp.asarray(split.diag_vals)
        if self.has_head:
            self._dev["head"] = jnp.asarray(split.head_dense)
            self._dev["head_cols"] = jnp.asarray(split.head_cols)
        if self.has_hrows:
            self._dev["hrows"] = jnp.asarray(split.head_rows_dense)
            self._dev["hrows_idx"] = jnp.asarray(split.head_rows)

        offsets = [int(c) for c in split.diag_offsets]
        m, k = self.m, self.k
        pad_lo = max(0, -(min(offsets) if offsets else 0))
        pad_hi = max(0, (max(offsets) if offsets else 0) + m - k)

        # Diagonal engine: the Pallas DIA kernel on TPU (XLA formulations
        # materialize (M, N) temporaries per diagonal — 80-300 ms measured
        # for 7 diagonals on laplace3d_64); a lax.map-tiled XLA fallback
        # elsewhere.
        if dia_backend == "auto":
            dia_backend = (
                "pallas" if jax.devices()[0].platform == "tpu" else "xla"
            )
        self.dia_backend = dia_backend
        from sextans_tpu.utils.config import round_up as _round_up

        dia_tile_m = 512
        dia_tile_n = min(512, _round_up(max(n, 1), 128))
        # Skinny-N: the C-transposed DIA kernel runs M on the 128-lane axis
        # so the VPU is full-width at any N (the standard layout pads N to
        # 128 lanes — an 8x FLOP waste at N=16; measured 5.8 ms on
        # scircuit-class where the memory bound is ~0.7 ms).
        use_dia_ct = n <= 32
        n_ct_dia = _round_up(max(n, 1), 8)
        if self.has_diag and dia_backend in ("pallas", "pallas_interpret"):
            from sextans_tpu.ops.spmm_dia_pallas import cluster_offsets

            # bound the B blocks per grid step (VMEM): shrink tile_n first
            nb_blocks = sum(
                (cl[-1] - cl[0]) // dia_tile_m + 2
                for cl in cluster_offsets(offsets, dia_tile_m)
            )
            while (
                dia_tile_n > 128
                and (nb_blocks + 3) * dia_tile_m * dia_tile_n * 4 > 12 * 2**20
            ):
                dia_tile_n //= 2
            m_pad_dia = _round_up(m, dia_tile_m)
            if use_dia_ct:
                dvc = np.zeros((len(offsets), m_pad_dia), dtype=np.float32)
                dvc[:, :m] = split.diag_vals
                self._dev["dvt"] = jnp.asarray(dvc)
            else:
                dvt = np.zeros((m_pad_dia, len(offsets)), dtype=np.float32)
                dvt[:m] = split.diag_vals.T
                self._dev["dvt"] = jnp.asarray(dvt)
        self._dia_shapes = (dia_tile_m, dia_tile_n)
        has_diag, has_head = self.has_diag, self.has_head
        has_hrows = self.has_hrows
        has_residue = split.residue.nnz > 0
        use_dia_kernel = has_diag and dia_backend in (
            "pallas",
            "pallas_interpret",
        )
        dia_interp = dia_backend == "pallas_interpret"
        m_pad_dia = _round_up(m, dia_tile_m)
        res_jit = self._residue_plan._jit  # jitted fn: inlines when traced
        res_dev = self._residue_plan._dev
        dense_dev = tuple(
            self._dev[key]
            for key in (
                "dvt" if use_dia_kernel else "dvals",
                "head",
                "head_cols",
                "hrows",
                "hrows_idx",
            )
            if key in self._dev
        )

        # Tiled DIA evaluation: one B window dynamic-slice per M-tile, all
        # diagonals fused into a single pass over that window. Evaluating
        # diagonals as full-height shifted B slices instead makes XLA
        # materialize a (M, N) temporary per diagonal (measured 80 ms for 7
        # diagonals on laplace3d_64 N=512 — ~40 memory passes); the tiled
        # form is bounded by B + C traffic.
        TM = 4096
        dpad_lo = max(0, -(min(offsets) if offsets else 0))
        # the largest in-window index is max_off + dpad_lo (+ TM rows)
        win_extra = (max(offsets) + dpad_lo) if offsets else 0
        win = TM + win_extra
        nt = -(-m // TM)
        m_tiles_pad = nt * TM

        def dia_part(dvals, b, alpha):
            n_cols = b.shape[1]
            rows_needed = m_tiles_pad + win_extra + 1
            bp = jnp.pad(b, ((dpad_lo, max(0, rows_needed - k - dpad_lo)), (0, 0)))
            dv = jnp.pad(dvals, ((0, 0), (0, m_tiles_pad - m)))

            def tile_fn(i):
                start = i * TM
                w = jax.lax.dynamic_slice(bp, (start, 0), (win, n_cols))
                dvt = jax.lax.dynamic_slice(dv, (0, start), (dv.shape[0], TM))
                acc = jnp.zeros((TM, n_cols), jnp.float32)
                for j, off in enumerate(offsets):
                    lo = off + dpad_lo
                    acc = acc + dvt[j][:, None] * w[lo : lo + TM]
                return acc

            tiles = jax.lax.map(tile_fn, jnp.arange(nt))
            return alpha * tiles.reshape(m_tiles_pad, n_cols)[:m]

        def dense_parts(dense_args, b, c, alpha, beta):
            """beta*C + alpha*(diagonal + head contributions)."""
            args = list(dense_args)
            if use_dia_kernel and use_dia_ct:
                from sextans_tpu.ops.spmm_dia_pallas import spmm_dia_ct_padded

                dvc = args.pop(0)
                n_cols = b.shape[1]
                bt = jnp.pad(
                    jnp.transpose(b),
                    ((0, n_ct_dia - n_cols), (pad_lo, 0)),
                )
                ct = jnp.pad(
                    jnp.transpose(c),
                    ((0, n_ct_dia - n_cols), (0, m_pad_dia - m)),
                )
                acc_t = spmm_dia_ct_padded(
                    dvc, bt, ct, alpha, beta,
                    offsets=tuple(offsets),
                    tile_m=dia_tile_m,
                    interpret=dia_interp,
                )
                acc = jnp.transpose(acc_t)[:m, :n_cols]
            elif use_dia_kernel:
                from sextans_tpu.ops.spmm_dia_pallas import spmm_dia_padded

                dvt = args.pop(0)
                n_cols = b.shape[1]
                ncp = -(-n_cols // dia_tile_n) * dia_tile_n
                bp = jnp.pad(b, ((pad_lo, 0), (0, ncp - n_cols)))
                cp = jnp.pad(c, ((0, m_pad_dia - m), (0, ncp - n_cols)))
                acc = spmm_dia_padded(
                    dvt, bp, cp, alpha, beta,
                    offsets=tuple(offsets),
                    tile_m=dia_tile_m,
                    tile_n=dia_tile_n,
                    interpret=dia_interp,
                )[:m, :n_cols]
            else:
                acc = beta * c
                if has_diag:
                    acc = acc + dia_part(args.pop(0), b, alpha)
            if has_head:
                head = args.pop(0)
                head_cols = args.pop(0)
                bh = b[head_cols, :]  # (H, N) gather
                acc = acc + alpha * jnp.dot(
                    head,
                    bh,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            if has_hrows:
                hrows, hrows_idx = args
                hout = jnp.dot(
                    hrows,
                    b,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (R, N)
                acc = acc.at[hrows_idx].add(alpha * hout)
            return acc

        def one_step(dense_args, res_args, b, c, alpha, beta):
            partial = dense_parts(dense_args, b, c, alpha, beta)
            if not has_residue:
                return partial
            return res_jit(*res_args, b, partial, alpha, jnp.float32(1.0))

        if self.precise:
            # Gate-sample composition (docs/ACCURACY.md): residue-first at
            # alpha=1/beta=0 through the precise kernel, DIA compensated,
            # and all parts combined with error-free transforms — ONE final
            # rounding per element instead of one per stage. The remaining
            # floor is each part's own f32 rounding (>= 0.5 ulp of its own
            # magnitude) plus the MXU head contraction's internal rounding.
            from sextans_tpu.ops.df32 import two_prod, two_sum

            res_noc = self._residue_plan._jit_noc
            prec_hi = jax.lax.Precision.HIGHEST

            def dia_only(dv_arg, b):
                """Compensated alpha=1/beta=0 diagonal part, (m, n) f32."""
                n_cols = b.shape[1]
                one = jnp.float32(1.0)
                zero = jnp.float32(0.0)
                if use_dia_kernel and use_dia_ct:
                    from sextans_tpu.ops.spmm_dia_pallas import (
                        spmm_dia_ct_padded,
                    )

                    bt = jnp.pad(
                        jnp.transpose(b),
                        ((0, n_ct_dia - n_cols), (pad_lo, 0)),
                    )
                    acc_t = spmm_dia_ct_padded(
                        dv_arg, bt,
                        jnp.zeros((n_ct_dia, m_pad_dia), jnp.float32),
                        one, zero, offsets=tuple(offsets),
                        tile_m=dia_tile_m, interpret=dia_interp,
                        with_c=False, precise=True,
                    )
                    return jnp.transpose(acc_t)[:m, :n_cols]
                if use_dia_kernel:
                    from sextans_tpu.ops.spmm_dia_pallas import (
                        spmm_dia_padded,
                    )

                    ncp = -(-n_cols // dia_tile_n) * dia_tile_n
                    bp = jnp.pad(b, ((pad_lo, 0), (0, ncp - n_cols)))
                    acc = spmm_dia_padded(
                        dv_arg, bp,
                        jnp.zeros((m_pad_dia, ncp), jnp.float32),
                        one, zero, offsets=tuple(offsets),
                        tile_m=dia_tile_m, tile_n=dia_tile_n,
                        interpret=dia_interp, with_c=False, precise=True,
                    )
                    return acc[:m, :n_cols]
                return dia_part(dv_arg, b, one)

            def one_step(dense_args, res_args, b, c, alpha, beta):  # noqa: F811
                args = list(dense_args)
                acc, resid = two_prod(beta, c)
                if has_diag:
                    p, pe = two_prod(alpha, dia_only(args.pop(0), b))
                    acc, e = two_sum(acc, p)
                    resid = resid + (pe + e)
                if has_head:
                    head = args.pop(0)
                    head_cols = args.pop(0)
                    h = jnp.dot(
                        head, b[head_cols, :],
                        preferred_element_type=jnp.float32,
                        precision=prec_hi,
                    )
                    p, pe = two_prod(alpha, h)
                    acc, e = two_sum(acc, p)
                    resid = resid + (pe + e)
                if has_hrows:
                    hrows, hrows_idx = args
                    hout = jnp.dot(
                        hrows, b,
                        preferred_element_type=jnp.float32,
                        precision=prec_hi,
                    )  # (R, N)
                    p, pe = two_prod(alpha, hout)
                    s, e = two_sum(acc[hrows_idx], p)
                    acc = acc.at[hrows_idx].set(s)  # head_rows are unique
                    resid = resid.at[hrows_idx].add(pe + e)
                if has_residue:
                    if res_noc is not None:
                        r_ = res_noc(*res_args, b, jnp.float32(1.0))
                    else:
                        r_ = res_jit(
                            *res_args, b, jnp.zeros_like(c),
                            jnp.float32(1.0), jnp.float32(0.0),
                        )
                    p, pe = two_prod(alpha, r_)
                    acc, e = two_sum(acc, p)
                    resid = resid + (pe + e)
                return acc + resid

        def step(dense_args, res_args, b, c, alpha, beta):
            return one_step(dense_args, res_args, b, c, alpha, beta)

        self._step = jax.jit(step)

        # in-device rp_time chain: the ENTIRE hybrid step (dense parts +
        # residue kernel) repeats inside one dispatch, C fed back as carry.
        def _make_repeat(times):
            def rep(dense_args, res_args, b, c, alpha, beta):
                def body(_, c_acc):
                    return one_step(dense_args, res_args, b, c_acc, alpha, beta)

                return jax.lax.fori_loop(0, times, body, c)

            return jax.jit(rep)

        self._make_repeat = _make_repeat
        self._repeat_cache = {}
        self._dense_args = dense_dev
        self._res_args = res_dev

    def _coerce(self, b, beta, c):
        import jax.numpy as jnp

        b = jnp.asarray(b, dtype=jnp.float32)
        if b.shape != (self.k, self.n):
            raise ValueError(f"B must be ({self.k}, {self.n}), got {b.shape}")
        if c is None:
            if float(beta) != 0.0:
                raise ValueError("beta != 0 requires an input C")
            c = jnp.zeros((self.m, self.n), dtype=jnp.float32)
        else:
            c = jnp.asarray(c, dtype=jnp.float32)
            if c.shape != (self.m, self.n):
                raise ValueError(f"C must be ({self.m}, {self.n}), got {c.shape}")
        return b, c

    def __call__(self, b, alpha=1.0, beta=0.0, c=None):
        import jax.numpy as jnp

        from sextans_tpu.ops.plan import retry_transient_compile

        b, c = self._coerce(b, beta, c)
        return retry_transient_compile(
            self._step,
            self._dense_args, self._res_args, b, c,
            jnp.float32(alpha), jnp.float32(beta),
        )

    def repeat(self, b, alpha=1.0, beta=0.0, c=None, times: int = 1):
        """In-device rp_time chain over the full hybrid step (one dispatch)."""
        import jax.numpy as jnp

        from sextans_tpu.ops.plan import retry_transient_compile

        b, c = self._coerce(b, beta, c)
        if times not in self._repeat_cache:
            self._repeat_cache[times] = self._make_repeat(times)
        return retry_transient_compile(
            self._repeat_cache[times],
            self._dense_args, self._res_args, b, c,
            jnp.float32(alpha), jnp.float32(beta),
        )
