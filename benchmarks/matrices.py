"""Benchmark matrix generators.

The BASELINE.json suite names real SuiteSparse matrices (nasa4704, pcrystk02,
cant, consph, pdb1HYS, shipsec1, ldoor, nlpkkt80). This environment has zero
egress, so apart from nasa4704 (vendored read-only in the reference mount) we
synthesize structural stand-ins with matched dimensions/nnz and the same
structural character (FEM multi-dof dense blocks along a band, KKT saddle
structure, power-law graphs as the adversarial case).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from sextans_tpu.format.coo import COOMatrix

NASA4704 = Path("/root/reference/matrices/nasa4704/nasa4704.mtx")


def fem_like(
    m: int, dofs: int = 3, neighbors: int = 9, bandwidth: int = 400, seed: int = 0
) -> COOMatrix:
    """FEM stiffness-like: dense dofs x dofs blocks, banded node graph.

    Structural stand-in for cant / consph / pdb1HYS / shipsec1 / ldoor:
    each node couples to ~``neighbors`` nearby nodes, every coupling is a
    dense dofs x dofs block → high 8xBK block fill, banded.
    """
    rng = np.random.default_rng(seed)
    nodes = m // dofs
    src = np.repeat(np.arange(nodes), neighbors)
    off = rng.integers(-bandwidth // dofs, bandwidth // dofs + 1, size=src.size)
    dst = np.clip(src + off, 0, nodes - 1)
    # expand each node pair into a dense dofs x dofs block
    di, dj = np.meshgrid(np.arange(dofs), np.arange(dofs), indexing="ij")
    rows = (src[:, None, None] * dofs + di[None]).reshape(-1)
    cols = (dst[:, None, None] * dofs + dj[None]).reshape(-1)
    lin = rows.astype(np.int64) * m + cols
    _, keep = np.unique(lin, return_index=True)
    rows, cols = rows[keep], cols[keep]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    vals[vals == 0] = 1.0
    return COOMatrix((m, m), rows.astype(np.int32), cols.astype(np.int32), vals)


def kkt_like(m: int, nnz_per_row: int = 26, seed: int = 0) -> COOMatrix:
    """nlpkkt-like: 3D-grid PDE + constraint saddle structure (banded at
    three scales)."""
    rng = np.random.default_rng(seed)
    n_each = m * nnz_per_row // 3
    rows = rng.integers(0, m, size=3 * n_each)
    side = max(1, round(m ** (1 / 3)))
    offs = np.concatenate(
        [
            rng.integers(-3, 4, size=n_each),
            rng.integers(-3, 4, size=n_each) * side,
            rng.integers(-3, 4, size=n_each) * side * side,
        ]
    )
    cols = np.clip(rows + offs, 0, m - 1)
    lin = rows.astype(np.int64) * m + cols
    _, keep = np.unique(lin, return_index=True)
    vals = rng.standard_normal(keep.size).astype(np.float32)
    vals[vals == 0] = 1.0
    return COOMatrix(
        (m, m), rows[keep].astype(np.int32), cols[keep].astype(np.int32), vals
    )


def powerlaw_like(m: int, avg_degree: int = 16, seed: int = 0) -> COOMatrix:
    """Scale-free graph adjacency — the adversarial, block-hostile case."""
    rng = np.random.default_rng(seed)
    nnz = m * avg_degree
    # preferential-attachment-ish: degree ~ zipf
    popularity = rng.zipf(1.8, size=m).astype(np.float64)
    popularity /= popularity.sum()
    rows = rng.integers(0, m, size=nnz)
    cols = rng.choice(m, size=nnz, p=popularity)
    lin = rows.astype(np.int64) * m + cols
    _, keep = np.unique(lin, return_index=True)
    vals = np.ones(keep.size, dtype=np.float32)
    return COOMatrix(
        (m, m), rows[keep].astype(np.int32), cols[keep].astype(np.int32), vals
    )


def suite(scale: str = "small") -> dict:
    """Named benchmark suite. scale: "small" (CI-fast), "full" (headline)."""
    out = {}
    if NASA4704.exists():
        from sextans_tpu.io.mtx import read_mtx

        out["nasa4704"] = lambda: read_mtx(NASA4704)
    out["pcrystk02_like"] = lambda: fem_like(13965, dofs=3, neighbors=23, seed=1)
    out["cant_like"] = lambda: fem_like(62451, dofs=3, neighbors=21, seed=2)
    out["consph_like"] = lambda: fem_like(83334, dofs=3, neighbors=24, seed=3)
    out["pdb1HYS_like"] = lambda: fem_like(36417, dofs=9, neighbors=13, seed=4)
    out["shipsec1_like"] = lambda: fem_like(
        140874, dofs=3, neighbors=18, bandwidth=900, seed=5
    )
    out["webgraph_like"] = lambda: powerlaw_like(100000, avg_degree=16, seed=6)
    if scale == "full":
        out["ldoor_like"] = lambda: fem_like(
            952203, dofs=3, neighbors=16, bandwidth=1200, seed=7
        )
        out["nlpkkt80_like"] = lambda: kkt_like(1062400, seed=8)
    return out
