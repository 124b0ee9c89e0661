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


def powerlaw_like(
    m: int, avg_degree: int = 16, seed: int = 0, zipf_a: float = 1.8
) -> COOMatrix:
    """Scale-free graph adjacency — the adversarial, block-hostile case."""
    rng = np.random.default_rng(seed)
    nnz = m * avg_degree
    # preferential-attachment-ish: degree ~ zipf
    popularity = rng.zipf(zipf_a, size=m).astype(np.float64)
    popularity /= popularity.sum()
    rows = rng.integers(0, m, size=nnz)
    cols = rng.choice(m, size=nnz, p=popularity)
    lin = rows.astype(np.int64) * m + cols
    _, keep = np.unique(lin, return_index=True)
    vals = np.ones(keep.size, dtype=np.float32)
    return COOMatrix(
        (m, m), rows[keep].astype(np.int32), cols[keep].astype(np.int32), vals
    )


def circuit_like(
    m: int, extra_per_row: int = 4, hubs: int = 40, seed: int = 0
) -> COOMatrix:
    """scircuit-class: sparse diagonal-dominant netlist with a few dense
    power/ground "rail" columns and rows (the hub nets)."""
    rng = np.random.default_rng(seed)
    diag = np.arange(m, dtype=np.int64)
    # local couplings, mostly near-diagonal
    nloc = m * extra_per_row
    lr = rng.integers(0, m, size=nloc)
    lc = np.clip(lr + rng.integers(-60, 61, size=nloc), 0, m - 1)
    # hub nets: a handful of columns (and rows) touched by ~0.5% of nodes each
    hub_ids = rng.integers(0, m, size=hubs)
    per_hub = max(1, m // 200)
    hr = rng.integers(0, m, size=hubs * per_hub)
    hc = np.repeat(hub_ids, per_hub)
    rows = np.concatenate([diag, lr, hr, hc])
    cols = np.concatenate([diag, lc, hc, hr])
    lin = rows * m + cols
    _, keep = np.unique(lin, return_index=True)
    vals = rng.standard_normal(keep.size).astype(np.float32)
    vals[vals == 0] = 1.0
    return COOMatrix(
        (m, m), rows[keep].astype(np.int32), cols[keep].astype(np.int32), vals
    )


def econ_like(m: int, nnz_per_row: int = 6, seed: int = 0) -> COOMatrix:
    """mac_econ_fwd500-class: input-output economics — sparse irregular
    rows plus a band and a few globally dense sector columns."""
    rng = np.random.default_rng(seed)
    n_rand = m * (nnz_per_row - 2)
    rr = rng.integers(0, m, size=n_rand)
    # sector coupling: column depends on row's "sector" (m//500 sectors)
    sector = rr // 500
    rc = np.clip(
        sector * 500 + rng.integers(0, 500, size=n_rand) * rng.choice([1, 1, 1, 7], size=n_rand) % m,
        0, m - 1,
    )
    diag = np.arange(m, dtype=np.int64)
    band = np.clip(diag + rng.integers(-5, 6, size=m), 0, m - 1)
    rows = np.concatenate([diag, diag, rr])
    cols = np.concatenate([diag, band, rc])
    lin = rows * m + cols
    _, keep = np.unique(lin, return_index=True)
    vals = rng.standard_normal(keep.size).astype(np.float32)
    vals[vals == 0] = 1.0
    return COOMatrix(
        (m, m), rows[keep].astype(np.int32), cols[keep].astype(np.int32), vals
    )


def stencil_2d(side: int, seed: int = 0) -> COOMatrix:
    """mc2depi-class: 4/5-point stencil on a 2-D grid — perfectly regular,
    4 nnz/row, huge bandwidth gap between the +-1 and +-side diagonals."""
    m = side * side
    diag = np.arange(m, dtype=np.int64)
    rows, cols = [diag], [diag]
    for off in (-1, 1, -side, side):
        d = diag + off
        ok = (d >= 0) & (d < m)
        rows.append(diag[ok])
        cols.append(d[ok])
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    rng = np.random.default_rng(seed)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    vals[vals == 0] = 1.0
    return COOMatrix(
        (m, m), rows.astype(np.int32), cols.astype(np.int32), vals
    )


def stencil_3d(side: int, seed: int = 0) -> COOMatrix:
    """Graph-Laplacian class: 7-point stencil on a 3-D grid."""
    m = side ** 3
    diag = np.arange(m, dtype=np.int64)
    rows, cols = [diag], [diag]
    for off in (-1, 1, -side, side, -side * side, side * side):
        d = diag + off
        ok = (d >= 0) & (d < m)
        rows.append(diag[ok])
        cols.append(d[ok])
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    rng = np.random.default_rng(seed)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    vals[vals == 0] = 1.0
    return COOMatrix(
        (m, m), rows.astype(np.int32), cols.astype(np.int32), vals
    )


def roadnet_like(m: int, seed: int = 0) -> COOMatrix:
    """Road-network class: planar-ish graph, degree 2-4, strong locality
    after the usual coordinate sort (near-diagonal, tiny bandwidth)."""
    rng = np.random.default_rng(seed)
    deg = rng.integers(2, 5, size=m)
    rows = np.repeat(np.arange(m, dtype=np.int64), deg)
    off = rng.integers(1, 2000, size=rows.size) * rng.choice([-1, 1], size=rows.size)
    cols = np.clip(rows + off, 0, m - 1)
    lin = rows * m + cols
    _, keep = np.unique(lin, return_index=True)
    vals = np.ones(keep.size, dtype=np.float32)
    return COOMatrix(
        (m, m), rows[keep].astype(np.int32), cols[keep].astype(np.int32), vals
    )


def dense_block(m: int, seed: int = 0) -> COOMatrix:
    """Fully dense control matrix (the suite's fill=1.0 calibration point)."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(m, dtype=np.int32), m)
    cols = np.tile(np.arange(m, dtype=np.int32), m)
    vals = rng.standard_normal(m * m).astype(np.float32)
    vals[vals == 0] = 1.0
    return COOMatrix((m, m), rows, cols, vals)


def suite(scale: str = "small") -> dict:
    """Named benchmark suite. scale: "small" (CI-fast subset), "full"
    (the 20-matrix headline suite of the BASELINE.json north star)."""
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
    out["scircuit_like"] = lambda: circuit_like(170998, seed=9)
    out["mac_econ_like"] = lambda: econ_like(206500, seed=10)
    out["rma10_like"] = lambda: fem_like(
        46835, dofs=5, neighbors=10, bandwidth=3000, seed=11
    )
    out["laplace3d_64"] = lambda: stencil_3d(64, seed=12)
    out["dense2k"] = lambda: dense_block(2048, seed=13)
    if scale == "full":
        out["mc2depi_like"] = lambda: stencil_2d(725, seed=14)
        out["cop20k_like"] = lambda: fem_like(
            121192, dofs=3, neighbors=7, bandwidth=30000, seed=15
        )
        out["pwtk_like"] = lambda: fem_like(
            217918, dofs=3, neighbors=18, bandwidth=600, seed=16
        )
        out["amazon_like"] = lambda: powerlaw_like(
            400727, avg_degree=8, seed=17, zipf_a=2.2
        )
        out["roadnet_like"] = lambda: roadnet_like(1087562, seed=18)
        out["ldoor_like"] = lambda: fem_like(
            952203, dofs=3, neighbors=16, bandwidth=1200, seed=7
        )
        out["nlpkkt80_like"] = lambda: kkt_like(1062400, seed=8)
        out["webbase1M_like"] = lambda: powerlaw_like(
            1000005, avg_degree=3, seed=19
        )
        # Deadline-bounded runners process dict order. Round-3 priority:
        # COVERAGE first — the cheap never-measured classes right after the
        # nasa4704 reference, then the medium/large never-measured ones,
        # then the big headliners, with the already-covered FEM classes
        # last (they have canonical rows from earlier passes; the merge
        # keeps the best healthy sample either way).
        priority = [
            "nasa4704",
            # small, never measured (minutes each)
            "scircuit_like", "mac_econ_like", "rma10_like", "laplace3d_64",
            "dense2k", "mc2depi_like", "cop20k_like",
            # medium, never measured
            "webgraph_like", "pwtk_like", "amazon_like", "roadnet_like",
            # big headliners
            "ldoor_like", "nlpkkt80_like", "webbase1M_like",
        ]
        out = {
            **{k: out[k] for k in priority if k in out},
            **{k: v for k, v in out.items() if k not in priority},
        }
    return out
