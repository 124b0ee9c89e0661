"""ELL gather backend: pack + XLA engine vs the golden oracle.

Coverage for the fourth packed format (format/pack_ell.py +
ops/spmm_ell_xla.py) — the HBM-gather path for low-degree scattered
matrices, including hub-row splitting and the fold scatter-add.
"""

import numpy as np
import pytest

from sextans_tpu.format.coo import COOMatrix
from sextans_tpu.format.csr import CSRMatrix
from sextans_tpu.format.pack_ell import (
    PackedSpMatrixELL,
    choose_slots_per_row,
    pack_ell,
)
from sextans_tpu.ops.golden import golden_spmm_exact
from sextans_tpu.ops.plan import SpmmPlan
from sextans_tpu.utils.config import SpmmConfig
from sextans_tpu.utils.verify import verify

CFG = SpmmConfig(tile_m=64)


def _run(coo, n, cfg=CFG, alpha=0.85, beta=-2.06, c=None, seed=0, **pk):
    rng = np.random.default_rng(seed)
    m, k = coo.shape
    b = rng.standard_normal((k, n)).astype(np.float32)
    if beta != 0.0 and c is None:
        c = rng.standard_normal((m, n)).astype(np.float32)
    packed = pack_ell(coo, cfg, **pk)
    plan = SpmmPlan(packed, n, backend="ell")
    got = np.asarray(plan(b, alpha, beta, c))
    want = golden_spmm_exact(CSRMatrix.from_coo(coo), b, alpha, beta, c)
    return got, want, packed


def test_ell_matches_golden_basic():
    coo = COOMatrix.random(500, 700, 4000, seed=1)
    got, want, _ = _run(coo, 96)
    res = verify(want, got)
    assert res.passed, res


def test_ell_small_n_unpadded():
    coo = COOMatrix.random(300, 400, 2000, seed=2)
    got, want, _ = _run(coo, 16)
    assert got.shape == want.shape == (300, 16)
    res = verify(want, got)
    assert res.passed, res


def test_ell_hub_rows_split_and_fold():
    # one hub row with 500 nonzeros forces virtual rows at any sane R
    rng = np.random.default_rng(3)
    m, k = 128, 600
    hub_cols = rng.choice(k, 500, replace=False)
    rows = np.concatenate([np.full(500, 7), rng.integers(0, m, 300)])
    cols = np.concatenate([hub_cols, rng.integers(0, k, 300)])
    vals = rng.standard_normal(rows.size).astype(np.float32)
    coo = COOMatrix((m, k), rows, cols, vals)
    packed = pack_ell(coo, CFG, slots_per_row=4)
    assert packed.n_virt >= 500 // 4 - 1
    assert packed.slots_per_row == 4
    got, want, _ = _run(coo, 32, slots_per_row=4)
    res = verify(want, got)
    assert res.passed, res
    # fold exactness: hub row value within tolerance of the f64 oracle
    assert np.max(np.abs(got[7] - want[7])) < 1e-3 * max(
        1.0, np.max(np.abs(want[7]))
    )


def test_ell_duplicate_coo_entries_sum():
    rows = np.array([0, 0, 1, 1, 1], dtype=np.int64)
    cols = np.array([2, 2, 3, 3, 3], dtype=np.int64)
    vals = np.array([1.0, 2.0, 4.0, 8.0, 16.0], dtype=np.float32)
    coo = COOMatrix((4, 8), rows, cols, vals)
    b = np.ones((8, 8), dtype=np.float32)
    packed = pack_ell(coo, SpmmConfig(tile_m=8), slots_per_row=2)
    plan = SpmmPlan(packed, 8, backend="ell")
    got = np.asarray(plan(b, 1.0, 0.0))
    # duplicates occupy separate slots and sum: rows 0 -> 3, 1 -> 28
    np.testing.assert_allclose(got[0], 3.0)
    np.testing.assert_allclose(got[1], 28.0)


def test_ell_empty_rows_and_empty_matrix():
    # rows with no nonzeros produce exact zeros
    rows = np.array([5], dtype=np.int64)
    cols = np.array([1], dtype=np.int64)
    vals = np.array([2.5], dtype=np.float32)
    coo = COOMatrix((10, 4), rows, cols, vals)
    got, want, _ = _run(coo, 8, cfg=SpmmConfig(tile_m=8), beta=0.0)
    res = verify(want, got)
    assert res.passed, res

    empty = COOMatrix(
        (6, 6),
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float32),
    )
    packed = pack_ell(empty, SpmmConfig(tile_m=8))
    plan = SpmmPlan(packed, 4, backend="ell")
    got = np.asarray(plan(np.ones((6, 4), np.float32), 2.0, 0.0))
    np.testing.assert_array_equal(got, 0.0)


def test_ell_beta_zero_fast_path_and_repeat():
    coo = COOMatrix.random(200, 300, 1500, seed=4)
    rng = np.random.default_rng(5)
    b = rng.standard_normal((300, 24)).astype(np.float32)
    packed = pack_ell(coo, CFG)
    plan = SpmmPlan(packed, 24, backend="ell")
    got = np.asarray(plan(b, 1.5))
    want = golden_spmm_exact(CSRMatrix.from_coo(coo), b, 1.5, 0.0, None)
    assert verify(want, got).passed
    # in-device repeat chain: C_{t+1} = alpha A B + beta C_t
    c0 = rng.standard_normal((200, 24)).astype(np.float32)
    got2 = np.asarray(plan.repeat(b, 0.5, 0.25, c0, times=3))
    want2 = c0
    for _ in range(3):
        want2 = golden_spmm_exact(
            CSRMatrix.from_coo(coo), b, 0.5, 0.25, want2
        ).astype(np.float32)
    assert verify(want2, got2).passed


def test_ell_save_load_roundtrip(tmp_path):
    coo = COOMatrix.random(100, 150, 800, seed=6)
    packed = pack_ell(coo, CFG)
    p = tmp_path / "m.npz"
    packed.save(p)
    loaded = PackedSpMatrixELL.load(p)
    assert loaded.shape == packed.shape
    assert loaded.slots_per_row == packed.slots_per_row
    assert loaded.m_base == packed.m_base
    np.testing.assert_array_equal(loaded.cols, packed.cols)
    np.testing.assert_array_equal(loaded.vals, packed.vals)
    np.testing.assert_array_equal(loaded.fold_rows, packed.fold_rows)
    rng = np.random.default_rng(7)
    b = rng.standard_normal((150, 16)).astype(np.float32)
    got = np.asarray(SpmmPlan(loaded, 16, backend="ell")(b, 1.0, 0.0))
    want = golden_spmm_exact(CSRMatrix.from_coo(coo), b, 1.0, 0.0, None)
    assert verify(want, got).passed


def test_ell_inflation_refusal():
    # a single dense row in an otherwise huge empty matrix: m_padded * R
    # bytes per nonzero explodes and the pack must refuse
    rows = np.zeros(64, dtype=np.int64)
    cols = np.arange(64, dtype=np.int64)
    vals = np.ones(64, dtype=np.float32)
    coo = COOMatrix((100_000, 64), rows, cols, vals)
    with pytest.raises(ValueError, match="inflation"):
        pack_ell(coo, SpmmConfig(tile_m=8), slots_per_row=32)


def test_choose_slots_per_row_cost_model():
    # uniform degree-4 matrix: R=4 (or close) minimizes traffic; a
    # power-law matrix must not inflate R to its hub degree
    rng = np.random.default_rng(8)
    m, k = 2048, 2048
    rows = np.repeat(np.arange(m), 4)
    cols = rng.integers(0, k, rows.size)
    coo = COOMatrix((m, k), rows, cols,
                                np.ones(rows.size, np.float32))
    r = choose_slots_per_row(coo, n=128)
    assert 2 <= r <= 8
    # heavy hub row on top: chosen R must stay small (split handles it)
    rows2 = np.concatenate([rows, np.zeros(4000, np.int64)])
    cols2 = np.concatenate([cols, rng.integers(0, k, 4000)])
    coo2 = COOMatrix(
        (m, k), rows2, cols2, np.ones(rows2.size, np.float32)
    )
    assert choose_slots_per_row(coo2, n=128) <= 16


def test_ell_autotune_candidates():
    from sextans_tpu.utils.autotune import choose_config_ell

    coo = COOMatrix.random(4096, 4096, 16384, seed=9)
    res = choose_config_ell(coo, n=64, top=2)
    assert res and all(t.fmt == "ell" for t in res)
    assert all(t.config.ell_r is not None for t in res)
    # configs must be packable and correct end-to-end
    got, want, _ = _run(coo, 64, cfg=res[0].config, beta=0.0)
    assert verify(want, got).passed


def test_ell_pack_cache_roundtrip(tmp_path):
    from sextans_tpu.format.pack_cache import PackCache

    coo = COOMatrix.random(256, 256, 1024, seed=10)
    cache = PackCache(tmp_path)
    cfg = SpmmConfig(tile_m=64, ell_r=4)
    p1 = cache.get_or_pack("m1", coo, cfg, "ell")
    assert cache.misses == 1
    p2 = cache.get_or_pack("m1", coo, cfg, "ell")
    assert cache.hits == 1
    np.testing.assert_array_equal(p1.cols, p2.cols)
    cache2 = PackCache(tmp_path)
    p3 = cache2.get_or_pack("m1", coo, cfg, "ell")
    assert cache2.disk_hits == 1
    np.testing.assert_array_equal(p1.vals, p3.vals)
