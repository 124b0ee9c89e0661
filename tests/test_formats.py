"""COO/CSR/CSC container and conversion tests (reference src/sparse_helper.h:37-87,216-258,475-509)."""

import numpy as np
import pytest

from sextans_tpu.format.coo import COOMatrix
from sextans_tpu.format.csr import CSCMatrix, CSRMatrix


@pytest.fixture
def coo():
    return COOMatrix.random(50, 70, 300, seed=7)


def test_sort_by_row(coo):
    s = coo.sorted_by_row()
    keys = s.rows.astype(np.int64) * coo.shape[1] + s.cols
    assert np.all(np.diff(keys) > 0)  # unique coords → strictly increasing
    np.testing.assert_allclose(s.to_dense(), coo.to_dense())


def test_sort_by_col(coo):
    s = coo.sorted_by_col()
    keys = s.cols.astype(np.int64) * coo.shape[0] + s.rows
    assert np.all(np.diff(keys) > 0)
    np.testing.assert_allclose(s.to_dense(), coo.to_dense())


def test_csr_roundtrip(coo):
    csr = CSRMatrix.from_coo(coo)
    assert csr.indptr[-1] == coo.nnz
    np.testing.assert_allclose(csr.to_coo().to_dense(), coo.to_dense())


def test_csc_roundtrip(coo):
    csc = CSCMatrix.from_coo(coo)
    assert csc.indptr[-1] == coo.nnz
    np.testing.assert_allclose(csc.to_coo().to_dense(), coo.to_dense())


def test_csc_to_csr_matches_direct(coo):
    """CSC → CSR conversion equals direct CSR build (CSC_2_CSR semantics)."""
    direct = CSRMatrix.from_coo(coo)
    via_csc = CSCMatrix.from_coo(coo).to_csr()
    np.testing.assert_array_equal(direct.indptr, via_csc.indptr)
    np.testing.assert_array_equal(direct.indices, via_csc.indices)
    np.testing.assert_allclose(direct.vals, via_csc.vals)


def test_against_scipy(coo):
    scipy = pytest.importorskip("scipy.sparse")
    ours = CSRMatrix.from_coo(coo)
    ref = scipy.coo_matrix(
        (coo.vals, (coo.rows, coo.cols)), shape=coo.shape
    ).tocsr()
    np.testing.assert_array_equal(ours.indptr, ref.indptr)
    np.testing.assert_array_equal(ours.indices, ref.indices)
    np.testing.assert_allclose(ours.vals, ref.data)


def test_transpose(coo):
    np.testing.assert_allclose(coo.transpose().to_dense(), coo.to_dense().T)


def test_duplicate_coordinates_sum():
    coo = COOMatrix(
        (2, 2),
        rows=np.array([0, 0, 1], dtype=np.int32),
        cols=np.array([1, 1, 0], dtype=np.int32),
        vals=np.array([2.0, 3.0, 4.0], dtype=np.float32),
    )
    dense = coo.to_dense()
    assert dense[0, 1] == 5.0


def test_bounds_validation():
    with pytest.raises(ValueError):
        COOMatrix((2, 2), np.array([2]), np.array([0]), np.array([1.0]))
    with pytest.raises(ValueError):
        COOMatrix((2, 2), np.array([0]), np.array([-1]), np.array([1.0]))
