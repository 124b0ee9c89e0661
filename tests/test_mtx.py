"""Matrix Market reader tests — semantics of reference src/sparse_helper.h:89-259."""

import numpy as np
import pytest

from sextans_tpu.io.mtx import read_header, read_mtx, read_mtx_coo, write_mtx
from sextans_tpu.format.coo import COOMatrix


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return p


def test_general_real(tmp_path):
    p = _write(
        tmp_path,
        "a.mtx",
        """%%MatrixMarket matrix coordinate real general
% a comment
3 4 3
1 1 1.5
2 3 -2.0
3 4 0.25
""",
    )
    hdr, rows, cols, vals = read_mtx_coo(p)
    assert (hdr.nrows, hdr.ncols, hdr.nnz_stored) == (3, 4, 3)
    np.testing.assert_array_equal(rows, [0, 1, 2])
    np.testing.assert_array_equal(cols, [0, 2, 3])
    np.testing.assert_allclose(vals, [1.5, -2.0, 0.25])


def test_symmetric_expansion(tmp_path):
    """Mirror expansion of off-diagonal entries (src/sparse_helper.h:156-163)."""
    p = _write(
        tmp_path,
        "s.mtx",
        """%%MatrixMarket matrix coordinate real symmetric
3 3 3
1 1 2.0
2 1 5.0
3 3 7.0
""",
    )
    coo = read_mtx(p)
    assert coo.nnz == 4  # diagonal entries not duplicated
    dense = coo.to_dense()
    np.testing.assert_allclose(dense, dense.T)
    assert dense[1, 0] == 5.0 and dense[0, 1] == 5.0


def test_pattern_gets_unit_values(tmp_path):
    """Pattern entries get value 1.0 (src/sparse_helper.h:136-138)."""
    p = _write(
        tmp_path,
        "p.mtx",
        """%%MatrixMarket matrix coordinate pattern general
2 2 2
1 2
2 1
""",
    )
    _, rows, cols, vals = read_mtx_coo(p)
    np.testing.assert_allclose(vals, [1.0, 1.0])


def test_integer_field(tmp_path):
    p = _write(
        tmp_path,
        "i.mtx",
        """%%MatrixMarket matrix coordinate integer general
2 2 2
1 1 3
2 2 -4
""",
    )
    _, _, _, vals = read_mtx_coo(p)
    np.testing.assert_allclose(vals, [3.0, -4.0])


def test_explicit_zero_dropped_negative_zero_kept(tmp_path):
    """+0.0 dropped, -0.0 kept — bit-pattern check (src/sparse_helper.h:143-145)."""
    p = _write(
        tmp_path,
        "z.mtx",
        """%%MatrixMarket matrix coordinate real general
2 2 3
1 1 0.0
1 2 -0.0
2 2 9.0
""",
    )
    _, rows, cols, vals = read_mtx_coo(p)
    assert len(vals) == 2
    assert np.signbit(vals[0])  # the -0.0 survived


def test_complex_rejected(tmp_path):
    p = _write(
        tmp_path,
        "c.mtx",
        """%%MatrixMarket matrix coordinate complex general
1 1 1
1 1 1.0 2.0
""",
    )
    with pytest.raises(ValueError, match="complex"):
        read_mtx_coo(p)


def test_array_format_rejected(tmp_path):
    p = _write(
        tmp_path,
        "d.mtx",
        """%%MatrixMarket matrix array real general
2 2
1.0
2.0
3.0
4.0
""",
    )
    with pytest.raises(ValueError, match="coordinate"):
        read_mtx_coo(p)


def test_out_of_range_index_raises(tmp_path):
    p = _write(
        tmp_path,
        "o.mtx",
        """%%MatrixMarket matrix coordinate real general
2 2 1
0 1 1.0
""",
    )
    with pytest.raises(ValueError, match="out of range"):
        read_mtx_coo(p)


def test_truncated_raises(tmp_path):
    p = _write(
        tmp_path,
        "t.mtx",
        """%%MatrixMarket matrix coordinate real general
2 2 2
1 1 1.0
""",
    )
    with pytest.raises(ValueError, match="truncated"):
        read_mtx_coo(p)


def test_skew_symmetric_negated_mirror(tmp_path):
    p = _write(
        tmp_path,
        "k.mtx",
        """%%MatrixMarket matrix coordinate real skew-symmetric
2 2 1
2 1 3.0
""",
    )
    coo = read_mtx(p)
    dense = coo.to_dense()
    assert dense[1, 0] == 3.0 and dense[0, 1] == -3.0


def test_roundtrip_write_read(tmp_path, rng):
    coo = COOMatrix.random(17, 23, 60, seed=3)
    p = tmp_path / "rt.mtx"
    write_mtx(p, coo)
    back = read_mtx(p)
    np.testing.assert_allclose(back.to_dense(), coo.to_dense(), rtol=1e-6)


def test_read_header_cheap(tmp_path):
    p = _write(
        tmp_path,
        "h.mtx",
        """%%MatrixMarket matrix coordinate real symmetric
% hi
5 5 2
1 1 1.0
2 2 2.0
""",
    )
    hdr = read_header(p)
    assert hdr.symmetry == "symmetric"
    assert (hdr.nrows, hdr.ncols, hdr.nnz_stored) == (5, 5, 2)


def test_nasa4704(nasa4704_path):
    """Canonical smoke matrix: 4704x4704 symmetric pattern, 54730 stored entries
    (reference matrices/nasa4704/nasa4704.mtx:18, CMakeLists.txt:48-51)."""
    hdr = read_header(nasa4704_path)
    assert (hdr.nrows, hdr.ncols) == (4704, 4704)
    assert hdr.symmetry == "symmetric"
    coo = read_mtx(nasa4704_path)
    n_diag = int(np.sum(coo.rows == coo.cols))
    # mirror expansion duplicates every off-diagonal stored entry
    assert coo.nnz == 2 * hdr.nnz_stored - n_diag
    assert coo.nnz > hdr.nnz_stored


def test_gzip_mtx(tmp_path):
    import gzip

    text = """%%MatrixMarket matrix coordinate real general
2 2 2
1 1 1.5
2 2 2.5
"""
    p = tmp_path / "g.mtx.gz"
    with gzip.open(p, "wt") as f:
        f.write(text)
    coo = read_mtx(p)
    assert coo.nnz == 2
    np.testing.assert_allclose(coo.vals, [1.5, 2.5])


def test_crlf_line_endings(tmp_path):
    text = "%%MatrixMarket matrix coordinate real general\r\n2 2 2\r\n1 1 1.5\r\n2 2 2.5\r\n"
    p = tmp_path / "crlf.mtx"
    p.write_bytes(text.encode())
    coo = read_mtx(p)
    assert coo.nnz == 2
    np.testing.assert_allclose(coo.vals, [1.5, 2.5])
