"""Native C++ host engine vs. NumPy reference implementation parity."""
import numpy as np
import pytest

import qrkit_tpu._native as native
from qrkit_tpu.analysis import as_banded_as_possible, block_banded_info
from qrkit_tpu.sparse import Permutation, SparseCSR

from generators import overlapping_block_diagonal_matrix

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


@pytest.fixture
def mat(rng):
    return overlapping_block_diagonal_matrix(128, 448, rng, permute_rows=True)


def _numpy_only(monkeypatch):
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)


def test_row_ranges_parity(mat, monkeypatch):
    s1, e1 = mat.row_ranges()
    _numpy_only(monkeypatch)
    s2, e2 = mat.row_ranges()
    assert np.array_equal(s1, s2) and np.array_equal(e1, e2)


def test_abap_parity(mat, monkeypatch):
    p1, h1 = as_banded_as_possible(mat)
    _numpy_only(monkeypatch)
    p2, h2 = as_banded_as_possible(mat)
    assert h1 == h2
    assert np.array_equal(p1.indices, p2.indices)


def test_block_detect_parity(mat, monkeypatch):
    perm, _ = as_banded_as_possible(mat)
    sorted_mat = mat.permute_rows(perm)
    plan1 = block_banded_info(sorted_mat, 2)
    _numpy_only(monkeypatch)
    plan2 = block_banded_info(sorted_mat, 2)
    assert plan1.blocks == plan2.blocks
    assert plan1.nnz_q_estimate == plan2.nnz_q_estimate


def test_block_detect_parity_unsorted(mat, monkeypatch):
    # block_banded_info documents "already row-sorted" input, but the NumPy
    # and native paths must agree on *any* input: both group consecutive
    # equal-band-start runs (a value-keyed grouping would diverge here)
    plan1 = block_banded_info(mat, 2)
    _numpy_only(monkeypatch)
    plan2 = block_banded_info(mat, 2)
    assert plan1.blocks == plan2.blocks
    assert plan1.nnz_q_estimate == plan2.nnz_q_estimate


def test_permute_rows_parity(mat, monkeypatch, rng):
    perm = Permutation(rng.permutation(mat.nrows))
    d1 = mat.permute_rows(perm).to_dense()
    _numpy_only(monkeypatch)
    d2 = mat.permute_rows(perm).to_dense()
    assert np.array_equal(d1, d2)


def test_extract_panels_parity(mat, monkeypatch):
    blocks = [(0, 0, 9, 4), (7, 2, 9, 4), (400, 120, 14, 6)]
    p1 = mat.blocks_dense(blocks, 14, 6)
    _numpy_only(monkeypatch)
    p2 = mat.blocks_dense(blocks, 14, 6)
    assert np.array_equal(p1, p2)


def test_col_nnz_parity(mat, monkeypatch):
    c1 = mat.col_nnz()
    _numpy_only(monkeypatch)
    c2 = mat.col_nnz()
    assert np.array_equal(c1, c2)
