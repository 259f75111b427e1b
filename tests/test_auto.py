"""auto_qr — automatic solver selection from detected structure.

The reference requires the user to hand-write the matching solver-stack
typedef (test-qrkit.cpp:40-57); auto_qr runs the structure analysis itself
and must (a) pick the right stack on each canonical fixture and (b) satisfy
the standard solve contract through any composed permutations.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu import auto_qr
from qrkit_tpu.solvers import (
    BandedBlockedQR,
    BlockAngularQR,
    BlockDiagonalQR,
    BlockedThinDenseQR,
    DenseColPivQR,
    SegmentedBandedQR,
)

from generators import (
    block_angular_matrix,
    block_diagonal_matrix,
    overlapping_block_diagonal_matrix,
)


def _check_solve(qr, dense, rng, atol=1e-8):
    x_true = rng.normal(size=dense.shape[1])
    b = dense @ x_true
    pb = jnp.asarray(qr.rows_permutation().apply(b))  # Eigen P*v convention
    x = np.asarray(qr.solve(pb))
    assert np.allclose(dense @ x, b, atol=atol)


def test_auto_block_diagonal(rng):
    mat = block_diagonal_matrix(64, 224, rng, permute_rows=True)
    qr = auto_qr(mat)
    assert qr.selection == "block_diagonal"
    assert isinstance(qr, BlockDiagonalQR)
    _check_solve(qr, mat.to_dense(), rng)


def test_auto_banded(rng):
    mat = overlapping_block_diagonal_matrix(64, 224, rng, permute_rows=True)
    qr = auto_qr(mat, suggested_block_cols=4)
    assert qr.selection == "banded_blocked"
    assert isinstance(qr, BandedBlockedQR)
    _check_solve(qr, mat.to_dense(), rng)


def test_auto_banded_prefer_segmented(rng):
    mat = overlapping_block_diagonal_matrix(512, 1792, rng, permute_rows=False)
    qr = auto_qr(mat, suggested_block_cols=4, prefer_segmented=True,)
    assert qr.selection == "segmented_banded"
    assert isinstance(qr, SegmentedBandedQR)
    _check_solve(qr, mat.to_dense(), rng)


def test_auto_block_angular_split(rng):
    """Dense trailing columns over a banded body must trigger the automatic
    [A1 | A2] split, with the split permutation composed into
    cols_permutation so x comes back in the ORIGINAL column order."""
    mat = block_angular_matrix(64, 5, 224, rng)
    qr = auto_qr(mat, suggested_block_cols=4)
    assert qr.selection.startswith("block_angular(")
    _check_solve(qr, mat.to_dense(), rng)


def test_auto_block_angular_interleaved_dense_cols(rng):
    """Dense columns NOT at the trailing edge: the split permutation must
    still recover the original ordering."""
    base = block_angular_matrix(32, 3, 112, rng)
    # move the 3 dense columns to the front
    n = base.ncols
    perm_idx = np.concatenate([np.arange(32, n), np.arange(32)])
    from qrkit_tpu.sparse import Permutation

    mat = base.permute_cols(Permutation(np.argsort(perm_idx)))
    qr = auto_qr(mat, suggested_block_cols=4)
    assert qr.selection.startswith("block_angular(")
    _check_solve(qr, mat.to_dense(), rng)


def test_auto_dense_inputs(rng):
    tall = rng.normal(size=(200, 10))
    qr = auto_qr(tall)
    assert isinstance(qr, BlockedThinDenseQR)
    _check_solve(qr, tall, rng)

    small = rng.normal(size=(12, 9))
    qr = auto_qr(small)
    assert isinstance(qr, DenseColPivQR)
    _check_solve(qr, small, rng)


def test_auto_unstructured_sparse(rng):
    """A random tall sparse matrix with no block structure lands on the thin
    sparse solver (or dense colpiv) and still solves."""
    m, n = 120, 10
    nnzr = 3
    rows = np.repeat(np.arange(m), nnzr)
    cols = rng.integers(0, n, size=m * nnzr)
    vals = rng.normal(size=m * nnzr)
    from qrkit_tpu.sparse import SparseCSR

    mat = SparseCSR.from_triplets(rows, cols, vals, (m, n))
    qr = auto_qr(mat)
    _check_solve(qr, mat.to_dense(), rng)
