"""Matrix (multi-)RHS solve — Eigen's ``solve()`` accepts matrix RHS.

``solve(B)`` with B [rows, k] must equal per-column vector solves on every
solver family: one batched Qᵀ application plus a vmapped structured
triangular solve (base.QRSolver.solve).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.containers import BlockDiagonal, BlockMatrix1x2
from qrkit_tpu.solvers import (
    BandedBlockedQR,
    BlockAngularQR,
    BlockDiagonalQR,
    BlockedThinSparseQR,
    DenseColPivQR,
    SegmentedBandedQR,
)

from generators import (
    block_angular_matrix,
    block_diagonal_matrix,
    overlapping_block_diagonal_matrix,
)

K = 4


def _check_multi_rhs(qr, mat_dense, rng, atol=1e-8):
    B = jnp.asarray(rng.normal(size=(mat_dense.shape[0], K)))
    X = np.asarray(qr.solve(B))
    assert X.shape == (mat_dense.shape[1], K)
    for j in range(K):
        xj = np.asarray(qr.solve(B[:, j]))
        assert np.allclose(X[:, j], xj, atol=atol), np.abs(X[:, j] - xj).max()


def test_multi_rhs_block_diagonal(rng):
    mat = block_diagonal_matrix(40, 140, rng, permute_rows=False)
    qr = BlockDiagonalQR().compute(BlockDiagonal.from_block_diagonal_pattern(mat, 7, 2))
    _check_multi_rhs(qr, mat.to_dense(), rng)


def test_multi_rhs_banded(rng):
    mat = overlapping_block_diagonal_matrix(40, 140, rng, permute_rows=False)
    qr = BandedBlockedQR(suggested_block_cols=4).compute(mat)
    _check_multi_rhs(qr, mat.to_dense(), rng)


def test_multi_rhs_segmented(rng):
    mat = overlapping_block_diagonal_matrix(512, 1792, rng, permute_rows=False)
    qr = SegmentedBandedQR(suggested_block_cols=4, segment_blocks=16).compute(mat)
    assert qr._delegate is None
    _check_multi_rhs(qr, mat.to_dense(), rng)


def test_multi_rhs_segmented_fused_vs_protocol(rng):
    """The fused one-dispatch matrix-RHS program (k ≤ 16) matches the
    protocol-default path, never falls back to eager applies, and the wide
    (k > 16) route still agrees column-for-column."""
    from qrkit_tpu.solvers.base import QRSolver

    mat = overlapping_block_diagonal_matrix(512, 1792, rng, permute_rows=False)
    qr = SegmentedBandedQR(suggested_block_cols=4, segment_blocks=16).compute(mat)
    assert qr._delegate is None
    B = jnp.asarray(rng.normal(size=(mat.shape[0], 20)))
    Xp = np.asarray(QRSolver.solve(qr, B[:, :8]))  # protocol (eager) path
    # the fused path must not touch the eager protocol machinery at all
    def _boom(*a, **k):
        raise AssertionError("fused matrix solve fell back to eager apply_qt")
    orig = qr.apply_qt
    qr.apply_qt = _boom
    try:
        Xf = np.asarray(qr.solve(B[:, :8]))
    finally:
        qr.apply_qt = orig
    assert np.allclose(Xf, Xp, atol=1e-8), np.abs(Xf - Xp).max()
    Xw = np.asarray(qr.solve(B))  # k > 16: protocol fallback, same answers
    assert np.allclose(Xw[:, :8], Xp, atol=1e-8)


def test_multi_rhs_block_angular(rng):
    mat = block_angular_matrix(32, 3, 112, rng)
    left = mat.slice_cols(0, 32)
    right = mat.hstack_dense_block(32, 3)
    qr = BlockAngularQR(
        BandedBlockedQR(suggested_block_cols=4), DenseColPivQR()
    ).compute(BlockMatrix1x2(left, right))
    _check_multi_rhs(qr, mat.to_dense(), rng)


def test_multi_rhs_thin_sparse(rng):
    mat = block_diagonal_matrix(20, 70, rng, permute_rows=True)
    qr = BlockedThinSparseQR(suggested_block_cols=4).compute(mat)
    _check_multi_rhs(qr, mat.to_dense(), rng)


def test_multi_rhs_landscape(rng):
    blk = BlockDiagonal.from_dense_batch(rng.normal(size=(5, 2, 3)))
    qr = BlockDiagonalQR(pivot=True).compute(blk)
    _check_multi_rhs(qr, blk.to_dense(), rng)
