"""Rank-deficiency handling across every ColPiv-capable solver.

The reference tracks zero-pivot columns into a Householder permutation and
keeps factorizing (/root/reference/src/QRKit/BlockedThinSparseQR.h:150-159,
251-256) but never tests the behavior; SURVEY §4 calls out rank-deficient
inputs as a gap to close.  Contract verified here: ``rank()`` is exact, and
``solve()`` returns a *basic* solution whose residual matches the true
least-squares optimum (np.linalg.lstsq) on singular Jacobians.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.containers import BlockDiagonal
from qrkit_tpu.solvers import (
    BlockDiagonalQR,
    BlockedThinSparseQR,
    DenseColPivQR,
    QFormat,
)
from qrkit_tpu.sparse import SparseCSR


def _residual(A, x, b):
    return np.linalg.norm(A @ np.asarray(x) - b)


def _optimal_residual(A, b):
    x, *_ = np.linalg.lstsq(A, b, rcond=None)
    return np.linalg.norm(A @ x - b)


def test_dense_colpiv_rank_deficient(rng):
    A = rng.normal(size=(20, 6))
    A[:, 4] = A[:, 1]          # duplicated column
    A[:, 5] = 0.0              # zero column
    b = rng.normal(size=20)
    qr = DenseColPivQR().compute(jnp.asarray(A))
    assert qr.rank == 4
    # rank deficiency is a reported condition for a rank-revealing solver,
    # NOT a numerical issue (Eigen's info() contract)
    from qrkit_tpu.solvers import ComputationInfo
    assert qr.info() == ComputationInfo.SUCCESS
    x = qr.solve(jnp.asarray(b))
    assert np.isfinite(np.asarray(x)).all()
    assert _residual(A, x, b) <= _optimal_residual(A, b) * (1 + 1e-8)


def test_block_diagonal_pivot_rank_deficient(rng):
    nb, br, bc = 5, 7, 3
    blocks = rng.normal(size=(nb, br, bc))
    blocks[2, :, 2] = blocks[2, :, 0]      # singular block: duplicated column
    blocks[4, :, :] = 0.0                  # entirely zero block
    blk = BlockDiagonal.from_dense_batch(blocks)
    qr = BlockDiagonalQR(QFormat.FULL_Q, pivot=True).compute(blk)
    from qrkit_tpu.solvers import ComputationInfo
    assert qr.info() == ComputationInfo.SUCCESS
    assert qr.rank == nb * bc - 1 - bc
    A = blk.to_dense()
    b = rng.normal(size=nb * br)
    x = qr.solve(jnp.asarray(b))
    assert np.isfinite(np.asarray(x)).all()
    assert _residual(A, x, b) <= _optimal_residual(A, b) * (1 + 1e-8)
    # healthy neighbours are untouched: block 0's sub-solution is exact
    x0, *_ = np.linalg.lstsq(A[:br, :bc], b[:br], rcond=None)
    assert np.allclose(np.asarray(x)[:bc], x0, atol=1e-9)


def test_blocked_thin_sparse_rank_deficient(rng):
    m, n = 40, 8
    A = rng.normal(size=(m, n))
    A[:, 6] = A[:, 2]          # duplicate in a different panel
    A[:, 7] = 2.0 * A[:, 0]    # scaled duplicate
    b = rng.normal(size=m)
    qr = BlockedThinSparseQR(suggested_block_cols=3).compute(
        SparseCSR.from_dense(A)
    )
    assert qr.rank == 6
    from qrkit_tpu.solvers import ComputationInfo
    assert qr.info() == ComputationInfo.SUCCESS
    # deficient columns identified and pushed to the back of the house perm
    dead = set(int(c) for c in qr.deficient_cols())
    assert len(dead) == 2
    assert dead <= {0, 2, 6, 7}  # each dead col is one member of a dependent pair
    x = qr.solve(jnp.asarray(b))
    assert np.isfinite(np.asarray(x)).all()
    assert _residual(A, x, b) <= _optimal_residual(A, b) * (1 + 1e-8)
    # Q R still reconstructs A P (factorization itself is untouched)
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    P = np.asarray(qr.cols_permutation().indices)
    assert np.allclose((Q @ R)[:, np.argsort(P)], A, atol=1e-8)


def test_blocked_thin_sparse_full_rank_unchanged(rng):
    # the fast path must stay exact on full-rank input
    m, n = 30, 6
    A = rng.normal(size=(m, n))
    x_true = rng.normal(size=n)
    b = A @ x_true
    qr = BlockedThinSparseQR(suggested_block_cols=2).compute(
        SparseCSR.from_dense(A)
    )
    assert qr.rank == n
    assert qr.house_cols_permutation().is_identity()
    x = qr.solve(jnp.asarray(b))
    assert np.allclose(np.asarray(x), x_true, atol=1e-8)
