"""Landscape (cols > rows per block) QR — capability the reference lacks.

The reference hard-asserts on landscape blocks
(/root/reference/src/QRKit/BlockDiagonalSparseQR.h:509-516, "Landscape blocks
are not supported"); here each wide block yields a full [br, br] Q and a wide
upper-trapezoidal R, and solve() returns the rank-masked basic least-squares
solution (x supported on the leading pivot columns).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.containers import BlockDiagonal
from qrkit_tpu.solvers import (
    BlockDiagonalQR,
    ComputationInfo,
    DenseColPivQR,
    DenseHouseholderQR,
    QFormat,
)

NB, BR, BC = 6, 3, 5


@pytest.fixture
def blk(rng):
    return BlockDiagonal.from_dense_batch(rng.normal(size=(NB, BR, BC)))


@pytest.mark.parametrize("pivot", [False, True])
@pytest.mark.parametrize("fmt", [QFormat.FULL_Q, QFormat.BLOCK_DIAGONAL_Q])
def test_landscape_reconstruction(blk, pivot, fmt):
    qr = BlockDiagonalQR(fmt, pivot=pivot).compute(blk)
    dense = blk.to_dense()
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    AP = dense[:, qr.cols_permutation().indices]
    assert np.allclose(Q @ R, AP, atol=1e-9)
    assert np.allclose(Q.T @ Q, np.eye(Q.shape[0]), atol=1e-9)
    # stacked landscape R rows are globally upper-triangular in both formats
    assert np.allclose(np.tril(R, -1), 0.0, atol=1e-12)
    assert qr.info() == ComputationInfo.SUCCESS


@pytest.mark.parametrize("pivot", [False, True])
def test_landscape_solve_consistent(blk, pivot):
    """A consistent underdetermined system must be solved exactly (zero
    residual); the basic solution is supported on <= rank columns."""
    qr = BlockDiagonalQR(pivot=pivot).compute(blk)
    dense = blk.to_dense()
    rng = np.random.default_rng(7)
    x_true = rng.normal(size=NB * BC)
    b = dense @ x_true
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(dense @ x, b, atol=1e-8)
    if pivot:
        assert np.sum(np.abs(x) > 1e-12) <= NB * BR


def test_landscape_rank_and_sparse_exports(blk):
    qr = BlockDiagonalQR(pivot=True).compute(blk)
    assert qr.rank == NB * BR  # random wide blocks: full row rank
    dense_R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(qr.matrix_r_sparse().to_dense(), dense_R, atol=0)
    Qs = qr.matrix_q_sparse().to_dense()
    assert np.allclose(Qs, np.asarray(qr.matrix_q_dense()), atol=1e-9)


def test_landscape_rank_deficient_block(rng):
    """A singular wide block: pivoting reports the exact rank and the solve
    still minimizes the residual over the pivot support."""
    blocks = rng.normal(size=(NB, BR, BC))
    blocks[2, 2, :] = blocks[2, 0, :] + blocks[2, 1, :]  # row-rank 2 block
    blk = BlockDiagonal.from_dense_batch(blocks)
    qr = BlockDiagonalQR(pivot=True).compute(blk)
    assert qr.rank == NB * BR - 1
    dense = blk.to_dense()
    b = rng.normal(size=NB * BR)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    # optimal residual from dense lstsq
    x_opt, *_ = np.linalg.lstsq(dense, b, rcond=None)
    assert np.linalg.norm(dense @ x - b) <= np.linalg.norm(dense @ x_opt - b) + 1e-8


def test_landscape_zero_tail_rows(rng):
    """nrows > nb*br: identity Q tail passes the extra rows through."""
    blocks = rng.normal(size=(4, 2, 3))
    blk = BlockDiagonal(jnp.asarray(blocks), nrows=4 * 2 + 3, ncols=4 * 3)
    qr = BlockDiagonalQR().compute(blk)
    dense = np.zeros((11, 12))
    for i in range(4):
        dense[i * 2 : (i + 1) * 2, i * 3 : (i + 1) * 3] = blocks[i]
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(Q @ R, dense[:, qr.cols_permutation().indices], atol=1e-9)
    assert np.allclose(Q[8:, 8:], np.eye(3), atol=1e-12)


@pytest.mark.parametrize("solver_cls", [DenseHouseholderQR, DenseColPivQR])
def test_dense_wide_solve(rng, solver_cls):
    """Dense solvers on a wide matrix: exact solve of a consistent system."""
    A = rng.normal(size=(8, 13))
    x_true = rng.normal(size=13)
    b = A @ x_true
    qr = solver_cls().compute(jnp.asarray(A))
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(A @ x, b, atol=1e-8)
    R = np.asarray(qr.matrix_r_dense())
    Q = np.asarray(qr.matrix_q_dense())
    AP = A[:, qr.cols_permutation().indices]
    assert np.allclose(Q @ R, AP, atol=1e-9)
    if solver_cls is DenseColPivQR:
        assert qr.rank == 8
