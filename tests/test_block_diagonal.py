"""Block-diagonal QR solver tests — reproduce reference test 0
(/root/reference/test/test-qrkit.cpp:167-206) plus extras the reference skips
(BLOCK_DIAGONAL_Q format, solve() itself, zero-tail rows)."""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.containers import BlockDiagonal
from qrkit_tpu.solvers import BlockDiagonalQR, QFormat

from generators import block_diagonal_matrix

NUM_VARS = 64
NUM_PARAMS = NUM_VARS * 2
NUM_RESIDUALS = NUM_VARS * 3 + NUM_VARS + NUM_VARS * 3  # 7 * NUM_VARS


@pytest.fixture
def spj(rng):
    return block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, permute_rows=False)


def test_full_q(spj, rng):
    blk = BlockDiagonal.from_block_diagonal_pattern(spj, 7, 2)
    qr = BlockDiagonalQR(QFormat.FULL_Q).compute(blk)

    dense = spj.to_dense()
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    perm = qr.cols_permutation()
    AP = dense[:, perm.indices]  # A * P

    # Q R == A P,  Qᵀ (A P) == R,  orthogonality
    assert np.allclose(Q @ R, AP, atol=1e-9)
    assert np.allclose(np.asarray(qr.apply_qt(jnp.asarray(AP))), R, atol=1e-9)
    assert np.allclose(Q.T @ Q, np.eye(Q.shape[0]), atol=1e-9)
    # FULL_Q gives globally upper-triangular R
    assert np.allclose(np.tril(R, -1), 0.0, atol=1e-12)

    # LS round trip: b = A x_true
    x_true = rng.normal(size=spj.ncols)
    b = dense @ x_true
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-8)


def test_block_diagonal_q(spj, rng):
    blk = BlockDiagonal.from_block_diagonal_pattern(spj, 7, 2)
    qr = BlockDiagonalQR(QFormat.BLOCK_DIAGONAL_Q).compute(blk)
    dense = spj.to_dense()
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    AP = dense[:, qr.cols_permutation().indices]
    assert np.allclose(Q @ R, AP, atol=1e-9)
    assert np.allclose(Q.T @ Q, np.eye(Q.shape[0]), atol=1e-9)
    # block-diagonal Q: nonzeros only inside the diagonal blocks
    mask = np.ones_like(Q, dtype=bool)
    for i in range(NUM_PARAMS // 2):
        mask[i * 7 : (i + 1) * 7, i * 7 : (i + 1) * 7] = False
    assert np.allclose(Q[mask], 0.0, atol=1e-12)


def test_no_pivot(spj, rng):
    blk = BlockDiagonal.from_block_diagonal_pattern(spj, 7, 2)
    qr = BlockDiagonalQR(QFormat.FULL_Q, pivot=False).compute(blk)
    assert qr.cols_permutation().is_identity()
    dense = spj.to_dense()
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(Q @ R, dense, atol=1e-9)
    x_true = rng.normal(size=spj.ncols)
    x = np.asarray(qr.solve(jnp.asarray(dense @ x_true)))
    assert np.allclose(x, x_true, atol=1e-8)


def test_zero_tail_rows(rng):
    # matrix with zero rows below the last block -> identity Q tail
    # (BlockDiagonalSparseQR.h:530-533)
    from qrkit_tpu.sparse import SparseCSR

    dense = np.zeros((25, 6))
    for i in range(3):
        dense[i * 7 : (i + 1) * 7, i * 2 : (i + 1) * 2] = rng.normal(size=(7, 2))
    mat = SparseCSR.from_dense(dense)
    blk = BlockDiagonal.from_block_diagonal_pattern(mat, 7, 2)
    qr = BlockDiagonalQR(QFormat.FULL_Q).compute(blk)
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    AP = dense[:, qr.cols_permutation().indices]
    assert np.allclose(Q @ R, AP, atol=1e-9)
    assert np.allclose(Q.T @ Q, np.eye(25), atol=1e-9)
    assert np.allclose(Q[21:, 21:], np.eye(4), atol=1e-12)


def test_landscape_supported(rng):
    """Wide (cols > rows) blocks factorize here — the reference hard-asserts
    on them (BlockDiagonalSparseQR.h:509-516); full coverage in
    test_landscape.py."""
    blk = BlockDiagonal.from_dense_batch(rng.normal(size=(4, 2, 3)))
    qr = BlockDiagonalQR().compute(blk)
    dense = blk.to_dense()
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(Q @ R, dense[:, qr.cols_permutation().indices], atol=1e-9)


def test_matrix_rhs(spj, rng):
    blk = BlockDiagonal.from_block_diagonal_pattern(spj, 7, 2)
    qr = BlockDiagonalQR(QFormat.FULL_Q).compute(blk)
    M = rng.normal(size=(spj.nrows, 5))
    Q = np.asarray(qr.matrix_q_dense())
    assert np.allclose(np.asarray(qr.apply_qt(jnp.asarray(M))), Q.T @ M, atol=1e-9)
    assert np.allclose(np.asarray(qr.apply_q(jnp.asarray(M))), Q @ M, atol=1e-9)


def test_validate_numerical_issue(rng):
    from qrkit_tpu.solvers import ComputationInfo

    blocks = rng.normal(size=(4, 7, 2))
    blocks[2, :, 1] = 0.0  # singular block -> zero diagonal in R
    blk = BlockDiagonal.from_dense_batch(blocks)
    qr = BlockDiagonalQR(QFormat.FULL_Q, pivot=False).compute(blk)
    # automatic detection straight after compute — no validate() call needed
    # (the reference's info() contract, BandedBlockedSparseQR.h:335)
    assert qr.info() == ComputationInfo.NUMERICAL_ISSUE
    assert qr.validate() == ComputationInfo.NUMERICAL_ISSUE

    blocks2 = rng.normal(size=(4, 7, 2))
    blk2 = BlockDiagonal.from_dense_batch(blocks2)
    qr2 = BlockDiagonalQR(QFormat.FULL_Q, pivot=False).compute(blk2)
    assert qr2.info() == ComputationInfo.SUCCESS
    assert qr2.validate() == ComputationInfo.SUCCESS


def test_info_numerical_issue_all_solvers(rng):
    """A singular input must flip info() to NUMERICAL_ISSUE after compute for
    every solver family (device-side health check, no dense R anywhere)."""
    from qrkit_tpu.solvers import (
        BandedBlockedQR,
        BlockedThinDenseQR,
        ComputationInfo,
        DenseHouseholderQR,
    )
    from qrkit_tpu.sparse import SparseCSR

    # dense: a rank-deficient tall matrix (exactly zero column -> zero pivot;
    # a merely *duplicated* column leaves a ~1e-16 pivot, which the exact-zero
    # health check deliberately ignores — that's validate(rtol)'s job)
    A = rng.normal(size=(10, 4))
    A[:, 3] = 0.0
    for solver in (DenseHouseholderQR(), BlockedThinDenseQR(2)):
        solver.compute(jnp.asarray(A))
        assert solver.info() == ComputationInfo.NUMERICAL_ISSUE, type(solver)
        ok = solver.__class__() if not isinstance(solver, BlockedThinDenseQR) else BlockedThinDenseQR(2)
        ok.compute(jnp.asarray(rng.normal(size=(10, 4))))
        assert ok.info() == ComputationInfo.SUCCESS

    # banded: zero out one block's columns
    from tests.generators import overlapping_block_diagonal_matrix

    spj = overlapping_block_diagonal_matrix(16, 56, rng, permute_rows=False)
    bad = SparseCSR(
        spj.shape,
        spj.indptr,
        spj.indices,
        np.where((spj.indices >= 6) & (spj.indices < 8), 0.0, spj.data),
    )  # explicit zeros: same pattern/plan, singular values
    qr = BandedBlockedQR(suggested_block_cols=2).compute(bad)
    assert qr.info() == ComputationInfo.NUMERICAL_ISSUE
    qr_ok = BandedBlockedQR(suggested_block_cols=2).compute(spj)
    assert qr_ok.info() == ComputationInfo.SUCCESS


def test_zero_tail_columns(rng):
    """ncols > nb*bc (zero tail columns): Q stays orthogonal, solve returns
    the basic solution with zeros on the tail."""
    nb, br, bc, tail = 4, 7, 2, 3
    blocks = rng.normal(size=(nb, br, bc))
    blk = BlockDiagonal(jnp.asarray(blocks), nb * br, nb * bc + tail)
    qr = BlockDiagonalQR(QFormat.FULL_Q, pivot=False).compute(blk)
    Q = np.asarray(qr.matrix_q_dense())
    assert np.allclose(Q.T @ Q, np.eye(nb * br), atol=1e-9)
    A = blk.to_dense()
    x_true = rng.normal(size=nb * bc + tail)
    x_true[nb * bc :] = 0.0  # tail columns are zero -> any value works; pick 0
    b = A @ x_true
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert x.shape == (nb * bc + tail,)
    assert np.allclose(x, x_true, atol=1e-9)
    # R reconstruction through the permuted system
    R = np.asarray(qr.matrix_r_dense())
    P = np.asarray(qr.cols_permutation().indices)
    assert np.allclose((Q @ R)[:, np.argsort(P)][:, : nb * bc], A[:, : nb * bc], atol=1e-9)


def test_from_sparse_matrix_nonuniform_raises(rng):
    """A valid block-diagonal matrix with non-uniform block heights must be
    rejected (the dense batch would misalign rows) and routed to the banded
    solver."""
    # blocks: 7x2 at (0,0), 9x2 at (7,2) -> non-uniform heights
    rows, cols, vals = [], [], []
    for r in range(7):
        for c in range(2):
            rows.append(r); cols.append(c); vals.append(rng.uniform(0.5, 5.0))
    for r in range(9):
        for c in range(2):
            rows.append(7 + r); cols.append(2 + c); vals.append(rng.uniform(0.5, 5.0))
    sp = __import__("qrkit_tpu.sparse", fromlist=["SparseCSR"]).SparseCSR.from_triplets(
        rows, cols, vals, (16, 4)
    )
    with pytest.raises(ValueError, match="BandedBlockedQR"):
        BlockDiagonal.from_sparse_matrix(sp, suggested_block_cols=2)


def test_from_sparse_matrix_detection(rng):
    # SparseBlockDiagonal::fromSparseMatrix analog: detect blocks in a
    # row-shuffled matrix, factorize with the returned row permutation
    spj = block_diagonal_matrix(64, 224, rng, permute_rows=True)
    blk, perm = BlockDiagonal.from_sparse_matrix(spj, suggested_block_cols=2)
    assert blk.num_blocks == 32
    qr = BlockDiagonalQR(QFormat.FULL_Q).compute(blk, row_perm=perm)
    dense = spj.to_dense()
    x_true = rng.normal(size=spj.ncols)
    b = qr.rows_permutation().apply(dense @ x_true)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-8)
