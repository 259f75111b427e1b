"""Block-angular composition tests — reproduce reference tests 4-6
(/root/reference/test/test-qrkit.cpp:260-362): banded left solver composed with
three different right solvers (dense ColPiv, blocked-thin dense, blocked-thin
sparse), plus a block-diagonal left (the ellipse-fitting stack,
examples/ellipse_fitting.cpp:116-147)."""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.containers import BlockDiagonal, BlockMatrix1x2
from qrkit_tpu.solvers import (
    BandedBlockedQR,
    BlockAngularQR,
    BlockDiagonalQR,
    BlockedThinDenseQR,
    BlockedThinSparseQR,
    DenseColPivQR,
)
from qrkit_tpu.sparse import SparseCSR

from generators import block_angular_matrix, block_diagonal_matrix

NUM_VARS = 64
NUM_PARAMS = NUM_VARS * 2
NUM_RESIDUALS = NUM_VARS * 7
NUM_ANGULAR = 24


@pytest.fixture
def spj(rng):
    return block_angular_matrix(NUM_PARAMS, NUM_ANGULAR, NUM_RESIDUALS, rng)


def _split(spj, num_angular, right_sparse=False):
    left = spj.slice_cols(0, spj.ncols - num_angular)
    if right_sparse:
        right = spj.slice_cols(spj.ncols - num_angular, num_angular)
    else:
        right = jnp.asarray(
            spj.block_dense(0, spj.ncols - num_angular, spj.nrows, num_angular)
        )
    return BlockMatrix1x2(left, right)


def _check(qr, spj, rng, atol=1e-7):
    dense = spj.to_dense()
    x_true = rng.normal(size=spj.ncols)
    b = qr.rows_permutation().apply(dense @ x_true)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=atol), np.abs(x - x_true).max()

    # full factorization identity: Qᵀ P_r A P_c == R
    pA = qr.rows_permutation().apply(dense)
    pAP = pA[:, qr.cols_permutation().indices]
    R = np.asarray(qr.matrix_r_dense())
    QtAP = np.asarray(qr.apply_qt(jnp.asarray(pAP)))
    assert np.allclose(QtAP, R, atol=atol), np.abs(QtAP - R).max()

    # Q orthogonality via apply_q/apply_qt round trip
    v = rng.normal(size=spj.nrows)
    vv = np.asarray(qr.apply_q(qr.apply_qt(jnp.asarray(v))))
    assert np.allclose(vv, v, atol=atol)


def test_block_angular_colpiv_right(spj, rng):
    # reference test 4: banded left + dense ColPiv right
    qr = BlockAngularQR(
        BandedBlockedQR(suggested_block_cols=8), DenseColPivQR()
    ).compute(_split(spj, NUM_ANGULAR))
    _check(qr, spj, rng)


def test_block_angular_thin_dense_right(spj, rng):
    # reference test 5: banded left + blocked thin dense right
    qr = BlockAngularQR(
        BandedBlockedQR(suggested_block_cols=8), BlockedThinDenseQR(2)
    ).compute(_split(spj, NUM_ANGULAR))
    _check(qr, spj, rng)


def test_block_angular_thin_sparse_right(spj, rng):
    # reference test 6: banded left + blocked thin sparse right
    qr = BlockAngularQR(
        BandedBlockedQR(suggested_block_cols=8), BlockedThinSparseQR(2)
    ).compute(_split(spj, NUM_ANGULAR))
    _check(qr, spj, rng)


def test_block_angular_blockdiag_left(rng):
    # the ellipse-fitting stack: block-diagonal left + dense ColPiv right
    nvars = 48
    nparams = nvars * 2
    nres = nvars * 7
    nang = 5
    left_sp = block_diagonal_matrix(nparams, nres, rng, permute_rows=False)
    right = rng.normal(size=(nres, nang))
    dense = np.concatenate([left_sp.to_dense(), right], axis=1)
    spj = SparseCSR.from_dense(dense)

    blk = BlockDiagonal.from_block_diagonal_pattern(left_sp, 7, 2)
    mat = BlockMatrix1x2(blk, jnp.asarray(right))
    left_solver = BlockDiagonalQR()
    qr = BlockAngularQR(left_solver, DenseColPivQR()).compute(mat)
    _check(qr, spj, rng)


def test_block_angular_matrix_rhs(spj, rng):
    qr = BlockAngularQR(
        BandedBlockedQR(suggested_block_cols=8), DenseColPivQR()
    ).compute(_split(spj, NUM_ANGULAR))
    M = jnp.asarray(rng.normal(size=(spj.nrows, 3)))
    out_t = np.asarray(qr.apply_qt(M))
    back = np.asarray(qr.apply_q(jnp.asarray(out_t)))
    assert np.allclose(back, np.asarray(M), atol=1e-8)
