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

from generators import (
    block_angular_matrix,
    block_diagonal_matrix,
    overlapping_block_diagonal_matrix,
)

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


def _sparse_a2_problem(rng, nb, m2, density, tail_rows=0):
    """Block-diagonal left (3x1 blocks) + wide sparse A2."""
    br, bc = 3, 1
    n1 = nb * br + tail_rows
    blocks = rng.uniform(0.5, 5.0, size=(nb, br, bc))
    blk = BlockDiagonal(jnp.asarray(blocks), n1, nb * bc)
    nnz = max(int(n1 * m2 * density), m2 + 1)
    rows = rng.integers(0, n1, size=nnz)
    cols = rng.integers(0, m2, size=nnz)
    # make sure every column has at least one entry (full column rank w.h.p.)
    rows = np.concatenate([rows, rng.integers(0, n1, size=m2)])
    cols = np.concatenate([cols, np.arange(m2)])
    vals = rng.normal(size=rows.size)
    a2 = SparseCSR.from_triplets(rows, cols, vals, (n1, m2))
    return blk, a2


def test_block_angular_sparse_a2_matches_dense_path(rng):
    # small instance: the sparse-A2 path must agree with the dense path exactly
    blk, a2 = _sparse_a2_problem(rng, nb=40, m2=6, density=0.05)
    qr_sp = BlockAngularQR(BlockDiagonalQR(pivot=False), DenseColPivQR()).compute(
        BlockMatrix1x2(blk, a2)
    )
    assert qr_sp._r12_coo is not None  # sparse path actually taken
    qr_d = BlockAngularQR(BlockDiagonalQR(pivot=False), DenseColPivQR()).compute(
        BlockMatrix1x2(blk, jnp.asarray(a2.to_dense()))
    )
    A = np.concatenate([blk.to_dense(), a2.to_dense()], axis=1)
    x_true = rng.normal(size=A.shape[1])
    b = A @ x_true
    x_sp = np.asarray(qr_sp.solve(jnp.asarray(b)))
    x_d = np.asarray(qr_d.solve(jnp.asarray(b)))
    assert np.allclose(x_sp, x_true, atol=1e-8)
    assert np.allclose(x_sp, x_d, atol=1e-8)
    # factorization identity on the sparse path (R may differ from the dense
    # path only by Householder sign choices after the row-subset reordering)
    pA = qr_sp.rows_permutation().apply(A)
    pAP = pA[:, qr_sp.cols_permutation().indices]
    R = np.asarray(qr_sp.matrix_r_dense())
    QtAP = np.asarray(qr_sp.apply_qt(jnp.asarray(pAP)))
    assert np.allclose(QtAP, R, atol=1e-8), np.abs(QtAP - R).max()
    # Qᵀ round trip through the row-subset right solver
    v = rng.normal(size=blk.nrows)
    vv = np.asarray(qr_sp.apply_q(qr_sp.apply_qt(jnp.asarray(v))))
    assert np.allclose(vv, v, atol=1e-9)


def test_block_angular_sparse_a2_wide_onnz(rng):
    # wide sparse A2 (the reference's sparse QProduct case): peak memory must
    # track nnz — the right solver sees only the nonzero bottom rows, and
    # J2-top/r12 stay sparse (no [n1, m2] or [m1, m2] dense arrays).
    nb, m2 = 5000, 64
    blk, a2 = _sparse_a2_problem(rng, nb=nb, m2=m2, density=0.001)
    from qrkit_tpu.solvers import DenseHouseholderQR

    qr = BlockAngularQR(BlockDiagonalQR(pivot=False), DenseHouseholderQR()).compute(
        BlockMatrix1x2(blk, a2)
    )
    assert qr._r12_coo is not None
    # right solver factored a nnz-proportional row subset, not all bottom rows
    n_bottom = blk.nrows - blk.ncols
    assert qr.right._k <= 3 * a2.nnz + m2
    assert qr.right._k < n_bottom // 3
    # consistency: exact solve on a consistent system, no dense A ever formed
    x_true = rng.normal(size=blk.ncols + m2)
    b1 = np.einsum(
        "bij,bj->bi", np.asarray(blk.blocks), x_true[: blk.ncols].reshape(nb, 1)
    ).reshape(-1)
    b = b1 + a2.to_dense() @ x_true[blk.ncols :]  # a2 dense here is test-only
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-6), np.abs(x - x_true).max()


def test_block_angular_matrix_rhs(spj, rng):
    qr = BlockAngularQR(
        BandedBlockedQR(suggested_block_cols=8), DenseColPivQR()
    ).compute(_split(spj, NUM_ANGULAR))
    M = jnp.asarray(rng.normal(size=(spj.nrows, 3)))
    out_t = np.asarray(qr.apply_qt(M))
    back = np.asarray(qr.apply_q(jnp.asarray(out_t)))
    assert np.allclose(back, np.asarray(M), atol=1e-8)


def test_banded_left_sparse_a2_keeps_sparse(rng):
    """Banded left solver x sparse A2: the chunked keep-sparse solveRightBlock
    (the reference's sparse QProduct role, BandedBlockedSparseQR.h:693/722)
    must engage — no dense [n1, m2] A2 copy — and solve correctly."""
    left_sp = overlapping_block_diagonal_matrix(64, 224, rng, permute_rows=True)
    n1 = left_sp.nrows
    m2 = 6
    # sparse A2: each row touches at most 2 of the m2 columns
    a2_rows, a2_cols, a2_vals = [], [], []
    for i in range(n1):
        for j in rng.choice(m2, size=2, replace=False):
            a2_rows.append(i)
            a2_cols.append(int(j))
            a2_vals.append(rng.normal())
    a2 = SparseCSR.from_triplets(a2_rows, a2_cols, a2_vals, (n1, m2))

    qr = BlockAngularQR(BandedBlockedQR(suggested_block_cols=2), DenseColPivQR())
    qr.compute(BlockMatrix1x2(left_sp, a2))
    assert qr._r12_coo is not None, "chunked sparse-A2 path must engage"

    dense = np.concatenate([left_sp.to_dense(), a2.to_dense()], axis=1)
    x_true = rng.normal(size=dense.shape[1])
    b = qr.rows_permutation().apply(dense @ x_true)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-7), np.abs(x - x_true).max()

    # repeated compute on the same pattern (the LM shape) reuses the plans
    assert "rowsubset" in qr.right._plan_cache
    a2b = SparseCSR(a2.shape, a2.indptr, a2.indices, a2.data * 1.5)
    qr.compute(BlockMatrix1x2(left_sp, a2b))
    b2 = qr.rows_permutation().apply(
        np.concatenate([left_sp.to_dense(), a2b.to_dense()], axis=1) @ x_true
    )
    x2 = np.asarray(qr.solve(jnp.asarray(b2)))
    assert np.allclose(x2, x_true, atol=1e-7)


def test_blockdiag_sparse_a2_plan_cache_reuse(rng):
    """Same-pattern recompute of the block-diagonal sparse-A2 path must reuse
    the cached pattern bookkeeping (and stay correct when values change)."""
    blocks = rng.uniform(0.5, 5.0, size=(16, 7, 2))
    blk = BlockDiagonal.from_dense_batch(jnp.asarray(blocks))
    n1 = blk.nrows
    m2 = 4
    rows = np.arange(n1)
    cols = rng.integers(0, m2, size=n1)
    vals = rng.normal(size=n1)
    a2 = SparseCSR.from_triplets(rows, cols, vals, (n1, m2))
    qr = BlockAngularQR(BlockDiagonalQR(pivot=False), DenseColPivQR())
    qr.compute(BlockMatrix1x2(blk, a2))
    plan1 = qr._plan_cache.get("blockdiag_a2")
    assert plan1 is not None
    a2b = SparseCSR(a2.shape, a2.indptr, a2.indices, vals * 2.0)
    qr.compute(BlockMatrix1x2(blk, a2b))
    assert qr._plan_cache.get("blockdiag_a2") is plan1, "plan must be reused"
    dense = np.concatenate([blk.to_dense(), a2b.to_dense()], axis=1)
    x_true = rng.normal(size=dense.shape[1])
    x = np.asarray(qr.solve(jnp.asarray(dense @ x_true)))
    assert np.allclose(x, x_true, atol=1e-8)


@pytest.mark.parametrize(
    "right_cls,tail", [(DenseColPivQR, 0), (DenseColPivQR, 7), ("house", 3)]
)
def test_block_angular_fused_dense_matches_generic(rng, right_cls, tail):
    """The one-dispatch fused dense-A2 program (block_angular_fused) is
    behavior-identical to the generic composition: same solution, same R,
    same composed column permutation — including identity-Q pass-through
    tail rows and both right solvers."""
    from qrkit_tpu.solvers import DenseHouseholderQR
    from qrkit_tpu.solvers.block_diagonal import QFormat

    if right_cls == "house":
        right_cls = DenseHouseholderQR
    N, br, bc, m2 = 80, 3, 2, 5
    nrows = N * br + tail
    blocks = jnp.asarray(rng.normal(size=(N, br, bc)))
    a2 = jnp.asarray(rng.normal(size=(nrows, m2)))
    b = jnp.asarray(rng.normal(size=nrows))
    blk = BlockDiagonal(blocks, nrows, N * bc)

    qf = BlockAngularQR(BlockDiagonalQR(QFormat.FULL_Q, pivot=False), right_cls())
    qf.compute(BlockMatrix1x2(blk, a2))
    assert qf._fused_dense

    qg = BlockAngularQR(BlockDiagonalQR(QFormat.FULL_Q, pivot=False), right_cls())
    qg._uses_fused_dense = lambda mat: False  # force the generic path
    qg.compute(BlockMatrix1x2(blk, a2))
    assert not qg._fused_dense

    assert str(qf.info()) == "ComputationInfo.SUCCESS"
    np.testing.assert_allclose(
        np.asarray(qf.solve(b)), np.asarray(qg.solve(b)), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(qf.matrix_r_dense()),
        np.asarray(qg.matrix_r_dense()),
        atol=1e-10,
    )
    assert np.array_equal(
        qf.cols_permutation().indices, qg.cols_permutation().indices
    )
    # matrix RHS falls back to the generic composition on the same state
    B = jnp.asarray(np.asarray(rng.normal(size=(nrows, 3))))
    np.testing.assert_allclose(
        np.asarray(qf.solve(B)), np.asarray(qg.solve(B)), atol=1e-10
    )
