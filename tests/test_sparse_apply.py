"""Sparse-operand implicit-Q products (the reference's sparse QProduct,
BandedBlockedSparseQR.h:693-700 / :722-729) and the plan-cached fused
solveRightBlock for banded/segmented left solvers
(BlockAngularSparseQR.h:360-397).

Parity oracle: the dense apply on the same factorization.  The structural
fill must be a superset of the numeric nonzeros; pruning makes nnz match the
dense path exactly on generic data.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.containers import BlockMatrix1x2
from qrkit_tpu.solvers import (
    BandedBlockedQR,
    BlockAngularQR,
    DenseColPivQR,
    DenseHouseholderQR,
    SegmentedBandedQR,
)
from qrkit_tpu.sparse import SparseCSR

from generators import block_angular_matrix, overlapping_block_diagonal_matrix


def _sparse_operand(rng, m, m2=7):
    """A few 5-nnz columns plus one spread column (exercises both early- and
    late-triggering fill)."""
    r_, c_, v_ = [], [], []
    for j in range(m2 - 1):
        nzr = rng.choice(m, size=5, replace=False)
        r_.extend(nzr)
        c_.extend([j] * 5)
        v_.extend(rng.normal(size=5))
    spread = list(range(0, m, 3))
    r_.extend(spread)
    c_.extend([m2 - 1] * len(spread))
    v_.extend(rng.normal(size=len(spread)))
    return SparseCSR.from_triplets(r_, c_, v_, (m, m2))


@pytest.mark.parametrize("permute", [False, True])
def test_banded_sparse_qproduct(rng, permute):
    mat = overlapping_block_diagonal_matrix(96, 336, rng, permute_rows=permute)
    qr = BandedBlockedQR(suggested_block_cols=4).compute(mat)
    S = _sparse_operand(rng, mat.nrows)
    for fn, dense_fn in (
        (qr.apply_qt_sparse, qr.apply_qt),
        (qr.apply_q_sparse, qr.apply_q),
    ):
        out = fn(S)
        ref = np.asarray(dense_fn(jnp.asarray(S.to_dense())))
        assert np.abs(out.to_dense() - ref).max() < 1e-10
        assert out.nnz == int((np.abs(ref) > 0).sum())


def test_segmented_sparse_qproduct(rng):
    mat = overlapping_block_diagonal_matrix(96, 336, rng, permute_rows=False)
    qr = SegmentedBandedQR(
        suggested_block_cols=4, segment_blocks=8, fallback=False
    ).compute(mat)
    S = _sparse_operand(rng, mat.nrows)
    for fn, dense_fn in (
        (qr.apply_qt_sparse, qr.apply_qt),
        (qr.apply_q_sparse, qr.apply_q),
    ):
        out = fn(S)
        ref = np.asarray(dense_fn(jnp.asarray(S.to_dense())))
        assert np.abs(out.to_dense() - ref).max() < 1e-10
        assert out.nnz == int((np.abs(ref) > 0).sum())


def test_sparse_qproduct_plan_cache_reuse(rng):
    """Second product on the same operand layout reuses the cached plan and
    issues no eager dense applies."""
    mat = overlapping_block_diagonal_matrix(64, 224, rng, permute_rows=False)
    qr = BandedBlockedQR(suggested_block_cols=4).compute(mat)
    S = _sparse_operand(rng, mat.nrows)
    out1 = qr.apply_qt_sparse(S)
    ent = qr._sparse_apply_cache[True]
    S2 = SparseCSR(S.shape, S.indptr, S.indices, S.data * 2.0)
    S2._fp_memo = S.pattern_fingerprint()

    def boom(*a, **k):
        raise AssertionError("sparse product fell back to eager apply")

    orig = qr.apply_qt
    qr.apply_qt = boom
    try:
        out2 = qr.apply_qt_sparse(S2)
    finally:
        qr.apply_qt = orig
    assert qr._sparse_apply_cache[True] is ent
    assert np.abs(out2.to_dense() - 2.0 * out1.to_dense()).max() < 1e-10


def test_protocol_default_sparse_qproduct(rng):
    """The base-protocol default (densify + prune) on a dense solver."""
    A = rng.normal(size=(12, 6))
    qr = DenseHouseholderQR().compute(jnp.asarray(A))
    S = SparseCSR.from_dense(np.where(rng.random((12, 4)) < 0.3, 1.0, 0.0))
    out = qr.apply_qt_sparse(S)
    ref = np.asarray(qr.apply_qt(jnp.asarray(S.to_dense())))
    assert np.abs(out.to_dense() - ref).max() < 1e-10


@pytest.mark.parametrize("left_kind", ["banded", "segmented"])
def test_block_angular_sparse_a2_fused(rng, left_kind):
    """Banded/segmented-left sparse-A2 solveRightBlock: plan-cached, fused,
    O(1) dispatches on recompute (VERDICT r2 item 1)."""

    def mkleft():
        if left_kind == "banded":
            return BandedBlockedQR(suggested_block_cols=4)
        return SegmentedBandedQR(
            suggested_block_cols=4, segment_blocks=8, fallback=False
        )

    npar, nang = 96, 5
    mat = block_angular_matrix(npar, nang, 7 * (npar // 2), rng)
    left_m = mat.slice_cols(0, npar)
    dense_r = mat.hstack_dense_block(npar, nang)
    right_sp = SparseCSR.from_dense(
        np.where(rng.random(dense_r.shape) < 0.4, dense_r, 0.0)
    )
    Ad = np.concatenate([left_m.to_dense(), right_sp.to_dense()], axis=1)
    b = rng.normal(size=Ad.shape[0])
    xref = np.linalg.lstsq(Ad, b, rcond=None)[0]

    qr = BlockAngularQR(mkleft(), DenseColPivQR())
    qr.compute(BlockMatrix1x2(left_m, right_sp))
    bp = np.empty_like(b)
    bp[np.asarray(qr.rows_permutation().indices)] = b
    x = np.asarray(qr.solve(jnp.asarray(bp)))
    assert np.abs(x - xref).max() < 1e-9

    # dense-A2 cross-check: identical solution
    qr_d = BlockAngularQR(mkleft(), DenseColPivQR())
    qr_d.compute(BlockMatrix1x2(left_m, right_sp.to_dense()))
    bp_d = np.empty_like(b)
    bp_d[np.asarray(qr_d.rows_permutation().indices)] = b
    x_d = np.asarray(qr_d.solve(jnp.asarray(bp_d)))
    assert np.abs(x - x_d).max() < 1e-9

    # recompute on the same layout: cached plan, no eager applies
    ent = qr._plan_cache.get("banded_a2")
    assert ent is not None
    a2b = SparseCSR(
        right_sp.shape, right_sp.indptr, right_sp.indices, right_sp.data * 1.7
    )
    a2b._fp_memo = right_sp.pattern_fingerprint()

    def boom(*a, **k):
        raise AssertionError("fused sparse-A2 path fell back to eager apply")

    orig = qr.left.apply_qt
    qr.left.apply_qt = boom
    try:
        qr.compute(BlockMatrix1x2(left_m, a2b))
    finally:
        qr.left.apply_qt = orig
    assert qr._plan_cache.get("banded_a2") is ent
    Ad2 = np.concatenate([left_m.to_dense(), 1.7 * right_sp.to_dense()], axis=1)
    x2 = np.asarray(qr.solve(jnp.asarray(bp)))
    xref2 = np.linalg.lstsq(Ad2, b, rcond=None)[0]
    assert np.abs(x2 - xref2).max() < 1e-9


def test_sparse_apply_no_dense_intermediate(rng):
    """The fused program's chunk width stays at 128 lanes — peak device
    memory O(m·128), never a dense [m, m2] intermediate (VERDICT r2 item 3)."""
    mat = overlapping_block_diagonal_matrix(64, 224, rng, permute_rows=False)
    qr = BandedBlockedQR(suggested_block_cols=4).compute(mat)
    m = mat.nrows
    m2 = 300  # > 2 chunks
    S = SparseCSR.from_triplets(
        np.arange(m2) % m, np.arange(m2), rng.normal(size=m2), (m, m2)
    )
    out = qr.apply_qt_sparse(S)
    ref = np.asarray(qr.apply_qt(jnp.asarray(S.to_dense())))
    assert np.abs(out.to_dense() - ref).max() < 1e-10
    ent = qr._sparse_apply_cache[True]
    assert ent["plan"]["w"] == 128
    assert ent["plan"]["T"] == -(-m2 // 128)
    # the chunked program's dense scratch is [m, 128] per chunk; its input
    # maps are [T, F] with F bounded by the worst chunk, not m*m2
    assert ent["plan"]["maps"]["in_rows"].shape[0] == ent["plan"]["T"]
