"""Randomized cross-solver contract fuzz.

For random banded structures (block shape, overlap, chain length, row
shuffles) every applicable solver must satisfy the full QR contract:
``P_r A P_c = Q R``, orthogonal Q, upper-triangular R, consistent sparse/
dense factor exports, healthy ``info()``, and an exact least-squares round
trip.  The banded window/carry/gap geometry is the subtlest code in the
framework (the reference's SparseQRUtils.h:274-385 has the same hazards and
no such test) — this sweep pins it across parameter corners the targeted
tests don't reach.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu import auto_qr
from qrkit_tpu.solvers import (
    BandedBlockedQR,
    ComputationInfo,
    SegmentedBandedQR,
)
from qrkit_tpu.sparse import Permutation, SparseCSR

CASES = [
    # (br, bc, overlap, nb, permute_rows)
    (5, 2, 1, 8, False),
    (5, 2, 1, 8, True),
    (7, 3, 2, 6, False),
    (7, 4, 1, 9, True),
    (9, 4, 3, 7, False),
    (6, 2, 0, 10, True),   # zero overlap: block diagonal
    (4, 3, 2, 12, True),   # narrow tall-ish blocks, wide overlap
    (8, 5, 4, 6, False),   # overlap = bc - 1
]


def banded_fixture(br, bc, ov, nb, permute, seed):
    rng = np.random.default_rng(seed)
    step = bc - ov
    ncols = step * nb + ov
    rows, cols, vals = [], [], []
    for i in range(nb):
        for r in range(br):
            for c in range(bc):
                col = i * step + c
                if col < ncols:
                    rows.append(i * br + r)
                    cols.append(col)
                    vals.append(rng.uniform(0.5, 5.0))
    m = SparseCSR.from_triplets(rows, cols, vals, (br * nb, ncols))
    if permute:
        m = m.permute_rows(Permutation(rng.permutation(m.nrows)))
    return m, rng


def check_contract(qr, mat, rng, atol=1e-8):
    dense = mat.to_dense()
    assert qr.info() == ComputationInfo.SUCCESS
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    pa = qr.rows_permutation().apply(dense)
    pap = pa[:, qr.cols_permutation().indices]
    assert np.allclose(Q @ R, pap, atol=atol), np.abs(Q @ R - pap).max()
    assert np.allclose(Q.T @ Q, np.eye(Q.shape[0]), atol=atol)
    # exports agree
    assert np.allclose(qr.matrix_r_sparse().to_dense(), R, atol=1e-12)
    Qs = qr.matrix_q_sparse().to_dense()
    assert np.allclose(Qs, Q, atol=atol)
    # apply_qt really is Qᵀ
    probe = rng.normal(size=(mat.nrows, 3))
    assert np.allclose(
        np.asarray(qr.apply_qt(jnp.asarray(probe))), Q.T @ probe, atol=atol
    )
    # LS round trip
    x_true = rng.normal(size=mat.ncols)
    b = dense @ x_true
    x = np.asarray(qr.solve(jnp.asarray(qr.rows_permutation().apply(b))))
    assert np.allclose(x, x_true, atol=1e-6), np.abs(x - x_true).max()


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
def test_fuzz_banded_blocked(case):
    br, bc, ov, nb, permute = case
    mat, rng = banded_fixture(br, bc, ov, nb, permute, seed=hash(case) % 2**31)
    qr = BandedBlockedQR(suggested_block_cols=bc).compute(mat)
    check_contract(qr, mat, rng)


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
def test_fuzz_segmented(case):
    br, bc, ov, nb, permute = case
    mat, rng = banded_fixture(br, bc, ov, nb, permute, seed=hash(case) % 2**31)
    # short chains / no overlap exercise the documented fallback path
    qr = SegmentedBandedQR(suggested_block_cols=bc, segment_blocks=3).compute(mat)
    check_contract(qr, mat, rng)


@pytest.mark.parametrize("case", CASES[:4], ids=[str(c) for c in CASES[:4]])
def test_fuzz_auto(case):
    br, bc, ov, nb, permute = case
    mat, rng = banded_fixture(br, bc, ov, nb, permute, seed=hash(case) % 2**31)
    qr = auto_qr(mat, suggested_block_cols=bc)
    dense = mat.to_dense()
    x_true = rng.normal(size=mat.ncols)
    b = dense @ x_true
    x = np.asarray(qr.solve(jnp.asarray(qr.rows_permutation().apply(b))))
    assert np.allclose(x, x_true, atol=1e-6)


ANGULAR_CASES = [(c, m2) for c in CASES[:4] for m2 in (2, 5)]


@pytest.mark.parametrize(
    "case,m2", ANGULAR_CASES, ids=[f"{c}+{m2}" for c, m2 in ANGULAR_CASES]
)
def test_fuzz_block_angular(case, m2):
    """Random banded left + dense right through the composition solver."""
    from qrkit_tpu.containers import BlockMatrix1x2
    from qrkit_tpu.solvers import BlockAngularQR, DenseColPivQR

    br, bc, ov, nb, permute = case
    left, rng = banded_fixture(br, bc, ov, nb, permute, seed=hash(case) % 2**31)
    right = rng.normal(size=(left.nrows, m2))
    qr = BlockAngularQR(
        BandedBlockedQR(suggested_block_cols=bc), DenseColPivQR()
    ).compute(BlockMatrix1x2(left, jnp.asarray(right)))
    dense = np.concatenate([left.to_dense(), right], axis=1)
    x_true = rng.normal(size=dense.shape[1])
    b = dense @ x_true
    x = np.asarray(qr.solve(jnp.asarray(qr.rows_permutation().apply(b))))
    assert np.allclose(x, x_true, atol=1e-6), np.abs(x - x_true).max()
    # composite factor contract on the exports
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    pap = qr.rows_permutation().apply(dense)[:, qr.cols_permutation().indices]
    assert np.allclose(Q @ R, pap, atol=1e-8)
