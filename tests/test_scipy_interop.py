"""SciPy interop: SparseCSR.from_scipy / to_scipy round trips.

Migration surface for reference users holding Eigen::SparseMatrix data in
scipy form (the reference consumes Eigen sparse matrices directly,
e.g. /root/reference/test/test-qrkit.cpp:173-178; here the equivalent entry
point is a SparseCSR, so the scipy bridge is the drop-in construction path).
"""
import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from qrkit_tpu import SparseCSR, auto_qr


def _random_coo(rng, shape=(40, 12), density=0.2):
    m = (rng.random(shape) < density) * rng.normal(size=shape)
    return scipy_sparse.coo_matrix(m)


def test_round_trip_matches_dense():
    rng = np.random.default_rng(0)
    coo = _random_coo(rng)
    ours = SparseCSR.from_scipy(coo)
    np.testing.assert_allclose(ours.to_dense(), coo.toarray())
    back = ours.to_scipy()
    np.testing.assert_allclose(back.toarray(), coo.toarray())


def test_from_scipy_canonicalizes_duplicates():
    # duplicate entries must sum (Eigen setFromTriplets semantics, matching
    # SparseCSR.from_triplets)
    rows = np.array([0, 0, 1, 1, 1])
    cols = np.array([1, 1, 0, 2, 2])
    vals = np.array([1.0, 2.0, 5.0, -1.0, 4.0])
    coo = scipy_sparse.coo_matrix((vals, (rows, cols)), shape=(3, 4))
    ours = SparseCSR.from_scipy(coo)
    ref = SparseCSR.from_triplets(rows, cols, vals, (3, 4))
    np.testing.assert_allclose(ours.to_dense(), ref.to_dense())
    assert ours.nnz == ref.nnz


def test_scipy_input_solves_end_to_end():
    # a scipy-built block-diagonal Jacobian flows through auto_qr unchanged
    rng = np.random.default_rng(1)
    nb, br, bc = 16, 7, 2
    rows, cols, vals = [], [], []
    for k in range(nb):
        for i in range(br):
            for j in range(bc):
                rows.append(k * br + i)
                cols.append(k * bc + j)
                vals.append(rng.uniform(0.5, 5.0))
    sp_m = scipy_sparse.coo_matrix(
        (vals, (rows, cols)), shape=(nb * br, nb * bc)
    ).tocsc()  # exercise a non-CSR input format
    mat = SparseCSR.from_scipy(sp_m)
    x_true = rng.normal(size=nb * bc)
    b = mat.to_dense() @ x_true
    qr = auto_qr(mat)
    x = np.asarray(qr.solve(qr.rows_permutation().apply(b)))
    np.testing.assert_allclose(x, x_true, atol=1e-8)
