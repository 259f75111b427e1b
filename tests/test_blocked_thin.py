"""Blocked-thin QR tests — standalone coverage the reference lacks (SURVEY §4
notes BlockedThin* is only exercised inside block-angular): reconstruction,
orthogonality, permutation contracts, LS round trips, rank estimation."""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.solvers import BlockedThinDenseQR, BlockedThinSparseQR
from qrkit_tpu.sparse import SparseCSR


def test_thin_dense(rng):
    m, n = 60, 11
    A = rng.normal(size=(m, n))
    qr = BlockedThinDenseQR(suggested_block_cols=2).compute(jnp.asarray(A))
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(Q.T @ Q, np.eye(m), atol=1e-10)
    assert np.allclose(Q @ R, A, atol=1e-10)
    assert qr.cols_permutation().is_identity()
    # LS round trip
    x_true = rng.normal(size=n)
    x = np.asarray(qr.solve(jnp.asarray(A @ x_true)))
    assert np.allclose(x, x_true, atol=1e-9)


@pytest.mark.parametrize("c", [2, 3, 4])
def test_thin_dense_panel_widths(rng, c):
    A = rng.normal(size=(30, 7))
    qr = BlockedThinDenseQR(suggested_block_cols=c).compute(jnp.asarray(A))
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(Q @ R, A, atol=1e-10)


def _sparse_tall(rng, m=80, n=10, density=0.3):
    mask = rng.uniform(size=(m, n)) < density
    mask[np.arange(n), np.arange(n)] = True  # no empty cols
    mask[:, -1] = True  # one dense column (to exercise the density ordering)
    vals = rng.normal(size=(m, n)) * mask
    # no empty rows
    for i in range(m):
        if not mask[i].any():
            vals[i, rng.integers(n)] = rng.normal()
    return SparseCSR.from_dense(vals)


def test_thin_sparse(rng):
    mat = _sparse_tall(rng)
    qr = BlockedThinSparseQR(suggested_block_cols=2).compute(mat)
    dense = mat.to_dense()
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    # P_r A P_c = Q R
    pA = qr.rows_permutation().apply(dense)
    pAP = pA[:, qr.cols_permutation().indices]
    assert np.allclose(Q.T @ Q, np.eye(mat.nrows), atol=1e-10)
    assert np.allclose(Q @ R, pAP, atol=1e-9), np.abs(Q @ R - pAP).max()
    assert np.allclose(np.tril(R, -1), 0.0, atol=1e-12)
    assert qr.rank == mat.ncols

    # LS round trip with both permutations engaged
    x_true = rng.normal(size=mat.ncols)
    b = qr.rows_permutation().apply(dense @ x_true)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-8)


def test_thin_sparse_dense_input(rng):
    A = rng.normal(size=(40, 6))
    qr = BlockedThinSparseQR(suggested_block_cols=3).compute(jnp.asarray(A))
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    pAP = qr.rows_permutation().apply(A)[:, qr.cols_permutation().indices]
    assert np.allclose(Q @ R, pAP, atol=1e-9)


def test_thin_sparse_pivot_ordering(rng):
    # column pivoting puts larger diagonals first within each panel
    mat = _sparse_tall(rng, m=50, n=8)
    qr = BlockedThinSparseQR(suggested_block_cols=4).compute(mat)
    R = np.asarray(qr.matrix_r_dense())
    d = np.abs(np.diag(R[:8, :8]))
    for p0 in range(0, 8, 4):
        blk = d[p0 : p0 + 4]
        assert np.all(blk[:-1] >= blk[1:] - 1e-9)


def test_thin_dense_wide_input(rng):
    """Wide dense input routes through the native blocked QR — same contract."""
    m, n = 200, 96
    A = rng.normal(size=(m, n))
    qr = BlockedThinDenseQR(2).compute(jnp.asarray(A))
    x_true = rng.normal(size=n)
    b = A @ x_true
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-8)
    Q = np.asarray(qr.matrix_q_dense())
    assert np.allclose(Q.T @ Q, np.eye(m), atol=1e-10)
    assert np.allclose(Q @ np.asarray(qr.matrix_r_dense()), A, atol=1e-9)


def test_thin_sparse_skewed_extents_use_heights(rng):
    """VERDICT r2 item 4: the fused path must consume _panel_heights — a
    banded-ish fixture with one dense column (skewed extents: most panels
    short, the last tall) factorizes over MULTIPLE height-bucket runs, with
    factors identical to the eager extent-sliced loop."""
    from qrkit_tpu.solvers.blocked_thin import _height_runs

    m, n, c = 600, 40, 2
    vals = np.zeros((m, n))
    for j in range(n - 1):  # banded: column j lives in a 15-row window
        r0 = int(j * (m - 20) / n)
        vals[r0 : r0 + 15, j] = rng.normal(size=15)
    vals[:, -1] = rng.normal(size=m)  # one dense column -> pushed right
    mat = SparseCSR.from_dense(vals)

    qr_f = BlockedThinSparseQR(suggested_block_cols=c, fused=True).compute(mat)
    heights = qr_f._panel_heights(
        qr_f._analyze(mat)[0]
    )
    runs = _height_runs(heights[: n // c], c)
    assert len(runs) > 1  # heights actually bucketed, not one maxh scan
    assert max(hb for _, hb in runs) <= max(heights)
    # the short panels run at small buckets (<= 2x their true extent)
    assert min(hb for _, hb in runs) <= 2 * min(heights[: n // c])

    qr_e = BlockedThinSparseQR(suggested_block_cols=c, fused=False).compute(mat)
    assert np.array_equal(
        qr_f.cols_permutation().indices, qr_e.cols_permutation().indices
    )
    assert np.allclose(
        np.asarray(qr_f.matrix_r_dense()), np.asarray(qr_e.matrix_r_dense()),
        atol=1e-12,
    )
    assert np.allclose(
        np.asarray(qr_f.q_seq.Y), np.asarray(qr_e.q_seq.Y), atol=1e-12
    )
    x_true = rng.normal(size=n)
    b = qr_f.rows_permutation().apply(vals @ x_true)
    x = np.asarray(qr_f.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-8)


@pytest.mark.parametrize("m,n,c", [(80, 10, 2), (80, 11, 3), (120, 17, 4)])
def test_thin_sparse_fused_scan_matches_eager(rng, m, n, c):
    """The one-dispatch lax.scan factorization must produce the same factors
    as the eager per-panel loop (incl. ragged final panels and the composed
    pivot permutation)."""
    mat = _sparse_tall(rng, m=m, n=n)
    qr_f = BlockedThinSparseQR(suggested_block_cols=c, fused=True).compute(mat)
    qr_e = BlockedThinSparseQR(suggested_block_cols=c, fused=False).compute(mat)
    assert np.array_equal(
        qr_f.cols_permutation().indices, qr_e.cols_permutation().indices
    )
    assert np.allclose(
        np.asarray(qr_f.matrix_r_dense()), np.asarray(qr_e.matrix_r_dense()),
        atol=1e-12,
    )
    assert np.allclose(
        np.asarray(qr_f.q_seq.Y), np.asarray(qr_e.q_seq.Y), atol=1e-12
    )
    assert np.allclose(
        np.asarray(qr_f.q_seq.T), np.asarray(qr_e.q_seq.T), atol=1e-12
    )
    # end-to-end LS round trip on the fused path
    dense = mat.to_dense()
    x_true = rng.normal(size=n)
    b = qr_f.rows_permutation().apply(dense @ x_true)
    x = np.asarray(qr_f.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-8)
