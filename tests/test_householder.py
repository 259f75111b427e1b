"""Property tests for the compact-WY panel QR kernels.

Mirrors the contract the reference tests rely on: Q·R ≈ A, orthogonality of Q,
Y/T self-consistency, column-pivoted variant ≈ A·P, batched vmap path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.ops import (
    CompactWYSeq,
    apply_wy,
    batched_panel_qr_yt,
    colpiv_householder_qr,
    form_q,
    panel_qr_yt,
)


@pytest.mark.parametrize("shape", [(7, 2), (2, 1), (9, 4), (16, 16), (40, 12)])
def test_panel_qr_reconstruction(rng, shape):
    m, n = shape
    A = jnp.asarray(rng.normal(size=(m, n)))
    Y, T, R = panel_qr_yt(A, panel_width=4)
    Q = form_q(Y, T)
    # orthogonality
    assert np.allclose(Q.T @ Q, np.eye(m), atol=1e-10)
    # reconstruction: Q @ R == A (R upper-trapezoidal)
    Rtri = jnp.triu(R)
    assert np.allclose(Q @ Rtri, A, atol=1e-10)
    # apply_wy consistency with explicit Q
    v = jnp.asarray(rng.normal(size=(m,)))
    assert np.allclose(apply_wy(Y, T, v), Q @ v, atol=1e-10)
    assert np.allclose(apply_wy(Y, T, v, transpose=True), Q.T @ v, atol=1e-10)


def test_panel_qr_offset(rng):
    # offset QR leaves leading rows untouched
    m, n = 12, 3
    off = 4
    A = jnp.asarray(rng.normal(size=(m, n)))
    Y, T, R = panel_qr_yt(A, offset=off)
    assert np.allclose(np.asarray(Y)[:off], 0.0)
    Q = form_q(Y, T)
    assert np.allclose(np.asarray(Q)[:off, :off], np.eye(off), atol=1e-12)
    # R zero below the shifted diagonal
    Rnp = np.asarray(R)
    for j in range(n):
        assert np.allclose(Rnp[off + j + 1 :, j], 0.0, atol=1e-10)
    assert np.allclose(Q @ R, A, atol=1e-10)


def test_degenerate_zero_column(rng):
    A = jnp.asarray(rng.normal(size=(6, 3))).at[:, 1].set(0.0)
    Y, T, R = panel_qr_yt(A)
    Q = form_q(Y, T)
    assert np.allclose(Q @ jnp.triu(R), A, atol=1e-10)
    assert np.allclose(Q.T @ Q, np.eye(6), atol=1e-10)


def test_colpiv_qr(rng):
    m, n = 10, 5
    A = jnp.asarray(rng.normal(size=(m, n)))
    Y, taus, R, perm = colpiv_householder_qr(A)
    from qrkit_tpu.ops import build_t_factor

    T = build_t_factor(Y, taus)
    Q = form_q(Y, T)
    AP = np.asarray(A)[:, np.asarray(perm)]
    assert np.allclose(Q @ jnp.triu(R), AP, atol=1e-10)
    # pivoting gives non-increasing |R_jj|
    d = np.abs(np.diag(np.asarray(R)[:n]))
    assert np.all(d[:-1] >= d[1:] - 1e-10)


def test_colpiv_rank_deficient(rng):
    A = np.asarray(rng.normal(size=(8, 4)))
    A[:, 3] = A[:, 0] + A[:, 1]  # rank 3
    Y, taus, R, perm = colpiv_householder_qr(jnp.asarray(A))
    from qrkit_tpu.ops import build_t_factor

    Q = form_q(Y, build_t_factor(Y, taus))
    assert np.allclose(Q @ jnp.triu(R), A[:, np.asarray(perm)], atol=1e-9)
    assert abs(np.asarray(R)[3, 3]) < 1e-9  # revealed rank


def test_batched_panel_qr(rng):
    blocks = jnp.asarray(rng.normal(size=(32, 7, 2)))
    Y, T, R = batched_panel_qr_yt(blocks)
    Qs = jax.vmap(form_q)(Y, T)
    recon = jnp.einsum("bij,bjk->bik", Qs, jnp.triu(R))
    assert np.allclose(recon, blocks, atol=1e-10)


def test_compact_wy_seq(rng):
    # Two 7x2 diagonal blocks — Q should equal blockdiag(Q0, Q1)
    A0 = jnp.asarray(rng.normal(size=(7, 2)))
    A1 = jnp.asarray(rng.normal(size=(7, 2)))
    Y0, T0, _ = panel_qr_yt(A0)
    Y1, T1, _ = panel_qr_yt(A1)
    m = 14
    W, C = 7, 2
    Y = jnp.stack([Y0, Y1])
    T = jnp.stack([T0, T1])
    seq = CompactWYSeq(Y, T, jnp.asarray([0, 7], dtype=jnp.int32), m)
    Qd = np.zeros((m, m))
    Qd[:7, :7] = form_q(Y0, T0)
    Qd[7:, 7:] = form_q(Y1, T1)
    v = rng.normal(size=m)
    assert np.allclose(seq.apply_q(jnp.asarray(v)), Qd @ v, atol=1e-10)
    assert np.allclose(seq.apply_qt(jnp.asarray(v)), Qd.T @ v, atol=1e-10)
    Mat = jnp.asarray(rng.normal(size=(m, 3)))
    assert np.allclose(seq.apply_q(Mat), Qd @ np.asarray(Mat), atol=1e-10)
    assert np.allclose(seq.to_dense_q(), Qd, atol=1e-10)


def test_compact_wy_seq_overlapping_order(rng):
    # Overlapping windows: sequence semantics must match explicit H-product order
    m = 10
    A0 = jnp.asarray(rng.normal(size=(6, 2)))
    A1 = jnp.asarray(rng.normal(size=(6, 2)))
    Y0, T0, _ = panel_qr_yt(A0)
    Y1, T1, _ = panel_qr_yt(A1)
    seq = CompactWYSeq(
        jnp.stack([Y0, Y1]),
        jnp.stack([T0, T1]),
        jnp.asarray([0, 4], dtype=jnp.int32),
        m,
    )
    H0 = np.eye(m)
    H0[:6, :6] = form_q(Y0, T0)
    H1 = np.eye(m)
    H1[4:, 4:] = form_q(Y1, T1)
    Q = H0 @ H1  # Q = H0 H1: block 0 applied LAST in the reverse scan
    v = rng.normal(size=m)
    assert np.allclose(seq.apply_q(jnp.asarray(v)), Q @ v, atol=1e-10)
    assert np.allclose(seq.apply_qt(jnp.asarray(v)), Q.T @ v, atol=1e-10)


def test_compact_wy_gap_zeros(rng):
    # A window with explicit zero rows (the numZeros gap) must skip those rows
    m = 12
    A = jnp.asarray(rng.normal(size=(6, 2)))
    Y, T, _ = panel_qr_yt(A)
    # windowed Y: rows 0-1 = diag part, rows 2-4 = gap zeros, rows 5-8 = tail
    Yw = jnp.zeros((9, 2))
    Yw = Yw.at[:2].set(Y[:2])
    Yw = Yw.at[5:9].set(Y[2:6])
    seq = CompactWYSeq(Yw[None], T[None], jnp.asarray([1], dtype=jnp.int32), m)
    v = rng.normal(size=m)
    out = np.asarray(seq.apply_q(jnp.asarray(v)))
    # gap rows (window rows 2-4 → global rows 3-5) untouched
    assert np.allclose(out[3:6], v[3:6])
    assert np.allclose(out[0], v[0])
    assert np.allclose(out[10:], v[10:])
    # the touched rows match a dense product on the gathered segments
    Qsmall = np.asarray(form_q(Y, T))
    seg = np.concatenate([v[1:3], v[6:10]])
    expect = Qsmall @ seg
    assert np.allclose(out[1:3], expect[:2], atol=1e-10)
    assert np.allclose(out[6:10], expect[2:], atol=1e-10)


def test_colpiv_wide_scan_variant(rng):
    """Wide panels (> unroll guard) take the lax.scan path; verify the QR
    properties and agreement with the unrolled path."""
    from qrkit_tpu.ops.householder import (
        _COLPIV_UNROLL_MAX,
        _colpiv_householder_qr_scan,
        build_t_factor,
        colpiv_householder_qr,
        form_q,
    )

    m, n = 120, _COLPIV_UNROLL_MAX + 16  # forces the scan variant
    A = jnp.asarray(rng.normal(size=(m, n)))
    Y, taus, R, perm = colpiv_householder_qr(A)
    Q = np.asarray(form_q(Y, build_t_factor(Y, taus)))
    Rn = np.asarray(jnp.triu(R))
    assert np.allclose(Q.T @ Q, np.eye(m), atol=1e-10)
    assert np.allclose(Q @ Rn, np.asarray(A)[:, np.asarray(perm)], atol=1e-10)
    d = np.abs(np.diag(Rn))
    assert np.all(d[:-1] >= d[1:] - 1e-10)  # pivoting: non-increasing diag

    # scan and unrolled variants agree exactly on a narrow panel
    B = jnp.asarray(rng.normal(size=(20, 6)))
    Y1, t1, R1, p1 = colpiv_householder_qr(B)
    Y2, t2, R2, p2 = _colpiv_householder_qr_scan(B)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.allclose(np.asarray(Y1), np.asarray(Y2), atol=1e-14)
    assert np.allclose(np.asarray(R1), np.asarray(R2), atol=1e-14)


def test_panel_qr_yt_lapack_wide(rng):
    """Wide panels route through the backend-native QR; the compact-WY
    factors must satisfy the same contract as the unrolled path."""
    from qrkit_tpu.ops.householder import form_q, panel_qr_yt

    m, n = 300, 120  # > _LAPACK_QR_MIN_WIDTH -> lapack path
    A = jnp.asarray(rng.normal(size=(m, n)))
    Y, T, R = panel_qr_yt(A)
    Q = np.asarray(form_q(Y, T))
    assert np.allclose(Q.T @ Q, np.eye(m), atol=1e-10)
    assert np.allclose(Q[:, :n] @ np.triu(np.asarray(R)[:n]), np.asarray(A), atol=1e-9)


def test_panel_qr_yt_landscape_wide(rng):
    """Landscape (m < n) wide panels must keep the recursive path (geqrf has
    only min(m, n) reflectors) — regression guard for the lapack dispatch."""
    from qrkit_tpu.ops.householder import form_q, panel_qr_yt

    m, n = 20, 50
    A = jnp.asarray(rng.normal(size=(m, n)))
    Y, T, R = panel_qr_yt(A)
    Q = np.asarray(form_q(Y, T))
    assert np.allclose(Q.T @ Q, np.eye(m), atol=1e-10)
    assert np.allclose(Q @ np.triu(np.asarray(R)), np.asarray(A), atol=1e-9)
