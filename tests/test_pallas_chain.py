"""Fused sequential-chain Pallas kernel on the PLAIN banded solver
(interpret mode) vs the lax.scan path.

``pallas_chain_qr`` (ops/pallas_banded.py) runs the WHOLE overlap-carry
chain of BandedBlockedQR as one kernel launch with the R-overlap carry in
VMEM scratch; factors must match the XLA ``banded_factorize`` scan exactly
(same reflector conventions as
/root/reference/src/QRKit/BandedBlockedSparseQR.h:442-519).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.solvers import BandedBlockedQR, SegmentedBandedQR

from generators import block_diagonal_matrix, overlapping_block_diagonal_matrix


def _pair(spj):
    qx = BandedBlockedQR(suggested_block_cols=2, use_pallas=False).compute(spj)
    qp = BandedBlockedQR(suggested_block_cols=2, use_pallas=True)
    qp._pallas_interpret = True
    qp.compute(spj)
    assert qp._fac_mode is True and qx._fac_mode is False
    return qx, qp


@pytest.mark.parametrize("overlap", [False, True])
def test_pallas_plain_chain_matches_xla(rng, overlap):
    gen = overlapping_block_diagonal_matrix if overlap else block_diagonal_matrix
    spj = gen(128, 448, rng, False)
    qx, qp = _pair(spj)
    for name in ("Yf", "Tf", "s1", "s2", "split"):
        a = np.asarray(getattr(qx.q_seq, name))
        b = np.asarray(getattr(qp.q_seq, name))
        assert np.allclose(a, b, atol=1e-12), (name, np.abs(a - b).max())
    a, b = np.asarray(qx._r_panels_f), np.asarray(qp._r_panels_f)
    assert np.allclose(a, b, atol=1e-12), np.abs(a - b).max()
    x_true = rng.normal(size=spj.ncols)
    rhs = qp.rows_permutation().apply(spj.to_dense() @ x_true)
    x = np.asarray(qp.solve(jnp.asarray(rhs)))
    assert np.allclose(x, x_true, atol=1e-7)


def test_pallas_plain_refactorize_values(rng):
    spj = overlapping_block_diagonal_matrix(128, 448, rng, False)
    qx, qp = _pair(spj)
    vals = rng.normal(size=spj.nnz)
    qx.factorize_values(vals)
    qp.factorize_values(vals)
    assert np.allclose(
        np.asarray(qx.q_seq.Yf), np.asarray(qp.q_seq.Yf), atol=1e-12
    )
    assert np.allclose(
        np.asarray(qx._r_panels_f), np.asarray(qp._r_panels_f), atol=1e-12
    )


def test_pallas_plain_auto_off_cpu(rng):
    spj = overlapping_block_diagonal_matrix(128, 448, rng, False)
    qr = BandedBlockedQR(suggested_block_cols=2).compute(spj)
    assert qr._fac_mode is False


def test_pallas_plain_force_raises_short_chain(rng):
    # nb < 32: geometry gate rejects the kernel under use_pallas=True
    spj = overlapping_block_diagonal_matrix(32, 112, rng, False)
    qr = BandedBlockedQR(suggested_block_cols=2, use_pallas=True)
    with pytest.raises(ValueError, match="use_pallas"):
        qr.compute(spj)


def test_pallas_segmented_boundary_chain(rng):
    # large enough that the segmented solver's boundary chain itself passes
    # the fused-kernel gate (nbc >= 16) — asserts the kernel path really ran
    spj = overlapping_block_diagonal_matrix(1024, 3584, rng, False)
    qx = SegmentedBandedQR(
        suggested_block_cols=2, segment_blocks=2, use_pallas=False
    ).compute(spj)
    qp = SegmentedBandedQR(
        suggested_block_cols=2, segment_blocks=2, use_pallas=True
    )
    qp._pallas_interpret = True
    qp.compute(spj)
    assert qp._chain_pallas is not None, "boundary-chain kernel gate not hit"
    a, b = np.asarray(qx._j2_top), np.asarray(qp._j2_top)
    assert np.allclose(a, b, atol=1e-12), np.abs(a - b).max()
    # chain_r: compare up to row signs.  This fixture's bot slabs are exactly
    # rank-deficient (duplicated column structure), so the CAQR's Householder
    # branches sit on the sigma==0 boundary and fp-reassociation-level noise
    # between the two apply paths legitimately flips reflector signs — both
    # factorizations are valid (the solve below pins correctness).
    a, b = np.asarray(qx._chain_r), np.asarray(qp._chain_r)

    def _sign_norm(r):
        s = np.sign(np.diagonal(r, axis1=1, axis2=2))
        return r * np.where(s == 0, 1.0, s)[:, :, None]

    assert np.allclose(_sign_norm(a), _sign_norm(b), atol=1e-12), np.abs(
        np.abs(a) - np.abs(b)
    ).max()
    x_true = rng.normal(size=spj.ncols)
    rhs = qp.rows_permutation().apply(spj.to_dense() @ x_true)
    x = np.asarray(qp.solve(jnp.asarray(rhs)))
    assert np.allclose(x, x_true, atol=1e-7)
