"""Fused Pallas segment-chain kernel vs the XLA scan (interpret mode).

The kernel (ops/pallas_banded.py) runs phase 1 of SegmentedBandedQR as one
Pallas program; on the CPU mesh it is exercised through the interpreter via
the private ``_pallas_interpret`` switch.  Factors must match the XLA path
bit-for-bit up to fp reassociation (same reflector conventions as
/root/reference/src/QRKit/BandedBlockedSparseQR.h:442-519).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.solvers import SegmentedBandedQR

from generators import overlapping_block_diagonal_matrix, tall_banded_matrix


def _pair(rng, nv, L):
    spj = overlapping_block_diagonal_matrix(nv * 2, nv * 7, rng, False)
    qx = SegmentedBandedQR(
        suggested_block_cols=2, segment_blocks=L, use_pallas=False
    ).compute(spj)
    qp = SegmentedBandedQR(
        suggested_block_cols=2, segment_blocks=L, use_pallas=True
    )
    qp._pallas_interpret = True
    qp.compute(spj)
    assert qx._delegate is None and qp._delegate is None
    assert qp._fac_mode is True and qx._fac_mode is False
    return spj, qx, qp


@pytest.mark.parametrize("nv,L", [(64, 6), (112, 8)])  # aligned + partial tail
def test_pallas_phase1_matches_xla(rng, nv, L):
    spj, qx, qp = _pair(rng, nv, L)
    for name in ("_Yws", "_Ts", "_r_panels", "_chain_r", "_j2_top"):
        a, b = np.asarray(getattr(qx, name)), np.asarray(getattr(qp, name))
        assert np.allclose(a, b, atol=1e-12), (name, np.abs(a - b).max())
    x_true = rng.normal(size=spj.ncols)
    b = qp.rows_permutation().apply(spj.to_dense() @ x_true)
    x = np.asarray(qp.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-7)


def test_fused_w_apply_matches_xla_tall_blocks(rng):
    """The fused phase-2 W-buffer apply (pallas_segment_apply_w + the
    prepare_p2w provenance maps) vs the XLA streaming apply on a gapped
    tall-block miniature: factors, Qᵀ·A_B, and the full solve must agree.
    Window semantics: SparseBlockYTY.h:101-139, SparseQRUtils.h:44-89."""
    mat = tall_banded_matrix(64, rng, br=10, bc=4, ov=2)
    qx = SegmentedBandedQR(
        suggested_block_cols=4, segment_blocks=8, use_pallas=False
    ).compute(mat)
    qp = SegmentedBandedQR(
        suggested_block_cols=4, segment_blocks=8, use_pallas=True
    )
    qp._pallas_interpret = True
    qp.analyze_pattern(mat)
    assert qp._p2w is not None, "fused W-apply gate must fire on this shape"
    assert set(qp._p2w["excl_static"]) <= {0, qp.S - 1}
    qp.compute(mat)
    for name in ("_Yws", "_Ts", "_r_panels", "_chain_r", "_j2_top"):
        a, b = np.asarray(getattr(qx, name)), np.asarray(getattr(qp, name))
        assert np.allclose(a, b, atol=1e-12), (name, np.abs(a - b).max())
    x_true = rng.normal(size=mat.ncols)
    b = qp.rows_permutation().apply(mat.to_dense() @ x_true)
    x = np.asarray(qp.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-7), np.abs(x - x_true).max()


def test_merged_extract_gate_and_equivalence(rng):
    """The gather-free merged extract+shift (static pad+slice on the
    [S, L, mR*mc] layout, round 5) must engage on uniform row-sorted
    geometry with a partial tail segment (the production config-3 shape)
    and reproduce the legacy rank-3 extract + take_along_axis shift
    factors exactly.  A FULL final segment makes the global last block's
    carry differ from its step peers and must fall back to the legacy
    path (gate rejects non-constant active carry)."""
    mat = tall_banded_matrix(43, rng, br=10, bc=4, ov=2)  # 43 % 8 != 0

    def _solver(disable):
        q = SegmentedBandedQR(
            suggested_block_cols=4, segment_blocks=8, use_pallas=True
        )
        q._pallas_interpret = True
        if disable:
            q._disable_merged_extract = True
        q.compute(mat)
        return q

    qm, qd = _solver(False), _solver(True)
    assert qm._merged_extract is True, "merged extract gate must fire"
    assert qd._merged_extract is False
    for name in ("_Yws", "_Ts", "_r_panels", "_chain_r", "_j2_top"):
        a, b = np.asarray(getattr(qm, name)), np.asarray(getattr(qd, name))
        assert np.array_equal(a, b), (name, np.abs(a - b).max())
    x_true = rng.normal(size=mat.ncols)
    b = qm.rows_permutation().apply(mat.to_dense() @ x_true)
    x = np.asarray(qm.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-7)
    # the full-final-segment variant rejects (carry {2,4} at the last step)
    q64 = SegmentedBandedQR(
        suggested_block_cols=4, segment_blocks=8, use_pallas=True
    )
    q64._pallas_interpret = True
    q64.compute(tall_banded_matrix(64, rng, br=10, bc=4, ov=2))
    assert q64._merged_extract is False


def test_auto_selects_xla_on_cpu(rng):
    # 'auto' must not enable the Mosaic kernel off-TPU (or under x64)
    spj = overlapping_block_diagonal_matrix(128, 448, rng, False)
    qr = SegmentedBandedQR(suggested_block_cols=2, segment_blocks=6).compute(spj)
    assert qr._fac_mode is False


def test_force_pallas_raises_on_unsupported_geometry(rng):
    spj = overlapping_block_diagonal_matrix(128, 448, rng, False)
    qr = SegmentedBandedQR(
        suggested_block_cols=2, segment_blocks=6, use_pallas=True
    )
    qr.analyze_pattern(spj)
    qr._pallas_gate = False  # simulate a non-uniform plan
    with pytest.raises(ValueError, match="use_pallas"):
        qr.compute(spj)
