"""Device-resident refactorization: factorize_values == compute on the same
values, across the banded family, including row-permuted stored layouts."""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.solvers import BandedBlockedQR, SegmentedBandedQR
from qrkit_tpu.sparse import SparseCSR

from generators import overlapping_block_diagonal_matrix

NUM_VARS = 96
NUM_PARAMS = NUM_VARS * 2
NUM_RESIDUALS = NUM_VARS * 7


def _scaled(mat: SparseCSR, f: float) -> SparseCSR:
    return SparseCSR(mat.shape, mat.indptr, mat.indices, mat.data * f)


@pytest.mark.parametrize("permute", [False, True])
def test_banded_factorize_values_matches_compute(rng, permute):
    spj = overlapping_block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, permute)
    qr = BandedBlockedQR(suggested_block_cols=2).compute(spj)
    mat2 = _scaled(spj, 1.7)
    ref = BandedBlockedQR(suggested_block_cols=2).compute(mat2)
    qr.factorize_values(jnp.asarray(mat2.data))  # device array, original order
    np.testing.assert_allclose(
        np.asarray(qr.r_panels), np.asarray(ref.r_panels), atol=1e-12
    )
    b = rng.normal(size=spj.nrows)
    pb = qr.rows_permutation().apply(b)
    np.testing.assert_allclose(
        np.asarray(qr.solve(jnp.asarray(pb))),
        np.asarray(ref.solve(jnp.asarray(ref.rows_permutation().apply(b)))),
        atol=1e-10,
    )


def test_segmented_factorize_values_matches_compute(rng):
    spj = overlapping_block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, False)
    qr = SegmentedBandedQR(suggested_block_cols=2, segment_blocks=8).compute(spj)
    assert qr._delegate is None
    mat2 = _scaled(spj, 0.6)
    ref = SegmentedBandedQR(suggested_block_cols=2, segment_blocks=8).compute(mat2)
    qr.factorize_values(jnp.asarray(mat2.data))
    np.testing.assert_allclose(
        np.asarray(qr._chain_r), np.asarray(ref._chain_r), atol=1e-12
    )
    x_true = rng.normal(size=spj.ncols)
    b = qr.rows_permutation().apply(mat2.to_dense() @ x_true)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    np.testing.assert_allclose(x, x_true, atol=1e-7)


def test_segmented_delegate_forwards_values(rng):
    # a short chain falls back to the plain banded solver; factorize_values
    # must forward through the delegate
    spj = overlapping_block_diagonal_matrix(16 * 2, 16 * 7, rng, False)
    qr = SegmentedBandedQR(suggested_block_cols=2, segment_blocks=64).compute(spj)
    assert qr._delegate is not None
    mat2 = _scaled(spj, 2.5)
    qr.factorize_values(jnp.asarray(mat2.data))
    x_true = rng.normal(size=spj.ncols)
    b = qr.rows_permutation().apply(mat2.to_dense() @ x_true)
    np.testing.assert_allclose(
        np.asarray(qr.solve(jnp.asarray(b))), x_true, atol=1e-7
    )


def test_factorize_values_host_array_accepted(rng):
    spj = overlapping_block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, False)
    qr = BandedBlockedQR(suggested_block_cols=2).compute(spj)
    qr.factorize_values(spj.data * 3.0)  # NumPy array: uploads like compute
    ref = BandedBlockedQR(suggested_block_cols=2).compute(_scaled(spj, 3.0))
    np.testing.assert_allclose(
        np.asarray(qr.r_panels), np.asarray(ref.r_panels), atol=1e-12
    )


def test_factorize_values_errors(rng):
    spj = overlapping_block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, False)
    qr = BandedBlockedQR(suggested_block_cols=2)
    with pytest.raises((ValueError, AttributeError)):
        qr.factorize_values(np.ones(7))  # before any compute
    qr.compute(spj)
    with pytest.raises(ValueError):
        qr.factorize_values(np.ones(spj.nnz + 1))  # wrong length
    sq = SegmentedBandedQR(suggested_block_cols=2, segment_blocks=8)
    with pytest.raises((ValueError, AttributeError)):
        sq.factorize_values(np.ones(spj.nnz))
