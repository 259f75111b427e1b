"""matrix_r_sparse parity: the O(nnz) structured exports equal the dense R
(the reference's matrixR() returns sparse, BandedBlockedSparseQR.h:272-275)."""
import jax.numpy as jnp
import numpy as np

from qrkit_tpu import BlockDiagonal, BlockMatrix1x2
from qrkit_tpu.solvers import (
    BandedBlockedQR,
    BlockAngularQR,
    BlockDiagonalQR,
    DenseColPivQR,
    SegmentedBandedQR,
)

from generators import (
    block_angular_matrix,
    block_diagonal_matrix,
    overlapping_block_diagonal_matrix,
)


def _assert_matches_dense(qr, atol=1e-12):
    Rs = qr.matrix_r_sparse()
    Rd = np.asarray(qr.matrix_r_dense())
    assert Rs.shape == Rd.shape
    assert np.allclose(Rs.to_dense(), Rd, atol=atol)
    assert Rs.nnz <= np.count_nonzero(Rd) + 1  # no densified storage


def test_block_diagonal_sparse_r(rng):
    spj = block_diagonal_matrix(128, 448, rng, permute_rows=False)
    blk = BlockDiagonal.from_block_diagonal_pattern(spj, 7, 2)
    _assert_matches_dense(BlockDiagonalQR().compute(blk))


def test_banded_sparse_r(rng):
    spj = overlapping_block_diagonal_matrix(128, 448, rng)
    _assert_matches_dense(BandedBlockedQR(suggested_block_cols=4).compute(spj))


def test_segmented_sparse_r(rng):
    spj = overlapping_block_diagonal_matrix(256, 896, rng, permute_rows=False)
    qr = SegmentedBandedQR(suggested_block_cols=2, segment_blocks=16).compute(spj)
    assert qr._delegate is None
    _assert_matches_dense(qr)


def test_block_angular_sparse_r(rng):
    m1, m2 = 256, 16
    spj = block_angular_matrix(m1, m2, 960, rng)
    left = spj.slice_cols(0, m1)
    right = jnp.asarray(spj.slice_cols(m1, m2).to_dense())
    qr = BlockAngularQR(
        BandedBlockedQR(suggested_block_cols=8), DenseColPivQR()
    ).compute(BlockMatrix1x2(left, right))
    _assert_matches_dense(qr, atol=1e-10)
