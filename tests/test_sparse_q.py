"""Structured sparse-Q export parity.

The reference assembles explicit sparse Q cheaply: two shifted diagonals for
the block-diagonal solver (BlockDiagonalSparseQR.h:455-506) and a Q·I product
into a sparse matrix for the banded solver (BandedBlockedSparseQR.h:741-765).
"""
import time

import jax.numpy as jnp
import numpy as np

from qrkit_tpu.containers import BlockDiagonal
from qrkit_tpu.solvers import BandedBlockedQR, BlockDiagonalQR, QFormat

from generators import overlapping_block_diagonal_matrix


def test_blockdiag_sparse_q_parity(rng):
    nb, br, bc, tail = 6, 7, 2, 2
    blocks = rng.normal(size=(nb, br, bc))
    blk = BlockDiagonal(jnp.asarray(blocks), nb * br + tail, nb * bc)
    for fmt in (QFormat.FULL_Q, QFormat.BLOCK_DIAGONAL_Q):
        qr = BlockDiagonalQR(fmt, pivot=False).compute(blk)
        Qs = qr.matrix_q_sparse()
        Qd = np.asarray(qr.matrix_q_dense())
        assert np.allclose(Qs.to_dense(), Qd, atol=1e-12), fmt
        assert Qs.nnz <= nb * br * br + tail


def test_blockdiag_sparse_q_large_is_onnz(rng):
    # 10k-block export must be O(nnz(Q)) — no [m, m] dense array anywhere
    nb, br, bc = 10000, 7, 2
    blocks = rng.normal(size=(nb, br, bc))
    qr = BlockDiagonalQR(QFormat.FULL_Q, pivot=False).compute(
        BlockDiagonal.from_dense_batch(jnp.asarray(blocks))
    )
    t0 = time.time()
    Qs = qr.matrix_q_sparse()
    assert Qs.nnz == nb * br * br  # 490k entries, not (70k)^2
    assert Qs.shape == (nb * br, nb * br)
    # orthogonality spot-check on one block's columns
    i = 1234
    cols = np.asarray(qr.Q)[i]  # [br, br]
    blkQ = Qs.block_dense(i * br, i * bc, br, bc)  # CSR slice, never densify Q
    assert np.allclose(blkQ, cols[:, :bc], atol=1e-12)
    assert time.time() - t0 < 60.0


def test_banded_sparse_q_parity(rng):
    spj = overlapping_block_diagonal_matrix(32, 112, rng, permute_rows=False)
    qr = BandedBlockedQR(suggested_block_cols=2).compute(spj)
    Qs = qr.matrix_q_sparse()
    Qd = np.asarray(qr.matrix_q_dense())
    assert np.allclose(Qs.to_dense(), Qd, atol=1e-10)


def test_compact_wy_to_sparse_q_chunking(rng):
    # chunk boundaries must not change the result
    spj = overlapping_block_diagonal_matrix(16, 56, rng, permute_rows=False)
    qr = BandedBlockedQR(suggested_block_cols=2).compute(spj)
    q_small = qr.q_seq.to_sparse_q(chunk=7)
    q_big = qr.q_seq.to_sparse_q(chunk=1024)
    assert np.allclose(q_small.to_dense(), q_big.to_dense(), atol=1e-12)
