"""Structure-analysis parity tests.

Reproduce the exact expectations of /root/reference/test/test-utils.cpp:182-274:
block recovery after row shuffles, overlapping-band detection, and the LM
damping-row interleave pattern.
"""
import numpy as np
import pytest

from qrkit_tpu.analysis import (
    as_banded_as_possible,
    block_banded_info,
    column_density,
    from_block_banded_pattern,
    from_block_diagonal_pattern,
)
from qrkit_tpu.sparse import Permutation, SparseCSR

from generators import (
    block_diagonal_matrix,
    overlapping_block_diagonal_matrix,
    rowperm_a_diag_lambda,
)

NUM_VARS = 256
NUM_PARAMS = NUM_VARS * 2
NUM_RESIDUALS = NUM_VARS * 3 + NUM_VARS + NUM_VARS * 3


def test_blockdiag_permuted(rng):
    # test-utils.cpp:182-209 — recover 256 blocks of 7x2 at (7i, 2i)
    mat = block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, permute_rows=True)
    perm, has_perm = as_banded_as_possible(mat)
    assert has_perm
    sorted_mat = mat.permute_rows(perm)
    plan = block_banded_info(sorted_mat, suggested_block_cols=2)
    assert plan.num_blocks == 256
    for i, b in enumerate(plan.blocks):
        assert (b.row, b.col, b.nrows, b.ncols) == (i * 7, i * 2, 7, 2)


def test_overlapping_permuted(rng):
    # test-utils.cpp:211-252 — 255 blocks of 7x4, last block 14x4
    mat = overlapping_block_diagonal_matrix(
        NUM_PARAMS, NUM_RESIDUALS, rng, permute_rows=True
    )
    perm, has_perm = as_banded_as_possible(mat)
    assert has_perm
    sorted_mat = mat.permute_rows(perm)
    plan = block_banded_info(sorted_mat, suggested_block_cols=2)
    assert plan.num_blocks == 255
    for i, b in enumerate(plan.blocks):
        if i < plan.num_blocks - 1:
            assert (b.row, b.col, b.nrows, b.ncols) == (i * 7, i * 2, 7, 4)
        else:
            assert (b.row, b.col, b.nrows, b.ncols) == (i * 7, i * 2, 14, 4)


def test_blockdiag_vertperm_diag(rng):
    # test-utils.cpp:254-274 — damping rows interleaved to form 9x2 blocks
    mat = block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, permute_rows=False)
    damped = rowperm_a_diag_lambda(mat, 1e-3)
    plan = block_banded_info(damped, suggested_block_cols=2)
    assert plan.num_blocks == 256
    for i, b in enumerate(plan.blocks):
        assert (b.row, b.col, b.nrows, b.ncols) == (i * 9, i * 2, 9, 2)


def test_abap_identity_when_sorted(rng):
    mat = block_diagonal_matrix(64, 224, rng, permute_rows=False)
    perm, has_perm = as_banded_as_possible(mat)
    assert not has_perm
    assert perm.is_identity()


def test_abap_roundtrip_dense(rng):
    mat = overlapping_block_diagonal_matrix(64, 224, rng, permute_rows=True)
    perm, _ = as_banded_as_possible(mat)
    sorted_dense = mat.permute_rows(perm).to_dense()
    # permuted rows must have nondecreasing band starts
    starts = [
        np.nonzero(sorted_dense[i])[0][0] if sorted_dense[i].any() else mat.ncols
        for i in range(mat.nrows)
    ]
    assert all(starts[i] <= starts[i + 1] for i in range(len(starts) - 1))


def test_column_density(rng):
    dense = np.zeros((10, 4))
    dense[:, 0] = 1.0  # 10 nnz
    dense[:3, 1] = 1.0  # 3 nnz
    dense[:6, 2] = 1.0  # 6 nnz
    dense[0, 3] = 1.0  # 1 nnz
    mat = SparseCSR.from_dense(dense)
    perm = column_density(mat)
    permuted = mat.permute_cols(perm).to_dense()
    nnz = (permuted != 0).sum(axis=0)
    assert list(nnz) == [1, 3, 6, 10]
    # stability: equal counts keep original order
    assert list(perm.indices) == [3, 1, 2, 0]

    # non-involution case pins gather semantics: counts [5, 1, 2]
    d2 = np.zeros((5, 3))
    d2[:5, 0] = 1.0
    d2[0, 1] = 1.0
    d2[:2, 2] = 1.0
    m2 = SparseCSR.from_dense(d2)
    p2 = column_density(m2)
    nnz2 = (m2.permute_cols(p2).to_dense() != 0).sum(axis=0)
    assert list(nnz2) == [1, 2, 5]


def test_from_block_diagonal_pattern():
    plan = from_block_diagonal_pattern(21, 6, 7, 2)
    assert plan.num_blocks == 3
    assert [b.astuple() for b in plan.blocks] == [
        (0, 0, 7, 2),
        (7, 2, 7, 2),
        (14, 4, 7, 2),
    ]


def test_from_block_banded_pattern():
    # 7x4 blocks with overlap 2 on an ncols=8 matrix: 4 col-steps of 2
    plan = from_block_banded_pattern(28, 8, 7, 4, 2, suggested_block_cols=2)
    # merging keeps portrait 7x4 blocks; last candidate (width 2) folds into prior
    assert plan.blocks[0].astuple() == (0, 0, 7, 4)
    total_cols = plan.blocks[-1].col + plan.blocks[-1].ncols
    assert total_cols == 8


def test_permutation_roundtrip(rng):
    p = Permutation(rng.permutation(16))
    v = rng.normal(size=16)
    assert np.allclose(p.inverse().apply(p.apply(v)), v)
    assert np.allclose(p.apply_inverse(p.apply(v)), v)
    m = rng.normal(size=(16, 3))
    assert np.allclose(p.apply(m)[p.indices[2]], m[2])


def test_sparse_csr_roundtrip(rng):
    dense = rng.normal(size=(9, 5))
    dense[dense < 0.5] = 0.0
    mat = SparseCSR.from_dense(dense)
    assert np.allclose(mat.to_dense(), dense)
    p = Permutation(rng.permutation(9))
    assert np.allclose(mat.permute_rows(p).to_dense(), p.apply(dense))
    pc = Permutation(rng.permutation(5))
    assert np.allclose(mat.permute_cols(pc).to_dense(), dense[:, pc.indices])
    v = rng.normal(size=5)
    assert np.allclose(mat.matvec(v), dense @ v)
    assert np.allclose(mat.block_dense(2, 1, 4, 3), dense[2:6, 1:4])


def test_matrix_market_roundtrip(rng, tmp_path):
    import os

    from qrkit_tpu.sparse import load_matrix_market, save_matrix_market

    dense = rng.normal(size=(9, 5))
    dense[np.abs(dense) < 0.8] = 0.0
    mat = SparseCSR.from_dense(dense)
    path = os.path.join(tmp_path, "m.mtx")
    save_matrix_market(path, mat)
    back = load_matrix_market(path)
    assert np.allclose(back.to_dense(), dense)
