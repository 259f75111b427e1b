"""Banded-blocked QR tests — reproduce reference tests 1-3
(/root/reference/test/test-qrkit.cpp:208-258): non-overlapping, overlapping and
overlapping+row-permuted inputs, explicit Q materialization, LS round trips."""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.solvers import BandedBlockedQR

from generators import block_diagonal_matrix, overlapping_block_diagonal_matrix

NUM_VARS = 64
NUM_PARAMS = NUM_VARS * 2
NUM_RESIDUALS = NUM_VARS * 7


def _check_banded(spj, rng, suggested=8, atol=1e-8):
    qr = BandedBlockedQR(suggested_block_cols=suggested).compute(spj)
    dense = spj.to_dense()
    pA = qr.rows_permutation().apply(dense)  # P_r * A
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())

    assert np.allclose(Q @ R, pA, atol=atol), np.abs(Q @ R - pA).max()
    assert np.allclose(Q.T @ Q, np.eye(Q.shape[0]), atol=atol)
    assert np.allclose(np.asarray(qr.apply_qt(jnp.asarray(pA))), R, atol=atol)
    # R globally upper triangular
    assert np.allclose(np.tril(R, -1), 0.0, atol=1e-12)

    # LS round trip (rows permutation pre-applied by caller, test-qrkit.cpp:235)
    x_true = rng.normal(size=spj.ncols)
    b = qr.rows_permutation().apply(dense @ x_true)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-7), np.abs(x - x_true).max()
    return qr


def test_banded_nonoverlapping(rng):
    spj = block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, permute_rows=False)
    _check_banded(spj, rng)


def test_banded_overlapping(rng):
    spj = overlapping_block_diagonal_matrix(
        NUM_PARAMS, NUM_RESIDUALS, rng, permute_rows=False
    )
    _check_banded(spj, rng)


def test_banded_overlapping_rowpermuted(rng):
    spj = overlapping_block_diagonal_matrix(
        NUM_PARAMS, NUM_RESIDUALS, rng, permute_rows=True
    )
    qr = _check_banded(spj, rng)
    assert not qr.rows_permutation().is_identity()


def test_banded_static_pattern(rng):
    # known-structure fast path: 7x2 blocks, no overlap
    spj = block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, permute_rows=False)
    qr = BandedBlockedQR(block_rows=7, block_cols=2, block_overlap=0).compute(spj)
    dense = spj.to_dense()
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(Q @ R, dense, atol=1e-8)
    assert qr.rows_permutation().is_identity()


def test_banded_refactorize_same_structure(rng):
    # LM pattern: same structure, new values — analysis reused (compute twice)
    spj1 = overlapping_block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, False)
    spj2 = overlapping_block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, False)
    qr = BandedBlockedQR(suggested_block_cols=8)
    qr.compute(spj1)
    plan1 = qr.plan
    qr.compute(spj2)  # reuses analysis
    assert qr.plan is plan1
    dense2 = spj2.to_dense()
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(Q @ R, dense2, atol=1e-8)


def test_banded_matrix_rhs(rng):
    spj = overlapping_block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, False)
    qr = BandedBlockedQR(suggested_block_cols=8).compute(spj)
    M = jnp.asarray(rng.normal(size=(spj.nrows, 4)))
    Q = np.asarray(qr.matrix_q_dense())
    assert np.allclose(np.asarray(qr.apply_qt(M)), Q.T @ np.asarray(M), atol=1e-8)
    assert np.allclose(np.asarray(qr.apply_q(M)), Q @ np.asarray(M), atol=1e-8)


def test_banded_lm_damped_structure(rng):
    # The LM damping interleave (sqrt(lambda) rows under each column, forming
    # 9x2 blocks — test-utils.cpp:254-274) must factorize and solve through the
    # banded solver: this is the damped system of the reference's banded LM
    # variant (examples/ellipse_fitting.cpp:149-180).
    from generators import rowperm_a_diag_lambda

    spj = block_diagonal_matrix(64, 224, rng, permute_rows=False)
    damped = rowperm_a_diag_lambda(spj, 1e-2)
    qr = BandedBlockedQR(suggested_block_cols=2).compute(damped)
    dense = damped.to_dense()
    x_true = rng.normal(size=damped.ncols)
    b = qr.rows_permutation().apply(dense @ x_true)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-7)
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(Q @ R, qr.rows_permutation().apply(dense), atol=1e-8)


def test_banded_chunked_path(rng, monkeypatch):
    # force the chunked-scan path (production uses chunk=256) and check it
    # matches the single-scan result exactly
    import qrkit_tpu.solvers.banded_blocked as bb

    spj = overlapping_block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng, False)
    qr_ref = BandedBlockedQR(suggested_block_cols=8).compute(spj)
    R_ref = np.asarray(qr_ref.matrix_r_dense())

    monkeypatch.setattr(bb, "_CHUNK", 7)  # 32 blocks -> 5 chunks with padding
    qr = BandedBlockedQR(suggested_block_cols=8).compute(spj)
    assert qr.plan.num_blocks > 14
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(R, R_ref, atol=1e-10)
    dense = spj.to_dense()
    x_true = rng.normal(size=spj.ncols)
    b = qr.rows_permutation().apply(dense @ x_true)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-7)


def test_static_pattern_must_tile():
    """A static pattern that does not cover the matrix columns raises instead
    of silently mis-factorizing (the reference's fromBlockBandedPattern,
    SparseQRUtils.h:274-302, assumes tiling and fails silently)."""
    from qrkit_tpu.analysis import from_block_banded_pattern

    # 28 columns is not divisible by the column step 6
    with pytest.raises(ValueError, match="does not tile"):
        from_block_banded_pattern(84, 28, 21, 10, 4)
    # too few rows for the tiled blocks
    with pytest.raises(ValueError, match="does not tile"):
        from_block_banded_pattern(50, 24, 21, 10, 4)
    # exact tiling and a trailing zero-row tail are both fine
    from_block_banded_pattern(84, 24, 21, 10, 4)
    from_block_banded_pattern(90, 24, 21, 10, 4)


def test_carry_pad_bounded_by_block_cols(rng):
    """banded_geometry carries only R's unsolved rows plus the window
    reservation — max_carry is bounded by the block width, not the block
    height (keeps the scan-step panel at [nrows+ncols, ncols])."""
    spj = overlapping_block_diagonal_matrix(NUM_PARAMS, NUM_RESIDUALS, rng)
    qr = _check_banded(spj, rng, suggested=8)
    assert qr._max_carry <= qr._max_cols
    assert qr._max_active <= qr._mR + qr._max_cols


def test_panels_gather_map_parity(rng):
    """Device-side panel extraction (pattern gather map over the raw data
    vector) must reproduce blocks_dense exactly — the per-factorize transfer
    optimization both banded solvers rely on."""
    from generators import overlapping_block_diagonal_matrix

    mat = overlapping_block_diagonal_matrix(40, 140, rng, permute_rows=False)
    blocks = [(i * 7, i * 2, 7, 4 if i < 19 else 2) for i in range(20)]
    gm = mat.panels_gather_map(blocks, 7, 4)
    pad = np.concatenate([mat.data, [0.0]])
    assert np.array_equal(pad[gm], mat.blocks_dense(blocks, 7, 4))
    # padding blocks (nr == 0) must stay all-sentinel
    gm2 = mat.panels_gather_map(blocks + [(0, 0, 0, 0)], 7, 4)
    assert np.all(gm2[-1] == mat.nnz)
    assert np.array_equal(gm2[:-1], gm)


@pytest.mark.parametrize("cls_kw", [
    ("banded", {}),
    ("segmented", {"segment_blocks": 3}),
])
def test_refactorize_changed_nnz_layout(rng, cls_kw):
    """Re-compute with a same-structure matrix whose STORED layout differs
    (one entry pruned to exact zero and dropped): the device gather maps are
    keyed on data positions and must rebuild, not silently gather garbage."""
    from qrkit_tpu.solvers import SegmentedBandedQR

    name, kw = cls_kw
    mat = overlapping_block_diagonal_matrix(40, 140, rng, permute_rows=False)
    qr = (BandedBlockedQR(suggested_block_cols=4) if name == "banded"
          else SegmentedBandedQR(suggested_block_cols=4, **kw)).compute(mat)

    # prune one stored entry (structure unchanged: the plan covers it anyway)
    k = mat.nnz // 2
    keep = np.ones(mat.nnz, dtype=bool)
    keep[k] = False
    row_ids = np.repeat(np.arange(mat.nrows), np.diff(mat.indptr))
    from qrkit_tpu.sparse import SparseCSR

    mat2 = SparseCSR.from_triplets(
        row_ids[keep], mat.indices[keep], mat.data[keep], mat.shape
    )
    qr.compute(mat2)  # same analyzed structure, shifted data positions
    dense2 = mat2.to_dense()
    x_true = rng.normal(size=mat2.ncols)
    b = qr.rows_permutation().apply(dense2 @ x_true)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-6), np.abs(x - x_true).max()
