"""pattern_fingerprint: interned layout tokens (sparse.py).

The token gates reuse of plan-cached device gather maps (see
BandedBlockedQR.compute / SegmentedBandedQR.compute); equal stored layouts
must yield equal tokens (identity AND value-equality paths) and different
stored layouts different tokens, or maps would be stale/rebuilt wrongly.
"""
import numpy as np

from qrkit_tpu.solvers import BandedBlockedQR
from qrkit_tpu.sparse import SparseCSR

from generators import overlapping_block_diagonal_matrix


def _mat(rows, cols, vals, shape=(4, 4)):
    return SparseCSR.from_triplets(rows, cols, vals, shape)


def test_token_identity_and_equality_paths():
    a = _mat([0, 1, 2], [0, 1, 2], [1.0, 2.0, 3.0])
    same_objs = SparseCSR(a.shape, a.indptr, a.indices, a.data * 5)
    rebuilt = _mat([0, 1, 2], [0, 1, 2], [9.0, 9.0, 9.0])
    fa = a.pattern_fingerprint()
    assert same_objs.pattern_fingerprint() == fa  # identity fast path
    assert rebuilt.pattern_fingerprint() == fa  # exact-equality path
    assert a.pattern_fingerprint() == fa  # per-instance memo stable


def test_token_differs_on_layout_change():
    a = _mat([0, 1, 2], [0, 1, 2], [1.0, 2.0, 3.0])
    moved = _mat([0, 1, 2], [0, 1, 1], [1.0, 2.0, 3.0])  # entry moved cols
    dropped = _mat([0, 2], [0, 2], [1.0, 3.0])  # entry pruned
    # compensating move across rows (the additive-checksum collision case
    # the round-1 advisor flagged): same index multiset, different rows
    swapped = _mat([0, 1, 2], [1, 0, 2], [1.0, 2.0, 3.0])
    toks = {
        a.pattern_fingerprint(),
        moved.pattern_fingerprint(),
        dropped.pattern_fingerprint(),
        swapped.pattern_fingerprint(),
    }
    assert len(toks) == 4


def test_registry_eviction_keeps_exactness():
    base = _mat([0, 1, 2], [0, 1, 2], [1.0, 2.0, 3.0])
    tok = base.pattern_fingerprint()
    # push > _LAYOUT_MAX distinct layouts through the registry
    for r in range(12):
        _mat([0, r % 4], [0, (r + 1) % 4], [1.0, 2.0]).pattern_fingerprint()
    # base's arrays were evicted; an equal rebuilt layout gets a FRESH token —
    # that is safe (worse case is a rebuild, never a stale reuse) — while the
    # memoized instance keeps its own token
    rebuilt = _mat([0, 1, 2], [0, 1, 2], [1.0, 2.0, 3.0])
    assert base.pattern_fingerprint() == tok
    assert rebuilt.pattern_fingerprint()[0] == tok[0]  # nnz component


def test_banded_gather_map_rebuilds_on_layout_change():
    """End-to-end: same analyzed plan, changed stored layout -> correct solve."""
    rng = np.random.default_rng(0)
    mat = overlapping_block_diagonal_matrix(24, 84, rng, permute_rows=False)
    qr = BandedBlockedQR(suggested_block_cols=4)
    qr.compute(mat)
    x_ref = np.asarray(qr.solve(np.ones(mat.nrows)))
    # rebuild the same values through from_triplets (fresh index arrays,
    # equal layout): must reuse, and solve identically
    rows = np.repeat(np.arange(mat.nrows), np.diff(mat.indptr))
    mat2 = SparseCSR.from_triplets(rows, mat.indices, mat.data, mat.shape)
    qr.compute(mat2)
    np.testing.assert_allclose(
        np.asarray(qr.solve(np.ones(mat.nrows))), x_ref, rtol=1e-12
    )
    # drop one stored entry (set to zero and prune): layout changes, maps
    # must rebuild — factor/solve still consistent with a fresh solver
    keep = np.ones(mat.nnz, bool)
    keep[mat.nnz // 2] = False
    mat3 = SparseCSR.from_triplets(
        rows[keep], mat.indices[keep], mat.data[keep], mat.shape
    )
    qr.compute(mat3)
    fresh = BandedBlockedQR(suggested_block_cols=4)
    fresh.compute(mat3)
    np.testing.assert_allclose(
        np.asarray(qr.solve(np.ones(mat.nrows))),
        np.asarray(fresh.solve(np.ones(mat.nrows))),
        rtol=1e-10,
    )
