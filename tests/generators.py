"""Synthetic Jacobian generators reproducing the reference test fixtures.

NumPy re-implementations of the generators in
/root/reference/test/test-qrkit.cpp:63-165 and test-utils.cpp:39-142: 7x2
block-diagonal, overlapping 7x4 banded, and block-angular (banded left + dense
right columns) matrices with uniform(0.5, 5) values and optional row shuffles.
"""
import numpy as np

from qrkit_tpu.sparse import Permutation, SparseCSR


def block_diagonal_matrix(num_params, num_residuals, rng, permute_rows=True):
    """7-row-tall, 2-col-wide diagonal blocks (test-qrkit.cpp:101-131)."""
    stride = 7
    rows, cols, vals = [], [], []
    for i in range(num_params // 2):
        for j in range(i * 2, min(i * 2 + 2, num_params)):
            for k in range(stride):
                rows.append(i * stride + k)
                cols.append(j)
                vals.append(rng.uniform(0.5, 5.0))
    m = SparseCSR.from_triplets(rows, cols, vals, (num_residuals, num_params))
    if permute_rows:
        perm = Permutation(rng.permutation(num_residuals))
        m = m.permute_rows(perm)
    return m


def overlapping_block_diagonal_matrix(num_params, num_residuals, rng, permute_rows=True):
    """7x2 blocks plus 2-col overlap nonzeros on each block's last row
    (test-qrkit.cpp:63-96)."""
    stride = 7
    rows, cols, vals = [], [], []
    for i in range(num_params // 2):
        for j in range(i * 2, min(i * 2 + 2, num_params)):
            for k in range(stride):
                rows.append(i * stride + k)
                cols.append(j)
                vals.append(rng.uniform(0.5, 5.0))
            if j < num_params - 2:
                rows.append(i * stride + 6)
                cols.append(j + 2)
                vals.append(rng.uniform(0.5, 5.0))
    m = SparseCSR.from_triplets(rows, cols, vals, (num_residuals, num_params))
    if permute_rows:
        perm = Permutation(rng.permutation(num_residuals))
        m = m.permute_rows(perm)
    return m


def block_angular_matrix(num_params, num_angular_params, num_residuals, rng):
    """Overlapping banded left block + fully dense right columns
    (test-qrkit.cpp:135-165)."""
    stride = 7
    rows, cols, vals = [], [], []
    for i in range(num_params // 2):
        for j in range(i * 2, min(i * 2 + 2, num_params)):
            for k in range(stride):
                rows.append(i * stride + k)
                cols.append(j)
                vals.append(rng.uniform(0.5, 5.0))
            if j < num_params - 2:
                rows.append(i * stride + 6)
                cols.append(j + 2)
                vals.append(rng.uniform(0.5, 5.0))
    for i in range(num_residuals):
        for j in range(num_angular_params):
            rows.append(i)
            cols.append(num_params + j)
            vals.append(rng.uniform(0.5, 5.0))
    return SparseCSR.from_triplets(
        rows, cols, vals, (num_residuals, num_params + num_angular_params)
    )


def rowperm_a_diag_lambda(a: SparseCSR, lam: float) -> SparseCSR:
    """Append sqrt(lam)*I below A and row-permute each diagonal row directly below
    the last nonzero of its column (test-utils.cpp:145-180) — the LM damping
    pattern that keeps the Jacobian block-banded."""
    n_params = a.ncols
    n_residuals = a.nrows
    dense = a.to_dense()  # small test sizes only
    last_nnz = np.zeros(n_params, dtype=np.int64)
    for c in range(n_params):
        nz = np.nonzero(dense[:, c])[0]
        last_nnz[c] = nz[-1] if nz.size else 0

    indices = np.zeros(n_residuals + n_params, dtype=np.int64)
    curr = 0
    for c in range(n_params):
        while curr <= last_nnz[c] + c:
            indices[curr - c] = curr
            curr += 1
        indices[n_residuals + c] = curr
        curr += 1

    rows, cols, vals = [], [], []
    row_ids = np.repeat(np.arange(n_residuals), np.diff(a.indptr))
    rows.extend(row_ids.tolist())
    cols.extend(a.indices.tolist())
    vals.extend(a.data.tolist())
    for c in range(n_params):
        rows.append(n_residuals + c)
        cols.append(c)
        vals.append(np.sqrt(lam))
    stacked = SparseCSR.from_triplets(
        rows, cols, vals, (n_residuals + n_params, n_params)
    )
    return stacked.permute_rows(Permutation(indices))


def tall_banded_matrix(nb, rng, br, bc, ov):
    """Row-sorted tall-block banded layout (block rows >> column step — the
    gapped config-3 regime, BASELINE config 3 miniaturized; the geometry
    where the fused Pallas W-buffer apply must engage)."""
    step = bc - ov
    ncols = step * nb + ov
    i = np.arange(nb)[:, None, None]
    r = np.arange(br)[None, :, None]
    c = np.arange(bc)[None, None, :]
    rows = np.broadcast_to(i * br + r, (nb, br, bc)).ravel()
    cols = np.broadcast_to(i * step + c, (nb, br, bc)).ravel()
    keep = cols < ncols
    vals = rng.uniform(0.5, 5.0, size=rows.size)
    return SparseCSR.from_triplets(
        rows[keep], cols[keep], vals[keep], (br * nb, ncols)
    )
