"""Benchmark driver — prints ONE JSON line.

Times the flagship pipeline (BASELINE.json config 2): fused block-diagonal
factorize + least-squares solve, 10,000 blocks of 7x2, fp32, on the available
accelerator, via the lane-batched Pallas kernel (the fastest path; the XLA
compact-WY path is within ~10%% at this size and 2x slower at 500k blocks).
Steady-state per-solve time is measured with chained ``lax.scan``s of
dependent solves at two lengths and the DIFFERENCE quotient
``(T(hi) - T(lo)) / (hi - lo)`` — a single chained run still carries the
fixed dispatch/tunnel round trip (~30 ms here), which at round-1's 50
iterations dominated the number 40x; the difference method cancels it while
keeping every solve data-dependent on the previous one (no async
undercounting).

``vs_baseline`` is the speedup over the REFERENCE QRKit's own
BlockDiagonalSparseQR (ColPivHouseholderQR per block) on the *same* problem,
measured on this machine with native/qrkit_reference_baseline.cpp (double
precision — its natural mode; see bench_baseline.json).  ``vs_eigen_sparseqr``
keeps the generic Eigen SparseQR(COLAMD) comparison (native/eigen_baseline.cpp)
for continuity with the WACV'18 table.  A fp32 relative-residual gate guards
correctness; fp64 parity to 1e-6 is covered by tests/ on the CPU backend.

``path`` records which kernel produced the number ("pallas" or "xla"); a
Pallas lowering regression is therefore visible in BENCH_r*.json instead of
silently reporting a slower XLA number.
"""
import functools
import json
import os
import time

import numpy as np

NB = 10000
BR, BC = 7, 2
ITERS_LO, ITERS_HI = 200, 1000


def _baselines(nb: int):
    """(reference QRKit seconds, generic Eigen SparseQR seconds) at nb blocks."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    with open(path) as f:
        base = json.load(f)

    def lookup(table, power):
        if str(nb) in table:
            return float(table[str(nb)])
        # conservative extrapolation from the largest measured point (the
        # reference scales ~linearly in nb; Eigen SparseQR super-quadratically,
        # so quadratic extrapolation underestimates it → speedup lower bound)
        pts = sorted((int(k), v) for k, v in table.items())
        n0, t0 = pts[-1]
        return t0 * (nb / n0) ** power

    ref_s = lookup(base["reference_qrkit_measured"]["measured"], 1)
    eigen_s = lookup(base["measured"], 2)
    return ref_s, eigen_s


def _flops(nb: int, br: int, bc: int, iters: int = 1) -> float:
    """Closed-form flop count per factorize+solve:
    Householder QR of one br x bc panel = 2*br*bc^2 - (2/3)*bc^3, plus the
    implicit Qᵀb (3 small GEMVs ≈ 4*br*bc + 2*bc^2) and the bc x bc
    triangular solve (bc^2)."""
    qr = 2.0 * br * bc * bc - (2.0 / 3.0) * bc**3
    solve = 4.0 * br * bc + 3.0 * bc * bc
    return nb * (qr + solve) * iters


def main():
    import jax
    import jax.numpy as jnp

    path_used = "pallas"
    fallback_error = None
    try:
        from qrkit_tpu.ops.pallas_blockdiag import pallas_block_diagonal_lstsq

        def _solve(blocks, b):
            return pallas_block_diagonal_lstsq(blocks, b)

        # smoke-test the kernel on this backend; fall back to the XLA path on
        # a lowering/compile failure so the bench still produces a number —
        # but TAG the fallback so a Pallas regression is visible in the JSON.
        _solve(
            jnp.ones((8, BR, BC), jnp.float32), jnp.ones((8 * BR,), jnp.float32)
        ).block_until_ready()
    except Exception as e:  # lowering/compile errors vary by backend version
        path_used = "xla"
        fallback_error = f"{type(e).__name__}: {e}"[:200]
        from qrkit_tpu.functional import block_diagonal_lstsq

        def _solve(blocks, b):
            return block_diagonal_lstsq(blocks, b, pivot=False)

    rng = np.random.default_rng(0)
    blocks_np = rng.uniform(0.5, 5.0, size=(NB, BR, BC))
    x_true = rng.normal(size=NB * BC)
    b_np = np.einsum("bij,bj->bi", blocks_np, x_true.reshape(NB, BC)).reshape(-1)

    blocks = jnp.asarray(blocks_np, dtype=jnp.float32)
    b = jnp.asarray(b_np, dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chained(blocks, b, iters):
        def body(carry, _):
            x = _solve(blocks, carry)
            return carry * (1.0 + 1e-12 * x[0]), x[0]

        final, xs = jax.lax.scan(body, b, None, length=iters)
        return xs

    # correctness gate: fp32 relative residual of a single solve
    x = np.asarray(_solve(blocks, b), dtype=np.float64)
    resid = np.einsum("bij,bj->bi", blocks_np, x.reshape(NB, BC)).reshape(-1) - b_np
    rel_resid = np.linalg.norm(resid) / np.linalg.norm(b_np)
    assert rel_resid < 1e-4, f"fp32 residual gate failed: {rel_resid}"

    def wall(iters: int, reps: int = 3) -> float:
        np.asarray(chained(blocks, b, iters=iters))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            np.asarray(chained(blocks, b, iters=iters))
            best = min(best, time.time() - t0)
        return best

    per_solve_s = (wall(ITERS_HI) - wall(ITERS_LO)) / (ITERS_HI - ITERS_LO)

    ref_s, eigen_s = _baselines(NB)
    out = {
        "metric": f"blockdiag_{NB}x{BR}x{BC}_factorize_solve_walltime",
        "value": round(per_solve_s * 1e3, 4),
        "unit": "ms",
        "vs_baseline": round(ref_s / per_solve_s, 2),
        "baseline": "reference_qrkit_blockdiagonal_same_machine",
        "vs_eigen_sparseqr": round(eigen_s / per_solve_s, 1),
        "gflops": round(_flops(NB, BR, BC) / per_solve_s / 1e9, 3),
        "path": path_used,
    }
    if fallback_error:
        out["fallback_error"] = fallback_error
    print(json.dumps(out))


if __name__ == "__main__":
    main()
