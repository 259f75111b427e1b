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

Since round 2 the chained loop holds operands resident in the kernel's
preferred layout (round 3: chunk-major AoSoA, ``ops/pallas_blockdiag.to_aosoa``;
the relayout happens once outside the timed region), matching how a real LM
driver keeps its Jacobian on device.  The JSON carries a roofline check:
``bytes_moved``
(HBM bytes one fused factorize+solve must move: A + b + x, padded to the
kernel's 1024-block tile) and ``hbm_frac`` (fraction of the chip's peak HBM
bandwidth achieved — the workload is memory-bound, so this is the honest
"are we at speed of light" number).
"""
import functools
import json
import os
import sys
import time

import numpy as np

# Block count overridable from the CLI (the driver runs the default 10k —
# BASELINE.json config 2; `python bench.py 1000000` records the 1M-block
# single-chip point).  Parsed only when run as a script: other benches import
# helpers from here with their own (non-integer) argv.
NB = (
    int(sys.argv[1])
    if __name__ == "__main__" and len(sys.argv) > 1
    else 10000
)
BR, BC = 7, 2
# wide spread: at ~4 us/solve the hi-lo difference must dwarf ms-level timer
# noise on the ~30 ms tunnel round trip (800 iters x 4 us = 3 ms was within
# best-of-3 jitter and once produced hbm_frac > 1 — physically impossible)
ITERS_LO, ITERS_HI = 1000, 9000


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


_PEAK_HBM_GBPS = {
    # device_kind substring -> peak HBM bandwidth (GB/s), public spec sheets
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v5": 2765.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
    "v4": 1228.0,
}


def _peak_hbm_bytes_per_s(device_kind: str) -> float:
    kind = device_kind.lower()
    for key, gbps in _PEAK_HBM_GBPS.items():
        if key in kind:
            return gbps * 1e9
    return 819.0e9  # conservative default


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

    rng = np.random.default_rng(0)
    blocks_np = rng.uniform(0.5, 5.0, size=(NB, BR, BC))
    x_true = rng.normal(size=NB * BC)
    b_np = np.einsum("bij,bj->bi", blocks_np, x_true.reshape(NB, BC)).reshape(-1)

    path_used = "pallas"
    fallback_error = None
    try:
        from qrkit_tpu.ops.pallas_blockdiag import (
            from_aosoa,
            pallas_block_diagonal_lstsq,
            pallas_block_diagonal_lstsq_aosoa,
            soa_pad,
        )

        # smoke-test the kernel on this backend; fall back to the XLA path on
        # a lowering/compile failure so the bench still produces a number —
        # but TAG the fallback so a Pallas regression is visible in the JSON.
        np.asarray(
            pallas_block_diagonal_lstsq(
                jnp.ones((8, BR, BC), jnp.float32), jnp.ones((8 * BR,), jnp.float32)
            )
        )

        # One-time (untimed) prep into the chunk-major AoSoA resident layout
        # an LM loop keeps (one contiguous 1024-block chunk of all rows per
        # grid step — the flat SoA form's n·4-byte row stride loses HBM
        # throughput past ~500k blocks; see ops/pallas_blockdiag.to_aosoa).
        # The chunk count is padded to a multiple of 10 past 16 chunks so the
        # measured-best cps=10 grid tier applies (round 5; <1% extra pad).
        npad = soa_pad(NB)
        if npad > 16 * 1024:
            npad = -(-npad // (10 * 1024)) * (10 * 1024)
        a_soa_np = np.zeros((BR * BC, npad), np.float32)
        a_soa_np[:, :NB] = blocks_np.transpose(1, 2, 0).reshape(BR * BC, NB)
        for j in range(BC):
            a_soa_np[j * BC + j, NB:] = 1.0  # unit-diagonal pad blocks
        b_soa_np = np.zeros((BR, npad), np.float32)
        b_soa_np[:, :NB] = b_np.reshape(NB, BR).T

        def _to_aosoa_host(v):  # [rows, npad] -> [npad/1024, rows, 8, 128]
            rows = v.shape[0]
            return np.ascontiguousarray(
                np.moveaxis(v.reshape(rows, npad // 1024, 8, 128), 0, 1)
            )

        op_a = jnp.asarray(_to_aosoa_host(a_soa_np))
        op_b = jnp.asarray(_to_aosoa_host(b_soa_np))

        def _solve(a, b):
            return pallas_block_diagonal_lstsq_aosoa(a, b)

        def _extract_x(xdev):
            x_soa = np.asarray(from_aosoa(xdev), np.float64)
            return x_soa[:, :NB].T.reshape(-1)

        def _chain_body(carry, a, b):
            # data dependency via the kernel's VMEM delta-tile input: every
            # solve's rhs depends on one tile of the previous solution at
            # ZERO extra HBM traffic beyond that tile.  Round 5: this
            # replaced the SMEM b_scale/stepnorm carry, whose scalar staging
            # measured ~0.9 µs of per-launch sync and serialized launches —
            # the delta tile rides the vector dataflow, so the (carry-free)
            # A/b streams of consecutive solves overlap: 2.9 → 1.9 µs at
            # 10k blocks, 0.69 → 0.94 of HBM peak at 1M.
            x = pallas_block_diagonal_lstsq_aosoa(a, b, b_delta=carry)
            return x[0, 0:1, 0:1, :] * 1e-12, None

        chain_init = jnp.zeros((1, 1, 128), jnp.float32)
        bytes_moved = (BR * BC + BR + BC) * npad * 4
    except Exception as e:  # lowering/compile errors vary by backend version
        path_used = "xla"
        fallback_error = f"{type(e).__name__}: {e}"[:200]
        from qrkit_tpu.functional import block_diagonal_lstsq

        op_a = jnp.asarray(blocks_np, dtype=jnp.float32)
        op_b = jnp.asarray(b_np, dtype=jnp.float32)

        def _solve(blocks, b):
            return block_diagonal_lstsq(blocks, b, pivot=False)

        def _extract_x(xdev):
            return np.asarray(xdev, np.float64)

        def _chain_body(carry, a, b):
            x = _solve(a, carry)
            # multiplicative nudge keeps every solve data-dependent on the
            # previous one; costs one extra pass over b per iteration.
            # (A single-element at[].add() would be O(1) traffic but sends
            # the TPU backend into a pathological >20-minute compile.)
            return carry * (1.0 + 1e-12 * x[0]), None

        chain_init = op_b
        bytes_moved = (BR * BC + BR + BC) * NB * 4

    # chain_init rides as a jit ARGUMENT — a closure-captured device array
    # would be baked into the executable via a trace-time fetch (CLAUDE.md:
    # baked multi-MB constants degraded every later transfer in the process)
    @functools.partial(jax.jit, static_argnames=("iters",))
    def chained(a, b, init, iters):
        def body(carry, _):
            return _chain_body(carry, a, b)

        # unroll=8 trims the XLA while-loop bookkeeping between launches
        # (measured 2.13 -> 1.98 us at 10k once the delta-tile carry made
        # the loop body launch-bound)
        final, _ = jax.lax.scan(body, init, None, length=iters, unroll=8)
        # the final carry depends on EVERY solve in the chain; returning it
        # (rather than stacking per-iter probes) also drops the per-iteration
        # dynamic-update-slice the xs collection used to pay
        return final.ravel()[0]

    # correctness gate: fp32 relative residual of a single solve
    x = _extract_x(_solve(op_a, op_b))
    resid = np.einsum("bij,bj->bi", blocks_np, x.reshape(NB, BC)).reshape(-1) - b_np
    rel_resid = np.linalg.norm(resid) / np.linalg.norm(b_np)
    assert rel_resid < 1e-4, f"fp32 residual gate failed: {rel_resid}"
    if path_used == "pallas":
        # the timed loop runs the delta-tile kernel variant; at delta 0 it
        # must reproduce the gated solution
        xs1 = _extract_x(
            pallas_block_diagonal_lstsq_aosoa(
                op_a, op_b, b_delta=jnp.zeros((1, 1, 128), jnp.float32)
            )
        )
        assert np.allclose(xs1, x, rtol=0, atol=1e-6), "delta-kernel mismatch"

    def wall(iters: int, reps: int = 3) -> float:
        np.asarray(chained(op_a, op_b, chain_init, iters=iters))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            np.asarray(chained(op_a, op_b, chain_init, iters=iters))
            best = min(best, time.time() - t0)
        return best

    per_solve_s = (wall(ITERS_HI) - wall(ITERS_LO)) / (ITERS_HI - ITERS_LO)

    peak_bw = _peak_hbm_bytes_per_s(jax.devices()[0].device_kind)
    ref_s, eigen_s = _baselines(NB)
    out = {
        "metric": f"blockdiag_{NB}x{BR}x{BC}_factorize_solve_walltime",
        "value": round(per_solve_s * 1e3, 4),
        "unit": "ms",
        "vs_baseline": round(ref_s / per_solve_s, 2),
        "baseline": "reference_qrkit_blockdiagonal_same_machine",
        "vs_eigen_sparseqr": round(eigen_s / per_solve_s, 1),
        "gflops": round(_flops(NB, BR, BC) / per_solve_s / 1e9, 3),
        "bytes_moved": bytes_moved,
        "hbm_frac": round(bytes_moved / per_solve_s / peak_bw, 4),
        "path": path_used,
    }
    if fallback_error:
        out["fallback_error"] = fallback_error
    print(json.dumps(out))


if __name__ == "__main__":
    main()
