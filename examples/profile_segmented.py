"""Stage-level latency budget of the segmented banded solver on hardware.

Times the fused refactorize and solve programs truncated after each stage
(the `upto` static arg of the builders in segmented_factorize/segmented_solve)
as SCAN-CHAINED device steady state — each truncation runs as a
`lax.scan` of data-dependent iterations inside ONE dispatch, timed by the
difference of two chain lengths with a real value fetch as the fence
(tunnel rules — CLAUDE.md).  Round 5: the previous eager per-call
chaining put every truncation behind the tunnel's ~1 ms pipelined
per-dispatch issue latency, whose jitter swamped sub-ms stages (two runs
disagreed 10x on the same solve truncation — BANDED_PERF.md round 4);
in-scan chaining removes the issue path entirely.  Successive differences
of the cumulative times are the per-stage costs.

Usage: python examples/profile_segmented.py [config3|NBLOCKS] [reps]
(`reps` scales the chain lengths: LO=25*reps, HI=225*reps iterations.)
Writes one JSON line; human-readable budget on stderr.  Results land in
BANDED_PERF.md.
"""
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from qrkit_tpu.solvers import SegmentedBandedQR  # noqa: E402
from qrkit_tpu.sparse import SparseCSR  # noqa: E402

BR, BC, OV = 21, 10, 4


def banded_matrix(nb: int, rng) -> SparseCSR:
    step = BC - OV
    ncols = step * nb + OV
    i = np.arange(nb)[:, None, None]
    r = np.arange(BR)[None, :, None]
    c = np.arange(BC)[None, None, :]
    rows = np.broadcast_to(i * BR + r, (nb, BR, BC)).ravel()
    cols = np.broadcast_to(i * step + c, (nb, BR, BC)).ravel()
    keep = cols < ncols
    vals = rng.uniform(0.5, 5.0, size=rows.size)
    return SparseCSR.from_triplets(rows[keep], cols[keep], vals[keep], (BR * nb, ncols))


def _fetch(x):
    return float(np.asarray(x).ravel()[0])


def _time_chain(run, reps):
    """(T(reps) - T(1)) / (reps - 1); run(K) must end with a fetch."""
    run(1)  # warm
    t1 = run(1)
    tk = run(reps)
    return (tk - t1) / (reps - 1)


def main():
    args = sys.argv[1:]
    global BR, BC, OV
    if args and args[0] == "config3":
        BR, BC, OV = 40, 8, 4
        nb = 2499
    else:
        nb = int(args[0]) if args else 1666
    reps = int(args[1]) if len(args) > 1 else 8

    rng = np.random.default_rng(0)
    mat = banded_matrix(nb, rng)
    qr = SegmentedBandedQR(suggested_block_cols=BC, segment_blocks=32)
    qr.compute(mat)
    qr.compute(mat)
    assert qr._delegate is None

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    vals0 = jnp.asarray(np.asarray(mat.data, dtype))
    fac = qr._get_factorize_fn(qr._pallas_active())
    meta = qr._fac_meta

    lo_i, hi_i = 25 * reps, 225 * reps

    def _scan_quotient(chain, args):
        def wall(iters, r=3):
            _fetch(chain(*args, iters=iters))
            best = float("inf")
            for _ in range(r):
                t0 = time.perf_counter()
                _fetch(chain(*args, iters=iters))
                best = min(best, time.perf_counter() - t0)
            return best

        return (wall(hi_i) - wall(lo_i)) / (hi_i - lo_i)

    fac_stages = ["extract", "phase1", "p2slab", "caqr", "chain", "all"]
    if qr._pallas_active():
        # phase-1 sub-stages (Pallas mode): extract already covers the
        # "panels" probe (panel gather + slab gather), so start at shift
        fac_stages[1:1] = ["shift", "soatr", "kernel"]
    fac_cum = {}
    for st in fac_stages:

        @functools.partial(jax.jit, static_argnames=("iters",))
        def fac_chain(vals0, meta, iters, st=st):
            def body(c, _):
                v = vals0 * c
                if st == "all":
                    out = fac(v, meta)
                    # touch EVERY output leaf or XLA dead-code-eliminates
                    # whole stages out of the chained full program
                    probe = sum(
                        x.ravel()[0].astype(dtype)
                        for x in jax.tree_util.tree_leaves(out)
                    )
                else:
                    probe = fac(v, meta, upto=st)
                return 1.0 + 1e-12 * probe.astype(dtype), None

            f, _ = jax.lax.scan(
                body, jnp.asarray(1.0, dtype), None, length=iters
            )
            return f

        fac_cum[st] = _scan_quotient(fac_chain, (vals0, meta))

    b = jnp.asarray(rng.normal(size=mat.nrows))
    qr.solve(b)
    sol = qr._solve_fn
    fargs = (qr._Yws, qr._Ts, qr._Yb, qr._Tb, qr._chain_seq,
             qr._chain_r, qr._j2_top, qr._r_panels)
    sol_stages = ["qt", "chainqt", "backsub2", "rhs", "all"]
    sol_cum = {}
    for st in sol_stages:

        @functools.partial(jax.jit, static_argnames=("iters",))
        def sol_chain(fargs, b, smeta, iters, st=st):
            def body(c, _):
                bb = b * c
                if st == "all":
                    probe = sol(*fargs, bb, smeta).ravel()[0]
                else:
                    probe = sol(*fargs, bb, smeta, upto=st)
                return 1.0 + 1e-12 * probe.astype(dtype), None

            f, _ = jax.lax.scan(
                body, jnp.asarray(1.0, dtype), None, length=iters
            )
            return f

        sol_cum[st] = _scan_quotient(sol_chain, (fargs, b, qr._sol_meta))

    def budget(cum, order):
        out, prev = {}, 0.0
        for st in order:
            out[st] = cum[st] - prev
            prev = cum[st]
        return out

    fac_b = budget(fac_cum, fac_stages)
    sol_b = budget(sol_cum, sol_stages)
    print("# refactorize budget (ms):", file=sys.stderr)
    for st in fac_stages:
        print(f"#   {st:10s} cum {fac_cum[st]*1e3:8.3f}  stage {fac_b[st]*1e3:8.3f}",
              file=sys.stderr)
    print("# solve budget (ms):", file=sys.stderr)
    for st in sol_stages:
        print(f"#   {st:10s} cum {sol_cum[st]*1e3:8.3f}  stage {sol_b[st]*1e3:8.3f}",
              file=sys.stderr)
    print(json.dumps({
        "nblocks": nb,
        "S": qr.S, "L": qr.L, "overlap": qr._overlap,
        "refactorize_cum_ms": {k: round(v * 1e3, 3) for k, v in fac_cum.items()},
        "refactorize_stage_ms": {k: round(v * 1e3, 3) for k, v in fac_b.items()},
        "solve_cum_ms": {k: round(v * 1e3, 3) for k, v in sol_cum.items()},
        "solve_stage_ms": {k: round(v * 1e3, 3) for k, v in sol_b.items()},
        "pallas": bool(qr._pallas_active()),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
