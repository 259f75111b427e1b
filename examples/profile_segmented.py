"""Stage-level latency budget of the segmented banded solver on hardware.

Times the fused refactorize and solve programs truncated after each stage
(the `upto` static arg of the builders in segmented_factorize/segmented_solve)
with the difference-of-two-rep-counts quotient, each rep on fresh values and
every timing fenced by an actual value fetch (tunnel rules — CLAUDE.md).
Successive differences of the cumulative times are the per-stage costs.

Usage: python examples/profile_segmented.py [config3|NBLOCKS] [reps]
Writes one JSON line; human-readable budget on stderr.  Results land in
BANDED_PERF.md.
"""
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

    fac_stages = ["extract", "phase1", "p2slab", "caqr", "chain", "all"]
    fac_cum = {}
    for st in fac_stages:
        def run(K, st=st):
            t0 = time.perf_counter()
            v = vals0
            for i in range(K):
                v = v * dtype(1 + 1e-9)
                out = fac(v, meta) if st == "all" else fac(v, meta, upto=st)
            _fetch(out[2] if st == "all" else out)
            return time.perf_counter() - t0
        fac_cum[st] = _time_chain(run, reps)

    b = jnp.asarray(rng.normal(size=mat.nrows))
    qr.solve(b)
    sol = qr._solve_fn
    fargs = (qr._Yws, qr._Ts, qr._Yb, qr._Tb, qr._chain_seq,
             qr._chain_r, qr._j2_top, qr._r_panels)
    sol_stages = ["qt", "chainqt", "backsub2", "rhs", "all"]
    sol_cum = {}
    for st in sol_stages:
        def run(K, st=st):
            t0 = time.perf_counter()
            bb = b
            for i in range(K):
                bb = bb * dtype(1 + 1e-9)
                out = (sol(*fargs, bb, qr._sol_meta) if st == "all"
                       else sol(*fargs, bb, qr._sol_meta, upto=st))
            _fetch(out)
            return time.perf_counter() - t0
        sol_cum[st] = _time_chain(run, reps)

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
