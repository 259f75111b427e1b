"""Lane-major fused block-angular path vs the AoS fused path.

When the caller hands resident lane-major storage (BlockDiagonal.from_soa
left + right_t dense block), BlockAngularQR runs the whole five-step
composition as one lane-major program (fused_soa_compute) — it must be
protocol-equivalent to the AoS fused path: same solutions, health, pivots,
and the same lazily-materialized child surfaces.  Reference pipeline:
BlockAngularSparseQR.h:458-514 (+ solve :305-330).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.containers import BlockDiagonal, BlockMatrix1x2
from qrkit_tpu.solvers import (
    BlockAngularQR,
    BlockDiagonalQR,
    ComputationInfo,
    DenseColPivQR,
    DenseHouseholderQR,
)
from qrkit_tpu.solvers.block_diagonal import QFormat


def _problem(rng, N=60, br=2, bc=1, m2=5, tail=0):
    blocks = rng.uniform(0.5, 5.0, size=(N, br, bc))
    n1 = N * br + tail
    a2 = rng.uniform(0.5, 5.0, size=(n1, m2))
    xt = rng.normal(size=N * bc + m2)
    dense = np.zeros((n1, N * bc + m2))
    for i in range(N):
        dense[i * br : (i + 1) * br, i * bc : (i + 1) * bc] = blocks[i]
    dense[:, N * bc :] = a2
    b = dense @ xt
    return blocks, a2, b, xt, dense


def _mats(blocks, a2, soa: bool):
    N, br, bc = blocks.shape
    n1 = a2.shape[0]
    if soa:
        left = BlockDiagonal.from_soa(
            jnp.asarray(blocks.transpose(1, 2, 0).reshape(br * bc, N)),
            br, bc, nrows=n1,
        )
        return BlockMatrix1x2(
            left, jnp.asarray(np.ascontiguousarray(a2.T)), right_t=True
        )
    return BlockMatrix1x2(
        BlockDiagonal(jnp.asarray(blocks), n1, N * bc), jnp.asarray(a2)
    )


def _solver(colpiv=True):
    right = DenseColPivQR() if colpiv else DenseHouseholderQR()
    return BlockAngularQR(BlockDiagonalQR(QFormat.FULL_Q, pivot=False), right)


@pytest.mark.parametrize("colpiv", [True, False])
@pytest.mark.parametrize("tail", [0, 7])
def test_soa_fused_matches_aos_fused(rng, colpiv, tail):
    blocks, a2, b, xt, dense = _problem(rng, tail=tail)
    qs = _solver(colpiv).compute(_mats(blocks, a2, soa=True))
    qa = _solver(colpiv).compute(_mats(blocks, a2, soa=False))
    assert qs._fused_soa and not qa._fused_soa and qa._fused_dense
    assert qs.info() == ComputationInfo.SUCCESS
    bd = jnp.asarray(b)
    xsa = np.asarray(qs.solve(bd))
    xaa = np.asarray(qa.solve(bd))
    np.testing.assert_allclose(xsa, xt, rtol=0, atol=1e-8)
    np.testing.assert_allclose(xsa, xaa, rtol=0, atol=1e-9)
    # same pivot order as the AoS ColPiv (Eigen downdated-norm semantics)
    np.testing.assert_array_equal(
        np.asarray(qs._fused_perm2), np.asarray(qa._fused_perm2)
    )
    np.testing.assert_allclose(
        np.asarray(qs.r_diagonal()), np.asarray(qa.r_diagonal()),
        rtol=1e-12, atol=1e-12,
    )
    # lazy children: protocol surfaces materialize and agree
    np.testing.assert_allclose(
        np.asarray(qs.matrix_r_dense()), np.asarray(qa.matrix_r_dense()),
        rtol=1e-12, atol=1e-10,
    )
    v = rng.normal(size=dense.shape[0])
    np.testing.assert_allclose(
        np.asarray(qs.apply_qt(jnp.asarray(v))),
        np.asarray(qa.apply_qt(jnp.asarray(v))),
        rtol=1e-12, atol=1e-10,
    )
    assert np.array_equal(
        qs.cols_permutation().indices, qa.cols_permutation().indices
    )


def test_compute_solve_one_call_matches(rng):
    blocks, a2, b, xt, _ = _problem(rng)
    bd = jnp.asarray(b)
    for soa in (True, False):
        qr = _solver()
        x = np.asarray(qr.compute_solve(_mats(blocks, a2, soa=soa), bd))
        np.testing.assert_allclose(x, xt, rtol=0, atol=1e-8)
        # the solver is left fully computed: subsequent solves work
        x2 = np.asarray(qr.solve(bd))
        np.testing.assert_allclose(x2, x, rtol=0, atol=1e-12)
        assert qr.info() == ComputationInfo.SUCCESS


def test_soa_dispatch_pins(rng):
    """SoA compute, solve, and the one-call compute_solve: ONE program each."""
    from qrkit_tpu import count_dispatches

    blocks, a2, b, xt, _ = _problem(rng)
    mat = _mats(blocks, a2, soa=True)
    bd = jnp.asarray(b)
    qr = _solver()
    qr.compute(mat)  # warm
    with count_dispatches() as d:
        qr.compute(mat)
    assert d.count <= 1, f"soa compute dispatched {d.count}"
    qr.solve(bd)
    with count_dispatches() as d:
        qr.solve(bd)
    assert d.count <= 1, f"soa solve dispatched {d.count}"
    qr.compute_solve(mat, bd)
    with count_dispatches() as d:
        qr.compute_solve(mat, bd)
    assert d.count <= 1, f"soa compute_solve dispatched {d.count}"


def test_soa_taller_blocks(rng):
    """The lane-major program is not 2x1-specific: 5x2 blocks, ColPiv."""
    blocks, a2, b, xt, _ = _problem(rng, N=30, br=5, bc=2, m2=4)
    qs = _solver().compute(_mats(blocks, a2, soa=True))
    assert qs._fused_soa
    x = np.asarray(qs.solve(jnp.asarray(b)))
    np.testing.assert_allclose(x, xt, rtol=0, atol=1e-8)
