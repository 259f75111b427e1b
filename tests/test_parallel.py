"""Multi-device tests on the virtual 8-device CPU mesh — distribution coverage
the reference never needed (it is single-process; SURVEY §4, §5.8)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.containers import BlockDiagonal, BlockMatrix1x2
from qrkit_tpu.parallel import TSQRDenseQR, default_mesh, shard_leading_axis
from qrkit_tpu.solvers import BlockAngularQR, BlockDiagonalQR, QFormat


def test_tsqr_single_shard(rng):
    A = rng.normal(size=(40, 5))
    qr = TSQRDenseQR(n_shards=1).compute(jnp.asarray(A))
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(Q @ R, A, atol=1e-10)
    assert np.allclose(Q.T @ Q, np.eye(40), atol=1e-10)


@pytest.mark.parametrize("m,s", [(64, 4), (61, 4), (80, 8), (29, 8)])
def test_tsqr_sharded(rng, m, s):
    n = 5
    A = rng.normal(size=(m, n))
    qr = TSQRDenseQR(n_shards=s).compute(jnp.asarray(A))
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(Q @ R, A, atol=1e-9), np.abs(Q @ R - A).max()
    assert np.allclose(Q.T @ Q, np.eye(m), atol=1e-9)
    # R matches a reference QR up to column signs
    Rref = np.linalg.qr(A, mode="r")
    assert np.allclose(np.abs(R[:n]), np.abs(Rref), atol=1e-9)
    # LS round trip
    x_true = rng.normal(size=n)
    x = np.asarray(qr.solve(jnp.asarray(A @ x_true)))
    assert np.allclose(x, x_true, atol=1e-8)


def test_tsqr_on_mesh(rng):
    mesh = default_mesh()
    s = mesh.devices.size
    A = rng.normal(size=(16 * s, 7))
    qr = TSQRDenseQR(n_shards=s, mesh=mesh).compute(jnp.asarray(A))
    Q = np.asarray(qr.matrix_q_dense())
    R = np.asarray(qr.matrix_r_dense())
    assert np.allclose(Q @ R, A, atol=1e-9)


def test_sharded_block_diagonal(rng):
    """Public distribution API: mesh= on the solver, no private attributes."""
    mesh = default_mesh()
    ndev = mesh.devices.size
    nb = ndev * 8
    blocks = rng.normal(size=(nb, 7, 2))
    blk = BlockDiagonal.from_dense_batch(jnp.asarray(blocks))
    qr = BlockDiagonalQR(QFormat.FULL_Q, mesh=mesh).compute(blk)
    qr_ref = BlockDiagonalQR(QFormat.FULL_Q).compute(blk)
    assert np.allclose(np.asarray(qr.R), np.asarray(qr_ref.R), atol=1e-12)
    # factor outputs keep the sharding on the block axis
    shard_count = len(qr.Q.sharding.device_set)
    assert shard_count == ndev

    dense = blk.to_dense()
    x_true = rng.normal(size=blk.ncols)
    x = np.asarray(qr.solve(jnp.asarray(dense @ x_true)))
    assert np.allclose(x, x_true, atol=1e-8)


def test_sharded_block_angular_end_to_end(rng):
    """Full composition on the mesh: sharded block-diagonal left + TSQR right."""
    mesh = default_mesh()
    ndev = mesh.devices.size
    nb = ndev * 4
    left_blocks = rng.normal(size=(nb, 3, 1))
    blk = BlockDiagonal.from_dense_batch(jnp.asarray(left_blocks))
    right = rng.normal(size=(blk.nrows, 4))

    dense = np.concatenate([blk.to_dense(), right], axis=1)

    qr = BlockAngularQR(
        BlockDiagonalQR(QFormat.FULL_Q, pivot=False, mesh=mesh),
        TSQRDenseQR(n_shards=ndev, mesh=mesh),
        mesh=mesh,
    ).compute(BlockMatrix1x2(blk, jnp.asarray(right)))

    x_true = rng.normal(size=dense.shape[1])
    b = dense @ x_true
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-8), np.abs(x - x_true).max()


def test_soa_damped_step_sharded_matches(rng):
    """The lane-major damped LM step shards over the block/lane axis: XLA
    inserts the cross-shard reductions for the bottom-panel QR; results must
    equal the unsharded run."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qrkit_tpu.examples.ellipse import (
        Ellipse,
        _damped_step_aux,
        _residuals,
        ellipse_points,
    )
    from qrkit_tpu.parallel import default_mesh

    mesh = default_mesh()
    n = 16 * mesh.devices.size
    pts = jnp.asarray(ellipse_points(Ellipse(), n))
    params = jnp.zeros(n + 5).at[:n].set(jnp.arange(n) * 0.02)
    params = params.at[n].set(6.0).at[n + 1].set(3.0).at[n + 2].set(15.0).at[n + 3].set(20.0)
    res = _residuals(params, pts)
    lam = jnp.asarray(1e-3)
    d_ref = np.asarray(_damped_step_aux(params, res, lam, pts))
    pts_sh = jax.device_put(pts, NamedSharding(mesh, P(None, "dp")))
    step = jax.jit(_damped_step_aux, in_shardings=(None, None, None, NamedSharding(mesh, P(None, "dp"))))
    d_sh = np.asarray(step(params, res, lam, pts_sh))
    assert np.allclose(d_sh, d_ref, atol=1e-9), np.abs(d_sh - d_ref).max()
