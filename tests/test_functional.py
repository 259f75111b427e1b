"""Fused functional pipelines vs. the class-based solvers and numpy lstsq."""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.functional import (
    block_angular_lstsq,
    block_diagonal_factorize,
    block_diagonal_lstsq,
)


def _blockdiag_dense(blocks):
    nb, br, bc = blocks.shape
    out = np.zeros((nb * br, nb * bc))
    for i in range(nb):
        out[i * br : (i + 1) * br, i * bc : (i + 1) * bc] = blocks[i]
    return out


@pytest.mark.parametrize("pivot", [False, True])
def test_block_diagonal_lstsq(rng, pivot):
    blocks = rng.normal(size=(32, 7, 2))
    dense = _blockdiag_dense(blocks)
    x_true = rng.normal(size=64)
    b = dense @ x_true
    x = np.asarray(block_diagonal_lstsq(jnp.asarray(blocks), jnp.asarray(b), pivot=pivot))
    assert np.allclose(x, x_true, atol=1e-9)


def test_block_diagonal_factorize_consistency(rng):
    blocks = jnp.asarray(rng.normal(size=(8, 5, 3)))
    Q, R, perm = block_diagonal_factorize(blocks, pivot=True)
    recon = np.einsum("bij,bjk->bik", np.asarray(Q)[:, :, :3], np.asarray(R))
    permuted = np.take_along_axis(
        np.asarray(blocks), np.asarray(perm)[:, None, :], axis=2
    )
    assert np.allclose(recon, permuted, atol=1e-10)


@pytest.mark.parametrize("n_shards,tail", [(1, 0), (4, 5), (8, 3)])
def test_block_angular_lstsq(rng, n_shards, tail):
    nb, br, bc, m2 = 24, 3, 1, 5
    blocks = rng.normal(size=(nb, br, bc))
    m = nb * br + tail
    right = rng.normal(size=(m, m2))
    dense = np.zeros((m, nb * bc + m2))
    dense[: nb * br, : nb * bc] = _blockdiag_dense(blocks)[: nb * br]
    dense[:, nb * bc :] = right
    x_true = rng.normal(size=nb * bc + m2)
    b = dense @ x_true
    x = np.asarray(
        block_angular_lstsq(
            jnp.asarray(blocks), jnp.asarray(right), jnp.asarray(b),
            n_shards=n_shards, tail=tail,
        )
    )
    assert np.allclose(x, x_true, atol=1e-8), np.abs(x - x_true).max()


def test_soa_damped_step_matches_aos(rng):
    """The lane-major (SoA) damped LM step must match the generic fused
    block-angular path to fp64 accuracy."""
    import jax.numpy as jnp

    from qrkit_tpu.examples.ellipse import (
        Ellipse,
        _damped_step_aux,
        _damped_step_aux_aos,
        _residuals,
        ellipse_points,
    )

    pts = jnp.asarray(ellipse_points(Ellipse(), 120))
    n = 120
    params = jnp.zeros(n + 5).at[:n].set(jnp.arange(n) * 0.03)
    params = params.at[n].set(6.0).at[n + 1].set(3.0).at[n + 2].set(15.0).at[n + 3].set(20.0).at[n + 4].set(0.1)
    res = _residuals(params, pts)
    for lam in (1e-6, 1e-3, 1.0):
        d_soa = np.asarray(_damped_step_aux(params, res, jnp.asarray(lam), pts))
        d_aos = np.asarray(_damped_step_aux_aos(params, res, jnp.asarray(lam), pts))
        assert np.allclose(d_soa, d_aos, atol=1e-9), (lam, np.abs(d_soa - d_aos).max())


def test_soa_damped_step_multicolumn_matches_aos(rng):
    """General lane-major damped step (bc=2, the 7x2 flagship family) must
    match block_angular_lstsq on the explicitly assembled damped system."""
    import jax.numpy as jnp

    from qrkit_tpu.functional import block_angular_lstsq, lm_damped_step_blockdiag

    nb, bl, bc, m2 = 50, 7, 2, 4
    left = rng.normal(size=(bl, bc, nb))
    right = rng.normal(size=(bl, m2, nb))
    res = rng.normal(size=(bl, nb))
    for lam in (1e-6, 1e-2, 1.0):
        sl = np.sqrt(lam)
        # AoS damped system: per-block [bl + bc, bc] with sqrt(lam) I_bc tail rows
        left_d = np.zeros((nb, bl + bc, bc))
        left_d[:, :bl] = np.transpose(left, (2, 0, 1))
        left_d[:, bl:] = sl * np.eye(bc)
        right_d = np.zeros((nb * (bl + bc) + m2, m2))
        right_rows = np.transpose(right, (2, 0, 1))  # [nb, bl, m2]
        for i in range(nb):
            right_d[i * (bl + bc) : i * (bl + bc) + bl] = right_rows[i]
        right_d[nb * (bl + bc) :] = sl * np.eye(m2)
        rhs = np.zeros(nb * (bl + bc) + m2)
        res_rows = res.T  # [nb, bl]
        for i in range(nb):
            rhs[i * (bl + bc) : i * (bl + bc) + bl] = -res_rows[i]

        ref = np.asarray(
            block_angular_lstsq(
                jnp.asarray(left_d), jnp.asarray(right_d), jnp.asarray(rhs),
                n_shards=1, tail=m2,
            )
        )
        x1, x2 = lm_damped_step_blockdiag(
            jnp.asarray(left), jnp.asarray(right), jnp.asarray(res),
            jnp.asarray(lam),
        )
        got = np.concatenate([np.asarray(x1).T.reshape(-1), np.asarray(x2)])
        assert np.allclose(got, ref, atol=1e-9), (lam, np.abs(got - ref).max())
