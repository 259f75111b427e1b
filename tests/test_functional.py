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
