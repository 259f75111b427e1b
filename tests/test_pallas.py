"""Pallas fused tiny-block kernels vs. the XLA reference path (interpret mode
on CPU; the compiled path is exercised on real TPU by bench.py / verify)."""
import jax.numpy as jnp
import numpy as np
import pytest

from qrkit_tpu.functional import block_diagonal_lstsq
from qrkit_tpu.ops.pallas_blockdiag import (
    pallas_block_diagonal_lstsq,
    pallas_block_diagonal_qr_r,
)


@pytest.mark.parametrize("nb,br,bc", [(700, 7, 2), (64, 3, 1), (1024, 5, 3)])
def test_pallas_lstsq_matches_xla(rng, nb, br, bc):
    blocks = rng.uniform(0.5, 5.0, size=(nb, br, bc)).astype(np.float32)
    x_true = rng.normal(size=nb * bc).astype(np.float32)
    b = np.einsum(
        "bij,bj->bi", blocks.astype(np.float64), x_true.reshape(nb, bc).astype(np.float64)
    ).astype(np.float32).reshape(-1)
    xp = np.asarray(
        pallas_block_diagonal_lstsq(jnp.asarray(blocks), jnp.asarray(b), interpret=True)
    )
    xx = np.asarray(block_diagonal_lstsq(jnp.asarray(blocks), jnp.asarray(b), pivot=False))
    assert np.allclose(xp, x_true, atol=5e-4)
    assert np.allclose(xp, xx, atol=5e-4)


def test_pallas_qr_r(rng):
    nb, br, bc = 300, 7, 2
    blocks = rng.uniform(0.5, 5.0, size=(nb, br, bc)).astype(np.float32)
    r = np.asarray(pallas_block_diagonal_qr_r(jnp.asarray(blocks), interpret=True))
    rref = np.stack([np.linalg.qr(blocks[i], mode="r") for i in range(nb)])
    packed = np.stack([rref[:, 0, 0], rref[:, 0, 1], rref[:, 1, 1]], axis=1)
    # R unique up to row signs
    assert np.allclose(np.abs(r), np.abs(packed), atol=5e-5)


def test_pallas_nonmultiple_tile(rng):
    # nb far from a multiple of the lane tile exercises the padding path
    nb, br, bc = 513, 7, 2
    blocks = rng.uniform(0.5, 5.0, size=(nb, br, bc)).astype(np.float32)
    x_true = rng.normal(size=nb * bc).astype(np.float32)
    b = np.einsum("bij,bj->bi", blocks, x_true.reshape(nb, bc)).reshape(-1)
    xp = np.asarray(
        pallas_block_diagonal_lstsq(jnp.asarray(blocks), jnp.asarray(b), interpret=True)
    )
    assert np.allclose(xp, x_true, atol=5e-4)
