"""One-dispatch fused programs for the dense-A2 block-angular stack.

The generic :class:`~qrkit_tpu.solvers.block_angular.BlockAngularQR`
composition runs each sub-solver method as eager jax ops — measured at ~42
program executions per warm recompute and ~87 per solve on the flagship
``BlockDiagonalQR (2x1, FULL_Q, no pivot) left + dense right`` stack, each a
pipelined launch (~1-3 ms) through the accelerator tunnel, i.e. two orders
of magnitude of pure launch latency on problems whose math is sub-millisecond.
These builders fuse the reference pipeline (compute steps 1-5 of
/root/reference/src/QRKit/BlockAngularSparseQR.h:458-514 and the `_solve_impl`
shape of :305-330) into ONE compiled program each for that stack; the caller
(`BlockAngularQR.compute` / `.solve`) populates the sub-solver objects from
the outputs so every other protocol method behaves exactly as the generic
path.

Applicability (checked by the caller): left is ``BlockDiagonalQR`` with
``FULL_Q``, ``pivot=False``, portrait blocks, no zero-column tail and no
mesh; right is ``DenseColPivQR`` or ``DenseHouseholderQR``; A2 is dense with
at least ``m2`` rows below the economy band.  Row tail rows (beyond
``nb*br``) pass through Q1 with identity, matching
``BlockDiagonalQR.apply_qt``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.householder import (
    apply_wy,
    build_t_factor,
    colpiv_householder_qr,
    form_q,
    highest_precision,
    panel_qr_yt,
    rank_from_diag,
    rank_masked_triangular_solve,
)
from .base import _diag_health

__all__ = ["fused_dense_compute", "fused_dense_solve"]


@functools.partial(jax.jit, static_argnames=("bc", "colpiv"))
@highest_precision
def fused_dense_compute(blocks, a2, *, bc: int, colpiv: bool):
    """blocks [nb, br, bc], a2 [n1, m2] -> the whole composite factorization.

    Returns ``(Q, R, j2_top, Y2, T2, R2, perm2, r12, h1, h2)`` — exactly the
    arrays the two sub-solvers and the composite glue would have produced:
    per-block full Q/R (steps 1), Q1ᵀA2 split at the economy band (steps
    2-3), the right QR of the bottom rows, and R12 = top rows in the right
    solver's column order (step 4).  ``h1``/``h2`` are each child's own
    health scalar with its own zero-pivot semantics (the composite
    ``_set_success`` combines them exactly as on the generic path)."""
    nb, br, _ = blocks.shape
    m2 = a2.shape[1]

    # step 1: batched per-block QR (BlockDiagonalQR._factorize_blocks,
    # pivot=False), full Q
    def one(a):
        Y, T, Ared = panel_qr_yt(a)
        return form_q(Y, T), jnp.triu(Ared[:bc])

    Q, R = jax.vmap(one)(blocks)

    # steps 2-3: J2 = Q1ᵀ A2 with FULL_Q row coordinates — econ rows
    # (0..nb*bc) then complement rows then the identity pass-through tail
    body = a2[: nb * br].reshape(nb, br, m2)
    outb = jnp.einsum("bij,bik->bjk", Q, body)
    j2_top = outb[:, :bc].reshape(nb * bc, m2)
    j2_bot = jnp.concatenate(
        [outb[:, bc:].reshape(nb * (br - bc), m2), a2[nb * br :]], axis=0
    )

    if colpiv:
        Y2, taus2, R2raw, perm2 = colpiv_householder_qr(j2_bot)
        T2 = build_t_factor(Y2, taus2)
        R2 = jnp.triu(R2raw)
        h2 = _diag_health(jnp.diagonal(R2), check_zero=False)
        r12 = j2_top[:, perm2]
    else:
        Y2, T2, R2raw = panel_qr_yt(j2_bot)
        R2 = jnp.triu(R2raw)
        perm2 = jnp.arange(m2, dtype=jnp.int32)
        h2 = _diag_health(jnp.diagonal(R2), check_zero=True)
        r12 = j2_top

    h1 = _diag_health(
        jnp.diagonal(R, axis1=1, axis2=2).reshape(-1), check_zero=True
    )
    return Q, R, j2_top, Y2, T2, R2, perm2, r12, h1, h2


@functools.partial(jax.jit, static_argnames=("bc", "colpiv"))
@highest_precision
def fused_dense_solve(Q, R, Y2, T2, R2, perm2, r12, b, *, bc: int, colpiv: bool):
    """Least-squares solve against the fused factorization, one program.

    Same math as ``QRSolver.solve`` through the composite: per-block Q1ᵀb,
    right Q2ᵀ on the bottom rows, R2 back-substitution (rank-masked for the
    ColPiv right), R12 elimination, per-block R1 back-substitution, and the
    right block's column back-permutation applied on device."""
    nb, br, _ = Q.shape
    m2 = R2.shape[1]
    m1 = nb * bc
    body = b[: nb * br].reshape(nb, br)
    outb = jnp.einsum("bij,bi->bj", Q, body)
    y_top = outb[:, :bc].reshape(m1)
    y_bot = jnp.concatenate([outb[:, bc:].reshape(-1), b[nb * br :]])

    y2 = apply_wy(Y2, T2, y_bot[:, None], transpose=True)[:, 0]
    R2sq = R2[:m2, :m2]
    if colpiv:
        k = rank_from_diag(jnp.diagonal(R2sq), Y2.shape[0], m2)
        x2 = rank_masked_triangular_solve(R2sq, y2[:m2], k)
    else:
        x2 = jax.lax.linalg.triangular_solve(
            R2sq, y2[:m2, None], left_side=True, lower=False
        )[:, 0]

    rhs1 = (y_top - r12 @ x2).reshape(nb, bc, 1)
    x1 = jax.lax.linalg.triangular_solve(
        R, rhs1, left_side=True, lower=False
    ).reshape(m1)

    # composed back-permutation: left is identity (no pivot, no tail), so
    # only the right block permutes — x[m1 + perm2[i]] = x2[i]
    inv2 = jnp.zeros_like(perm2).at[perm2].set(
        jnp.arange(m2, dtype=perm2.dtype)
    )
    return jnp.concatenate([x1, x2[inv2]])
