"""Levenberg–Marquardt driver over structured QR solvers.

The reference drives its solvers through Eigen's unsupported
``LevenbergMarquardt`` + ``SparseFunctor`` (examples/ellipse_fitting.cpp:255-270,
bench/bench_sparse_qr_extra.cpp:332-341).  This driver keeps the same shape —
residual functor + structured-Jacobian functor + a QR solve per iteration — but
solves the damped normal equations the structure-preserving way: the step
minimizes ``||[J; √λ·D] δ + [r; 0]||``, where the damping rows are row-permuted
into the Jacobian's block structure (the pattern validated by the reference's
own test, test-utils.cpp:254-274 — damping a 7x2 block-diagonal Jacobian yields
9x2 blocks), so one static structure plan serves every iteration and every
λ value: factorization stays a cache-hit jitted call.

λ adaptation follows Madsen–Nielsen (gain-ratio) — host-side control flow, as
iteration acceptance is inherently data-dependent.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["LMConfig", "LMResult", "levenberg_marquardt"]


@dataclasses.dataclass
class LMConfig:
    max_iters: int = 100
    ftol: float = 1e-10
    xtol: float = 1e-10
    gtol: float = 1e-12
    lambda_init: float = 1e-3
    lambda_min: float = 1e-12
    lambda_max: float = 1e10


class LMResult(NamedTuple):
    x: jnp.ndarray
    cost: float
    iterations: int
    converged: bool
    lambda_final: float


def levenberg_marquardt(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    damped_step_fn: Callable[[jnp.ndarray, jnp.ndarray, float], jnp.ndarray],
    x0: jnp.ndarray,
    config: Optional[LMConfig] = None,
) -> LMResult:
    """Generic LM loop.

    ``damped_step_fn(x, r, lam)`` must return the least-squares minimizer of
    ``||J(x) δ + r||² + lam ||δ||²`` — typically by a structured QR of the
    damped Jacobian (see qrkit_tpu.examples.ellipse for the canonical setup).
    """
    cfg = config or LMConfig()
    x = jnp.asarray(x0)
    r = residual_fn(x)
    cost = float(0.5 * jnp.vdot(r, r).real)
    lam = cfg.lambda_init
    nu = 2.0
    converged = False
    it = 0
    for it in range(1, cfg.max_iters + 1):
        delta = damped_step_fn(x, r, lam)
        x_new = x + delta
        r_new = residual_fn(x_new)
        cost_new = float(0.5 * jnp.vdot(r_new, r_new).real)
        # gain ratio: actual reduction vs predicted reduction of the damped model
        # pred = 0.5 δᵀ(λ δ - Jᵀ r); use λ||δ||² - δᵀ g with g ≈ from step eqn
        dn = float(jnp.vdot(delta, delta).real)
        predicted = max(0.5 * lam * dn + 1e-300, 1e-300)
        rho = (cost - cost_new) / predicted

        if cost_new < cost:
            # accept
            step_small = float(jnp.linalg.norm(delta)) <= cfg.xtol * (
                float(jnp.linalg.norm(x)) + cfg.xtol
            )
            cost_red_small = (cost - cost_new) <= cfg.ftol * max(cost, 1e-300)
            x, r, cost = x_new, r_new, cost_new
            lam = max(lam * max(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3), cfg.lambda_min)
            nu = 2.0
            if step_small or cost_red_small:
                converged = True
                break
        else:
            lam = min(lam * nu, cfg.lambda_max)
            nu = min(nu * 2.0, 64.0)
            if lam >= cfg.lambda_max:
                break
    return LMResult(x, cost, it, converged, lam)
