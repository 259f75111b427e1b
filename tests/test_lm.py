"""LM driver unit tests: gain-ratio correctness and linear-problem behavior.

The reference relies on Eigen's unsupported LevenbergMarquardt; our driver
implements Madsen–Nielsen damping, whose predicted reduction must be
``0.5 δᵀ(λδ − g)`` — on a problem with *linear* residuals the gain ratio is
then exactly 1 (the quadratic model is exact).
"""
import jax
import jax.numpy as jnp
import numpy as np

from qrkit_tpu.lm import LMConfig, levenberg_marquardt, predicted_reduction


def _linear_problem(rng, m=40, n=7):
    A = jnp.asarray(rng.normal(size=(m, n)))
    b = jnp.asarray(rng.normal(size=(m,)))
    residual = lambda x: A @ x - b

    def damped_step(x, r, lam):
        # exact damped minimizer of ||A δ + r||² + λ||δ||²
        H = A.T @ A + lam * jnp.eye(n, dtype=A.dtype)
        return jnp.linalg.solve(H, -(A.T @ r))

    return A, b, residual, damped_step


def test_gain_ratio_is_one_for_quadratic_model(rng):
    A, b, residual, damped_step = _linear_problem(rng)
    x = jnp.asarray(rng.normal(size=(A.shape[1],)))
    r = residual(x)
    for lam in (1e-6, 1e-3, 1.0, 1e3):
        delta = damped_step(x, r, lam)
        cost = 0.5 * float(jnp.vdot(r, r))
        r_new = residual(x + delta)
        cost_new = 0.5 * float(jnp.vdot(r_new, r_new))
        g = jax.vjp(residual, x)[1](r)[0]
        pred = float(predicted_reduction(delta, g, lam))
        rho = (cost - cost_new) / pred
        assert abs(rho - 1.0) < 1e-8, (lam, rho)


def test_predicted_reduction_matches_gauss_newton_model(rng):
    # 0.5 δᵀ(λδ − g) == 0.5(‖r‖² − ‖r + Jδ‖²) for the exact damped minimizer
    A, b, residual, damped_step = _linear_problem(rng, m=30, n=5)
    x = jnp.asarray(rng.normal(size=(5,)))
    r = residual(x)
    lam = 0.37
    delta = damped_step(x, r, lam)
    g = A.T @ r
    pred = float(predicted_reduction(delta, g, lam))
    model = 0.5 * (
        float(jnp.vdot(r, r)) - float(jnp.vdot(r + A @ delta, r + A @ delta))
    )
    assert abs(pred - model) < 1e-10 * max(1.0, abs(model))


def test_linear_problem_converges_fast(rng):
    # with correct rho, λ collapses at the max rate and LM ≈ Gauss–Newton:
    # a linear LS problem must converge in a handful of iterations
    A, b, residual, damped_step = _linear_problem(rng)
    x0 = jnp.zeros(A.shape[1], dtype=A.dtype)
    result = levenberg_marquardt(
        residual, damped_step, x0, LMConfig(max_iters=20)
    )
    x_star, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)
    assert result.iterations <= 6, result.iterations
    assert np.allclose(np.asarray(result.x), x_star, atol=1e-8)
