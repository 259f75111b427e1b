"""End-to-end LM ellipse fitting — the reference example as a test
(/root/reference/examples/ellipse_fitting.cpp:306-334)."""
import numpy as np
import pytest

from qrkit_tpu.examples.ellipse import (
    Ellipse,
    EllipseFitting,
    ellipse_points,
    fit_ellipse,
)
from qrkit_tpu.lm import LMConfig


def test_ellipse_fit_small():
    el = Ellipse(7.5, 2.0, 17.0, 23.0, 0.23)
    pts = ellipse_points(el, 200)
    result, params = fit_ellipse(pts)
    n = pts.shape[1]
    assert result.cost < 1e-12, result.cost
    assert abs(params[n] - el.a) < 1e-6
    assert abs(params[n + 1] - el.b) < 1e-6
    assert abs(params[n + 2] - el.x0) < 1e-6
    assert abs(params[n + 3] - el.y0) < 1e-6
    assert abs(params[n + 4] - el.r) < 1e-6


def test_ellipse_fit_noisy(rng):
    el = Ellipse(5.0, 3.0, -2.0, 4.0, 0.7)
    pts = ellipse_points(el, 300) + rng.normal(scale=1e-3, size=(2, 300))
    result, params = fit_ellipse(pts)
    n = pts.shape[1]
    assert result.cost < 1e-3
    assert abs(params[n] - el.a) < 1e-2
    assert abs(params[n + 1] - el.b) < 1e-2


def test_damped_step_decreases_cost():
    el = Ellipse()
    pts = ellipse_points(el, 100)
    functor = EllipseFitting(pts)
    x0 = functor.initial_params()
    r0 = functor.residuals(x0)
    c0 = float(0.5 * np.vdot(r0, r0))
    delta = functor.damped_step(x0, r0, 1e-3)
    r1 = functor.residuals(x0 + delta)
    c1 = float(0.5 * np.vdot(r1, r1))
    assert c1 < c0


def test_banded_left_variant_matches():
    # reference's second stack (banded left solver): one damped step must match
    # the fused block-diagonal path
    import jax.numpy as jnp

    el = Ellipse()
    pts = ellipse_points(el, 80)
    functor = EllipseFitting(pts)
    x0 = functor.initial_params()
    r0 = functor.residuals(x0)
    d1 = np.asarray(functor.damped_step(x0, r0, 1e-3))
    d2 = np.asarray(functor.damped_step_banded(x0, r0, 1e-3))
    assert np.allclose(d1, d2, atol=1e-8), np.abs(d1 - d2).max()


def test_ellipse_fit_batch_matches_solo(rng):
    """vmapped whole-minimize: every lane of a batched fit must equal the solo
    device fit (finished lanes hold their state while others iterate)."""
    from qrkit_tpu.examples.ellipse import fit_ellipse_batch

    els = [
        Ellipse(7.5, 2.0, 17.0, 23.0, 0.23),
        Ellipse(5.0, 3.0, -2.0, 4.0, 0.7),
        Ellipse(4.0, 1.5, 0.0, 0.0, 1.1),
    ]
    n = 64
    pts_batch = np.stack([ellipse_points(el, n) for el in els])
    cfg = LMConfig(max_iters=40)
    batched = fit_ellipse_batch(pts_batch, cfg)
    assert batched.x.shape == (3, n + 5)
    for i, el in enumerate(els):
        solo, _ = fit_ellipse(pts_batch[i], cfg, loop="device")
        assert np.allclose(batched.x[i], np.asarray(solo.x), atol=1e-9), i
        assert float(batched.cost[i]) < 1e-10
