"""Bundle adjustment end-to-end — block-angular composition on the problem
family the reference targets (README.md:3-6): block-diagonal point blocks,
sparse shared camera columns, LM with structure-preserving damping."""
import jax.numpy as jnp
import numpy as np

from qrkit_tpu.examples.bundle import _BundleStep, fit_bundle, make_scene, residuals
from qrkit_tpu.lm import LMConfig
from qrkit_tpu.solvers import ComputationInfo


def test_bundle_converges_clean():
    cams, pts, uv = make_scene(n_cams=3, n_pts=24, noise=0.0, seed=3)
    rng = np.random.default_rng(7)
    cams0 = cams + 0.02 * rng.normal(size=cams.shape)
    pts0 = pts + 0.05 * rng.normal(size=pts.shape)
    res = fit_bundle(cams0, pts0, uv, LMConfig(max_iters=60))
    # clean observations: some zero-cost configuration exists (the true one);
    # convergence is to ~machine-precision reprojection error
    assert res.cost < 1e-16, res.cost
    r = residuals(res.x, jnp.asarray(uv))
    assert float(jnp.abs(r).max()) < 1e-7


def test_bundle_step_structure():
    """One damped step: the composite solver reports a healthy factorization,
    the sparse-A2 path engages, and the step decreases the cost."""
    cams, pts, uv = make_scene(n_cams=3, n_pts=16, noise=0.01, seed=1)
    rng = np.random.default_rng(2)
    x = jnp.concatenate(
        [
            jnp.asarray(pts + 0.05 * rng.normal(size=pts.shape)).reshape(-1),
            jnp.asarray(cams + 0.02 * rng.normal(size=cams.shape)).reshape(-1),
        ]
    )
    uvd = jnp.asarray(uv)
    r = residuals(x, uvd)
    step = _BundleStep(uv)
    delta = step(x, r, 1e-3)
    qr = step.last_qr
    assert qr.info() == ComputationInfo.SUCCESS
    # the sparse camera block stayed sparse through solveRightBlock
    assert qr._r12_coo is not None
    r_new = residuals(x + delta, uvd)
    assert float(jnp.vdot(r_new, r_new).real) < float(jnp.vdot(r, r).real)


def test_bundle_noisy_recovery():
    """With measurement noise the fit converges to a cost at the noise level
    (not below — no overfitting capacity — and far below the initial cost)."""
    noise = 1e-3
    cams, pts, uv = make_scene(n_cams=4, n_pts=20, noise=noise, seed=5)
    rng = np.random.default_rng(11)
    cams0 = cams + 0.02 * rng.normal(size=cams.shape)
    pts0 = pts + 0.05 * rng.normal(size=pts.shape)
    x0 = jnp.concatenate([jnp.asarray(pts0).reshape(-1), jnp.asarray(cams0).reshape(-1)])
    cost0 = 0.5 * float(jnp.vdot(residuals(x0, jnp.asarray(uv)), residuals(x0, jnp.asarray(uv))).real)
    res = fit_bundle(cams0, pts0, uv, LMConfig(max_iters=60))
    nres = uv.size
    # gauge freedom lets LM fit some noise; the floor is O(noise^2 * nres)
    assert res.cost < 2.0 * 0.5 * noise**2 * nres
    assert res.cost < 0.5 * cost0
    assert res.converged


def test_bundle_device_matches_host_loop():
    """fit_bundle_device (one compiled while_loop) reaches the same quality
    as the host-loop class-API driver on a noisy scene."""
    from qrkit_tpu import LMConfig
    from qrkit_tpu.examples.bundle import fit_bundle_device

    cams, pts, uv = make_scene(n_cams=3, n_pts=24, noise=1e-3, seed=5)
    rng = np.random.default_rng(11)
    cams0 = cams + 0.02 * rng.normal(size=cams.shape)
    pts0 = pts + 0.02 * rng.normal(size=pts.shape)
    res = fit_bundle_device(cams0, pts0, uv, LMConfig(max_iters=60))
    n_obs = 2 * 24 * 3
    rms = float(np.sqrt(2.0 * res.cost / n_obs))
    assert rms < 5e-3  # down at the noise level


def test_bundle_device_sharded_matches(rng):
    """Point-axis sharded fit_bundle_device (mesh=) must reach the same
    optimum as the single-device run — the sharded TSQR changes reduction
    order, not math."""
    from qrkit_tpu.examples.bundle import fit_bundle_device
    from qrkit_tpu.parallel import default_mesh

    mesh = default_mesh()
    n_pts = int(mesh.devices.size) * 4
    cams, pts, uv = make_scene(n_cams=2, n_pts=n_pts, noise=0.0, seed=9)
    prng = np.random.default_rng(13)
    cams0 = cams + 0.02 * prng.normal(size=cams.shape)
    pts0 = pts + 0.05 * prng.normal(size=pts.shape)
    cfg = LMConfig(max_iters=40)
    r_ref = fit_bundle_device(cams0, pts0, uv, cfg)
    r_sh = fit_bundle_device(cams0, pts0, uv, cfg, mesh=mesh)
    assert r_sh.cost < 1e-14, r_sh.cost
    assert np.allclose(r_sh.x, r_ref.x, atol=1e-6), np.abs(r_sh.x - r_ref.x).max()
