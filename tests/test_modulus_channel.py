"""ModulusChannel posterior/SE tests.

The reference leaves ModulusChannel posteriors unimplemented
(tramp/channels/activation/modulus_channel.py:29-37 raises
NotImplementedError), so there is no reference oracle: correctness is
established against (a) a brute-force 2D grid integration of the tilted
density over the complex plane, (b) autodiff conjugacy of the quadrature
log-partition, and (c) the Bayes-optimal Monte-Carlo ensemble (Nishimori
consistency: SE error == E[posterior variance] == E[(z*-rz)^2]).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tramp_tpu.channels.modulus_channel import ModulusChannel


def grid_oracle(az, bzr, bzi, ax, bx, n=2001, R=None):
    "Brute-force moments of p(z) ~ exp(-(az+ax)|z|^2/2 + bz.z + bx|z|)."
    a = az + ax
    r_peak = (abs(bx) + np.hypot(bzr, bzi) + np.sqrt(4 * a)) / a
    R = R or (r_peak + 14.0 / np.sqrt(a))
    zr = np.linspace(-R, R, n)
    ZR, ZI = np.meshgrid(zr, zr, indexing="ij")
    rho = np.hypot(ZR, ZI)
    logp = -0.5 * a * rho**2 + bzr * ZR + bzi * ZI + bx * rho
    logmax = logp.max()
    p = np.exp(logp - logmax)
    dA = (zr[1] - zr[0]) ** 2
    Z = p.sum() * dA
    Ezr = (p * ZR).sum() * dA / Z
    Ezi = (p * ZI).sum() * dA / Z
    Erho = (p * rho).sum() * dA / Z
    Erho2 = (p * rho**2).sum() * dA / Z
    return dict(
        rzr=Ezr, rzi=Ezi, vz=0.5 * (Erho2 - Ezr**2 - Ezi**2),
        rx=Erho, vx=Erho2 - Erho**2, logZ=np.log(Z) + logmax)


CASES = [
    (1.0, 0.5, -0.3, 1.0, 0.2),
    (2.0, 3.0, 4.0, 0.5, -1.0),
    (0.5, 0.0, 0.0, 1.5, 2.0),
    (10.0, 8.0, -2.0, 5.0, 10.0),
    (100.0, 50.0, 10.0, 0.1, -5.0),
]


@pytest.mark.parametrize("az,bzr,bzi,ax,bx", CASES)
def test_modulus_channel_posterior_vs_grid_oracle(az, bzr, bzi, ax, bx):
    ch = ModulusChannel(isotropic=False)
    bz = jnp.array([[bzr], [bzi]])
    bxa = jnp.array([bx])
    rz, vz = ch.compute_backward_posterior(az, bz, ax, bxa)
    rx, vx = ch.compute_forward_posterior(az, bz, ax, bxa)
    logZ = ch.compute_log_partition(az, bz, ax, bxa)
    o = grid_oracle(az, bzr, bzi, ax, bx)
    atol = 2e-6
    np.testing.assert_allclose(float(rz[0, 0]), o["rzr"], atol=atol)
    np.testing.assert_allclose(float(rz[1, 0]), o["rzi"], atol=atol)
    np.testing.assert_allclose(float(vz[0]), o["vz"], atol=atol)
    np.testing.assert_allclose(float(rx[0]), o["rx"], atol=atol)
    np.testing.assert_allclose(float(vx[0]), o["vx"], atol=atol)
    np.testing.assert_allclose(float(logZ), o["logZ"], rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("az,bzr,bzi,ax,bx", CASES[:3])
def test_modulus_channel_moments_are_log_partition_gradients(
        az, bzr, bzi, ax, bx):
    "rz = dA/dbz, rx = dA/dbx, vx = d2A/dbx2 (conjugacy of the quadrature)."
    ch = ModulusChannel(isotropic=False)

    def A(bz, bx):
        return ch.compute_log_partition(az, bz, ax, bx)

    bz = jnp.array([[bzr], [bzi]])
    bxa = jnp.array([bx])
    g_bz = jax.grad(A, argnums=0)(bz, bxa)
    g_bx = jax.grad(lambda b: A(bz, b))(bxa)
    h_bx = jax.grad(lambda b: jax.grad(lambda bb: A(bz, bb).sum())(b).sum())(
        bxa)
    rz, _ = ch.compute_backward_posterior(az, bz, ax, bxa)
    rx, vx = ch.compute_forward_posterior(az, bz, ax, bxa)
    np.testing.assert_allclose(np.asarray(g_bz), np.asarray(rz), rtol=1e-6,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(g_bx), np.asarray(rx), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h_bx), np.asarray(vx), rtol=1e-5)


def test_modulus_channel_beliefs_measure_normalized():
    ch = ModulusChannel()
    for az, ax, tau_z in [(2.0, 1.0, 0.7), (5.0, 0.1, 0.7), (1.2, 0.5, 0.7)]:
        mu = ch.beliefs_measure(az, ax, tau_z, f=lambda bz, bx: 1.0)
        np.testing.assert_allclose(float(mu), 1.0, rtol=1e-6)


@pytest.mark.parametrize("az,ax", [(2.0, 1.0), (3.0, 3.0), (5.0, 0.1)])
def test_modulus_channel_se_error_vs_monte_carlo(az, ax):
    """Nishimori: SE backward/forward error == BO-ensemble average of the
    posterior variance == ensemble MSE of the posterior mean."""
    tau_z = 0.7
    ch = ModulusChannel(isotropic=False)
    rng = np.random.RandomState(0)
    n = 100_000
    mz_hat = az - 1.0 / tau_z
    zs = rng.randn(2, n) * np.sqrt(tau_z)
    bz = mz_hat * zs + np.sqrt(mz_hat) * rng.randn(2, n)
    xs = np.hypot(zs[0], zs[1])
    bx = ax * xs + np.sqrt(ax) * rng.randn(n)
    rz, vz = ch.compute_backward_posterior(
        az, jnp.asarray(bz), ax, jnp.asarray(bx))
    rx, vx = ch.compute_forward_posterior(
        az, jnp.asarray(bz), ax, jnp.asarray(bx))
    se_bwd = float(ch.compute_backward_error(az, ax, tau_z))
    se_fwd = float(ch.compute_forward_error(az, ax, tau_z))
    np.testing.assert_allclose(se_bwd, float(jnp.mean(vz)), rtol=2e-2)
    np.testing.assert_allclose(se_fwd, float(jnp.mean(vx)), rtol=2e-2)
    np.testing.assert_allclose(
        se_bwd, float(jnp.mean((jnp.asarray(zs) - rz) ** 2)), rtol=2e-2)
    np.testing.assert_allclose(
        se_fwd, float(jnp.mean((jnp.asarray(xs) - rx) ** 2)), rtol=2e-2)


def test_modulus_channel_mid_graph_ep():
    """Two-layer phase retrieval: modulus mid-graph (impossible in the
    reference, whose ModulusChannel posteriors raise NotImplementedError).
    x complex -> W (complex) -> |.| -> + noise -> y real."""
    import tramp_tpu as tt
    from tramp_tpu.priors import GaussianPrior
    from tramp_tpu.channels import (
        ComplexLinearChannel, ModulusChannel, GaussianChannel)

    N, M = 64, 192
    key = jax.random.PRNGKey(0)
    W = (jax.random.normal(key, (M, N)) +
         1j * jax.random.normal(jax.random.PRNGKey(1), (M, N))) / jnp.sqrt(
             2 * N)
    teacher = (
        GaussianPrior(size=(2, N), mean=0.3) @ tt.V(id="x") @
        ComplexLinearChannel(W, name="W") @ tt.V(id="z") @
        ModulusChannel() @ tt.V(id="a") @
        GaussianChannel(var=1e-4) @ tt.O(id="y")
    ).to_model()
    sample = teacher.sample(jax.random.PRNGKey(2))
    student = teacher.to_observed({"y": sample["y"]})
    ep = tt.ExpectationPropagation(student)
    ep.iterate(max_iter=200, damping=0.3)
    d = ep.get_variable_data("x")
    assert np.all(np.isfinite(np.asarray(d["r"])))
    # phase-invariant mse: modulus output fixes x only up to global phase
    xhat = np.asarray(d["r"][0] + 1j * d["r"][1]).ravel()
    x0 = np.asarray(sample["x"][0] + 1j * sample["x"][1]).ravel()
    phase = np.vdot(xhat, x0) / max(abs(np.vdot(xhat, x0)), 1e-30)
    mse = np.mean(np.abs(x0 - phase * xhat) ** 2) / 2
    tau_x = np.mean(np.abs(x0) ** 2) / 2
    assert mse < 0.5 * tau_x, (mse, tau_x)


def test_modulus_channel_mutual_information_zero_at_no_information():
    """I(az, ax) = 0 at the zero-information point az*tau_z = 1, ax = 0
    (bz and bx both pinned at 0), and > 0 for informative beliefs — the
    complex input doubles the az tau_z / entropy bookkeeping vs the
    generic 1-coordinate Channel formula."""
    ch = ModulusChannel()
    tau_z = 0.7
    I0_ = float(ch.compute_mutual_information(1.0 / tau_z, 0.0, tau_z))
    np.testing.assert_allclose(I0_, 0.0, atol=1e-6)
    assert float(ch.compute_mutual_information(2.0, 1.0, tau_z)) > 0.01
    assert float(ch.compute_mutual_information(3.0, 2.0, tau_z)) > \
        float(ch.compute_mutual_information(2.0, 1.0, tau_z))
