"""Low-rank VAMP solver and generic activation channel tests."""
import numpy as np
import jax
import jax.numpy as jnp

from tramp_tpu.channels import (
    vamp_matrix_factorization, TanhChannel, LowRankFactorization)


def test_vamp_uv_recovery_high_snr():
    "Planted rank-1 UV factorization at high SNR: VAMP recovers u, v."
    rng = np.random.RandomState(0)
    M, N, K = 60, 80, 1
    u0 = rng.randn(M, K)
    v0 = rng.randn(N, K)
    X = u0 @ v0.T / np.sqrt(N)
    Delta = 0.01
    Y = X + np.sqrt(Delta) * rng.randn(M, N)
    ax = 1.0 / Delta
    bx = Y / Delta
    # standard gaussian priors on u, v: au=av=1, bu=bv=0
    rz_u, vz_u, rz_v, vz_v = jax.jit(
        lambda bx: vamp_matrix_factorization(
            au=1.0, av=1.0, bu=jnp.zeros((M, K)), bv=jnp.zeros((N, K)),
            ax=ax, bx=bx, model="UV"))(jnp.asarray(bx))
    rz_u = np.asarray(rz_u)
    rz_v = np.asarray(rz_v)
    # recovery up to global sign
    corr_u = abs(np.corrcoef(rz_u[:, 0], u0[:, 0])[0, 1])
    corr_v = abs(np.corrcoef(rz_v[:, 0], v0[:, 0])[0, 1])
    assert corr_u > 0.95, corr_u
    assert corr_v > 0.95, corr_v
    assert 0 <= float(vz_u) < 0.5
    assert 0 <= float(vz_v) < 0.5


def test_tanh_channel_vs_quadrature():
    "Generic activation channel vs scipy quad oracle."
    from scipy.integrate import quad
    ch = TanhChannel()
    az, bz, ax, bx = 1.5, 0.7, 0.9, -0.4

    def belief(z):
        x = np.tanh(z)
        return np.exp(-0.5 * ax * x**2 + bx * x - 0.5 * az * z**2 + bz * z)

    lo, hi = bz / az - 10 / np.sqrt(az), bz / az + 10 / np.sqrt(az)
    Z = quad(belief, lo, hi)[0]
    rz_o = quad(lambda z: z * belief(z), lo, hi)[0] / Z
    rx_o = quad(lambda z: np.tanh(z) * belief(z), lo, hi)[0] / Z

    rz, vz = ch.compute_backward_posterior(
        az, jnp.asarray([bz]), ax, jnp.asarray([bx]))
    rx, vx = ch.compute_forward_posterior(
        az, jnp.asarray([bz]), ax, jnp.asarray([bx]))
    np.testing.assert_allclose(float(rz[0]), rz_o, rtol=1e-6)
    np.testing.assert_allclose(float(rx[0]), rx_o, rtol=1e-6)


def test_low_rank_factorization_channel():
    ch = LowRankFactorization(M=20, N=30, K=2)
    u = jnp.ones((20, 2))
    v = jnp.ones((30, 2))
    x = ch.sample(None, u, v)
    assert x.shape == (20, 30)
    tau = ch.second_moment(1.0, 1.0)
    np.testing.assert_allclose(float(tau), 2 * 1.0 * 1.0 / 30)
