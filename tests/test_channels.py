"""Channel moment-vs-quadrature oracle tests, mirroring the reference's
tramp/tests/test_channels.py strategy: each activation channel's closed-form
posterior must match direct numerical integration of the same belief
    p(z, x) ~ exp(-az z^2/2 + bz z - ax x^2/2 + bx x) delta(x - f(z)).
"""
import numpy as np
import pytest
from scipy.integrate import quad
import jax.numpy as jnp

from tramp_tpu.channels import (
    SgnChannel, AbsChannel, ReluChannel, LeakyReluChannel, HardTanhChannel,
    HardSigmoidChannel, SymmetricDoorChannel, GaussianChannel, LinearChannel,
    SumChannel, DuplicateChannel, ConcatChannel, BiasChannel,
)


def explicit_moments(f, az, bz, ax, bx):
    "Numerical posterior moments of z and x = f(z) under the tilted belief."
    def belief(z):
        x = f(z)
        L = -az * z**2 / 2 + bz * z - ax * x**2 / 2 + bx * x
        return np.exp(L)

    Z = quad(lambda z: belief(z), -10, 10)[0]
    rz = quad(lambda z: z * belief(z), -10, 10)[0] / Z
    z2 = quad(lambda z: z**2 * belief(z), -10, 10)[0] / Z
    rx = quad(lambda z: f(z) * belief(z), -10, 10)[0] / Z
    x2 = quad(lambda z: f(z)**2 * belief(z), -10, 10)[0] / Z
    return rz, z2 - rz**2, rx, x2 - rx**2


CASES = [
    (SgnChannel(), np.sign),
    (AbsChannel(), np.abs),
    (ReluChannel(), lambda z: np.maximum(z, 0)),
    (LeakyReluChannel(slope=0.3), lambda z: np.where(z < 0, 0.3 * z, z)),
    (HardTanhChannel(), lambda z: np.clip(z, -1, 1)),
    (HardSigmoidChannel(), lambda z: np.clip(0.5 + z / 5.0, 0, 1)),
    (SymmetricDoorChannel(width=1.2),
     lambda z: np.where(np.abs(z) < 1.2, -1.0, 1.0)),
]

POINTS = [
    (2.0, 1.3, 1.5, -0.3),
    (1.0, -0.5, 2.0, 0.7),
    (1.5, 0.0, 0.8, 0.0),
]


@pytest.mark.parametrize("channel,f", CASES,
                         ids=lambda c: getattr(c, "name", ""))
@pytest.mark.parametrize("az,bz,ax,bx", POINTS)
def test_posterior_vs_quadrature(channel, f, az, bz, ax, bx):
    rz_o, vz_o, rx_o, vx_o = explicit_moments(f, az, bz, ax, bx)
    bz_a, bx_a = jnp.asarray([bz]), jnp.asarray([bx])
    rz, vz = channel.compute_backward_posterior(az, bz_a, ax, bx_a)
    rx, vx = channel.compute_forward_posterior(az, bz_a, ax, bx_a)
    np.testing.assert_allclose(float(rz[0]), rz_o, atol=1e-6)
    np.testing.assert_allclose(float(vz), vz_o, atol=1e-6)
    np.testing.assert_allclose(float(rx[0]), rx_o, atol=1e-6)
    np.testing.assert_allclose(float(vx), vx_o, atol=1e-6)


@pytest.mark.parametrize("channel,f", CASES,
                         ids=lambda c: getattr(c, "name", ""))
def test_second_moment_mc(channel, f):
    rng = np.random.RandomState(0)
    tau_z = 1.3
    z = np.sqrt(tau_z) * rng.randn(1_000_000)
    mc = np.mean(f(z) ** 2)
    got = float(channel.second_moment(tau_z))
    np.testing.assert_allclose(got, mc, rtol=1e-2)


def test_gaussian_channel_messages():
    ch = GaussianChannel(var=0.5)
    az, bz = 2.0, jnp.asarray([1.0, -0.7])
    ax, bx = 1.5, jnp.asarray([0.3, 0.9])
    a_f, b_f = ch.compute_forward_message(az, bz, ax, bx)
    k = (1 / 0.5) / (1 / 0.5 + az)
    np.testing.assert_allclose(float(a_f), k * az)
    np.testing.assert_allclose(np.asarray(b_f), k * np.asarray(bz))


def test_linear_channel_vs_dense_solve():
    "SVD-resolvent backward mean == dense Gaussian posterior mean."
    rng = np.random.RandomState(1)
    Nx, Nz = 12, 8
    W = rng.randn(Nx, Nz) / np.sqrt(Nz)
    ch = LinearChannel(jnp.asarray(W))
    az, ax = 1.3, 0.7
    bz = rng.randn(Nz)
    bx = rng.randn(Nx)
    rz = np.asarray(ch.compute_backward_mean(az, jnp.asarray(bz),
                                             ax, jnp.asarray(bx)))
    A = az * np.eye(Nz) + ax * W.T @ W
    want = np.linalg.solve(A, bz + W.T @ bx)
    np.testing.assert_allclose(rz, want, rtol=1e-8, atol=1e-10)
    # forward mean
    rx = np.asarray(ch.compute_forward_mean(az, jnp.asarray(bz),
                                            ax, jnp.asarray(bx)))
    np.testing.assert_allclose(rx, W @ want, rtol=1e-8, atol=1e-10)
    # variances via spectral sums
    s2 = np.linalg.svd(W, compute_uv=False) ** 2
    spectrum = np.zeros(Nz)
    spectrum[:len(s2)] = s2
    n_eff = np.sum(s2 / (az / ax + s2)) / Nz
    np.testing.assert_allclose(
        float(ch.compute_backward_variance(az, ax)), (1 - n_eff) / az,
        rtol=1e-10)
    np.testing.assert_allclose(
        float(ch.compute_forward_variance(az, ax)),
        n_eff / ((Nx / Nz) * ax), rtol=1e-10)


def test_sum_channel():
    ch = SumChannel(n_prev=2)
    az = [1.0, 2.0]
    bz = [jnp.asarray([0.5]), jnp.asarray([-0.2])]
    ax, bx = 1.5, jnp.asarray([0.3])
    a_f, b_f = ch.compute_forward_message(az, bz, ax, bx)
    v_bar = 1 / 1.0 + 1 / 2.0
    r_bar = 0.5 / 1.0 + (-0.2) / 2.0
    np.testing.assert_allclose(float(a_f), 1 / v_bar)
    np.testing.assert_allclose(float(b_f[0]), r_bar / v_bar)


def test_duplicate_channel():
    ch = DuplicateChannel(n_next=2)
    az, bz = 1.0, jnp.asarray([0.4])
    ax = [2.0, 0.5]
    bx = [jnp.asarray([1.0]), jnp.asarray([-0.3])]
    rz, vz = ch.compute_backward_posterior(az, bz, ax, bx)
    a = 1.0 + 2.5
    b = 0.4 + 0.7
    np.testing.assert_allclose(float(rz[0]), b / a)
    np.testing.assert_allclose(float(vz), 1 / a)


def test_concat_channel():
    ch = ConcatChannel(Ns=(2, 3))
    az = [1.0, 2.0]
    bz = [jnp.asarray([1.0, 2.0]), jnp.asarray([3.0, 4.0, 5.0])]
    ax, bx = 0.5, jnp.arange(5.0)
    rx, vx = ch.compute_forward_posterior(az, bz, ax, bx)
    want0 = (np.array([1.0, 2.0]) + np.arange(2.0)) / 1.5
    want1 = (np.array([3.0, 4.0, 5.0]) + np.arange(2.0, 5.0)) / 2.5
    np.testing.assert_allclose(np.asarray(rx), np.r_[want0, want1])
    np.testing.assert_allclose(float(vx), (2 / 1.5 + 3 / 2.5) / 5)


def test_bias_channel():
    ch = BiasChannel(bias=jnp.asarray([0.5, -0.5]))
    az, bz = 1.2, jnp.asarray([1.0, 2.0])
    ax, bx = 0.7, jnp.asarray([0.1, 0.2])
    a_f, b_f = ch.compute_forward_message(az, bz, ax, bx)
    np.testing.assert_allclose(float(a_f), az)
    np.testing.assert_allclose(
        np.asarray(b_f), np.asarray(bz) + az * np.array([0.5, -0.5]))
