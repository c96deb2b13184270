"""Structured (FFT/orthogonal/complex) channel tests: each must agree with
the equivalent dense LinearChannel computation."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tramp_tpu.channels import (
    ConvChannel, GradientChannel, DFTChannel, RotationChannel,
    UnitaryChannel, ComplexLinearChannel, Blur1DChannel, LaplacianChannel,
)
from tramp_tpu.utils.misc import complex2array, array2complex


def dense_operator(ch, N):
    "Dense matrix of the channel's convolve map (columns = basis responses)."
    W = np.zeros((N, N))
    for i in range(N):
        e = np.zeros(N)
        e[i] = 1
        W[:, i] = np.asarray(ch.convolve(jnp.asarray(e)))
    return W


def test_conv_channel_vs_dense():
    rng = np.random.RandomState(0)
    N = 16
    f = rng.randn(N)
    ch = ConvChannel(filter=f)
    z = rng.randn(N)
    W = dense_operator(ch, N)
    # linearity / circulant structure: each row is a roll of the first
    np.testing.assert_allclose(W[:, 1], np.roll(W[:, 0], 1), atol=1e-10)
    x = np.asarray(ch.convolve(jnp.asarray(z)))
    np.testing.assert_allclose(x, W @ z, rtol=1e-8, atol=1e-10)
    # backward mean vs dense solve
    az, ax = 1.3, 0.7
    bz, bx = rng.randn(N), rng.randn(N)
    rz = np.asarray(ch.compute_backward_mean(
        az, jnp.asarray(bz), ax, jnp.asarray(bx)))
    want = np.linalg.solve(az * np.eye(N) + ax * W.T @ W, bz + W.T @ bx)
    np.testing.assert_allclose(rz, want, rtol=1e-8, atol=1e-10)
    # variances vs spectral sums
    s2 = np.abs(np.fft.fft(f)) ** 2
    n_eff = np.mean(s2 / (az / ax + s2))
    np.testing.assert_allclose(
        float(ch.compute_backward_variance(az, ax)), (1 - n_eff) / az,
        rtol=1e-10)


def test_gradient_channel_vs_dense():
    rng = np.random.RandomState(1)
    shape = (8, 6)
    ch = GradientChannel(shape=shape)
    z = rng.randn(*shape)
    x = np.asarray(ch.convolve(jnp.asarray(z)))
    assert x.shape == (2,) + shape
    # forward difference along each axis (circular)
    want0 = np.roll(z, -1, axis=0) - z
    want1 = np.roll(z, -1, axis=1) - z
    np.testing.assert_allclose(x[0], want0, atol=1e-10)
    np.testing.assert_allclose(x[1], want1, atol=1e-10)
    # backward mean vs dense normal equations
    az, ax = 0.8, 1.7
    bz = rng.randn(*shape)
    bx = rng.randn(2, *shape)
    rz = np.asarray(ch.compute_backward_mean(
        az, jnp.asarray(bz), ax, jnp.asarray(bx)))
    # build dense gradient operator
    N = shape[0] * shape[1]
    G = np.zeros((2 * N, N))
    for i in range(N):
        e = np.zeros(N)
        e[i] = 1
        G[:, i] = np.asarray(
            ch.convolve(jnp.asarray(e.reshape(shape)))).ravel()
    want = np.linalg.solve(
        az * np.eye(N) + ax * G.T @ G, bz.ravel() + G.T @ bx.ravel())
    np.testing.assert_allclose(rz.ravel(), want, rtol=1e-8, atol=1e-10)


def test_dft_channel_roundtrip():
    rng = np.random.RandomState(2)
    N = 12
    ch = DFTChannel(real=True)
    z = rng.randn(N)
    X = ch.sample(None, jnp.asarray(z))
    assert X.shape == (2, N)
    zc = array2complex(jnp.asarray(X))
    np.testing.assert_allclose(
        np.asarray(zc), np.fft.fft(z, norm="ortho"), atol=1e-10)
    # forward message then backward message = identity
    a_f, b_f = ch.compute_forward_message(1.0, jnp.asarray(z), 0.0,
                                          jnp.zeros((2, N)))
    a_b, b_b = ch.compute_backward_message(0.0, jnp.zeros(N), 1.0, b_f)
    np.testing.assert_allclose(np.asarray(b_b), z, atol=1e-10)


def test_rotation_channel():
    rng = np.random.RandomState(3)
    A = rng.randn(6, 6)
    Q, _ = np.linalg.qr(A)
    ch = RotationChannel(R=jnp.asarray(Q))
    bz = rng.randn(6)
    a_f, b_f = ch.compute_forward_message(1.2, jnp.asarray(bz), 0.0,
                                          jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(b_f), Q @ bz, atol=1e-10)
    np.testing.assert_allclose(float(a_f), 1.2)


def test_unitary_channel():
    rng = np.random.RandomState(4)
    A = rng.randn(5, 5) + 1j * rng.randn(5, 5)
    Q, _ = np.linalg.qr(A)
    ch = UnitaryChannel(U=jnp.asarray(Q))
    z = rng.randn(5) + 1j * rng.randn(5)
    Z = complex2array(jnp.asarray(z))
    X = ch.sample(None, Z)
    np.testing.assert_allclose(
        np.asarray(array2complex(X)), Q @ z, atol=1e-10)


def test_complex_linear_channel_vs_dense():
    rng = np.random.RandomState(5)
    Nx, Nz = 7, 5
    W = (rng.randn(Nx, Nz) + 1j * rng.randn(Nx, Nz)) / np.sqrt(Nz)
    ch = ComplexLinearChannel(jnp.asarray(W))
    az, ax = 1.1, 0.6
    bz = rng.randn(Nz) + 1j * rng.randn(Nz)
    bx = rng.randn(Nx) + 1j * rng.randn(Nx)
    rz = array2complex(jnp.asarray(np.asarray(ch.compute_backward_mean(
        az, complex2array(jnp.asarray(bz)), ax,
        complex2array(jnp.asarray(bx))))))
    want = np.linalg.solve(
        az * np.eye(Nz) + ax * W.conj().T @ W, bz + W.conj().T @ bx)
    np.testing.assert_allclose(np.asarray(rz), want, rtol=1e-8, atol=1e-10)


def test_blur_and_laplacian_build():
    ch = Blur1DChannel(sigma=2.0, N=32)
    assert ch.spectrum.shape == (32,)
    ch2 = LaplacianChannel(shape=(8, 8))
    assert ch2.spectrum.shape == (8, 8)


def test_sparse_gradient_regression_ep():
    "Config-3 workload: sparse-gradient denoising (TV-like tree model)."
    from tramp_tpu.models import sparse_gradient_regression
    rng = np.random.RandomState(0)
    N, M = 64, 48
    # piecewise-constant signal
    x0 = np.zeros(N)
    x0[: N // 3] = 1.0
    x0[N // 3: 2 * N // 3] = -0.5
    A = rng.randn(M, N) / np.sqrt(N)
    noise_var = 1e-3
    y = A @ x0 + np.sqrt(noise_var) * rng.randn(M)
    model = sparse_gradient_regression(
        jnp.asarray(A), jnp.asarray(y), x_shape=(N,), grad_rho=0.1,
        noise_var=noise_var, prior_var=1.0)
    from tramp_tpu.algos import ExpectationPropagation
    ep = ExpectationPropagation(model)
    ep.iterate(max_iter=200, damping=0.3)
    r = np.asarray(ep.get_variable_data("x")["r"])
    mse = np.mean((r - x0) ** 2)
    # sparse-gradient prior should beat the naive ridge solution
    ridge = np.linalg.solve(A.T @ A / noise_var + np.eye(N),
                            A.T @ y / noise_var)
    mse_ridge = np.mean((ridge - x0) ** 2)
    assert mse < 0.5 * mse_ridge, (mse, mse_ridge)
