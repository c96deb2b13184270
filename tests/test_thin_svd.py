"""Thin-SVD LinearChannel: the orthogonal-complement identity.

`LinearChannel` stores only the thin factors U (Nx,k), V (Nz,k),
k = min(Nx,Nz); modes beyond k (resolvent 1/az) are restored analytically
via the projector identity V_perp V_perp^T = I - V_k V_k^T
(channels/linear_channel.py compute_backward_mean). At alpha=1/2 this
halves the per-sweep GEMM MACs and the U/V weight HBM traffic vs the
full square factors of the reference's SVD parametrization
(reference tramp/channels/linear/linear_channel.py:39-44 keeps full_matrices
implicitly via numpy defaults; its resolvent l:69-83 runs over all Nz modes).

These tests pin the thin-path means/log-partition against a DENSE oracle
(direct linear solve of the Gaussian posterior) in float64, for all three
aspect ratios (wide, tall, square) and the trailing-batch path.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tramp_tpu.channels import LinearChannel

jax.config.update("jax_enable_x64", True)


def _dense_oracle(W, az, bz, ax, bx):
    "rz, rx and logZ of p(z) ∝ exp(-az|z|²/2 + bz·z - ax|Wz|²/2 + bx·Wz)."
    Nz = W.shape[1]
    A = az * np.eye(Nz) + ax * W.T @ W
    b = np.asarray(bz + W.T @ bx)
    rz = np.linalg.solve(A, b)
    sign, logdet = np.linalg.slogdet(A)
    assert sign > 0
    logZ = 0.5 * b @ rz + 0.5 * (Nz * np.log(2 * np.pi) - logdet)
    return rz, W @ rz, logZ


@pytest.mark.parametrize("shape", [(30, 60), (60, 30), (40, 40)])
def test_thin_means_match_dense_oracle(shape):
    Nx, Nz = shape
    rng = np.random.default_rng(0)
    W = rng.normal(size=(Nx, Nz)) / np.sqrt(Nz)
    lin = LinearChannel(jnp.asarray(W))
    k = min(Nx, Nz)
    assert lin.U.shape == (Nx, k) and lin.V.shape == (Nz, k)
    az, ax = 0.7, 1.3
    bz = jnp.asarray(rng.normal(size=Nz))
    bx = jnp.asarray(rng.normal(size=Nx))
    rz_o, rx_o, logZ_o = _dense_oracle(W, az, bz, ax, bx)
    rz = lin.compute_backward_mean(az, bz, ax, bx)
    rx = lin.compute_forward_mean(az, bz, ax, bx)
    logZ = lin.compute_log_partition(az, bz, ax, bx)
    np.testing.assert_allclose(np.asarray(rz), rz_o, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rx), rx_o, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float(logZ), logZ_o, rtol=1e-12)


@pytest.mark.parametrize("shape", [(30, 60), (60, 30)])
def test_thin_means_trailing_batch(shape):
    "The (N, B) trailing-batch path must match per-column singles."
    Nx, Nz = shape
    rng = np.random.default_rng(1)
    W = rng.normal(size=(Nx, Nz)) / np.sqrt(Nz)
    lin = LinearChannel(jnp.asarray(W))
    az, ax = 0.4, 2.1
    B = 3
    bzB = jnp.asarray(rng.normal(size=(Nz, B)))
    bxB = jnp.asarray(rng.normal(size=(Nx, B)))
    rzB = lin.compute_backward_mean(az, bzB, ax, bxB)
    rxB = lin.compute_forward_mean(az, bzB, ax, bxB)
    for j in range(B):
        rz = lin.compute_backward_mean(az, bzB[:, j], ax, bxB[:, j])
        rx = lin.compute_forward_mean(az, bzB[:, j], ax, bxB[:, j])
        np.testing.assert_allclose(np.asarray(rzB[:, j]), np.asarray(rz),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(rxB[:, j]), np.asarray(rx),
                                   rtol=1e-12, atol=1e-14)


def test_precomputed_full_svd_is_sliced():
    "svd=(U, s, Vt) precomputed with full matrices is accepted and thinned."
    rng = np.random.default_rng(2)
    Nx, Nz = 20, 50
    W = rng.normal(size=(Nx, Nz)) / np.sqrt(Nz)
    U, s, Vt = np.linalg.svd(W, full_matrices=True)
    lin = LinearChannel(jnp.asarray(W), svd=(
        jnp.asarray(U), jnp.asarray(s), jnp.asarray(Vt)))
    thin = LinearChannel(jnp.asarray(W))
    az, ax = 1.1, 0.9
    bz = jnp.asarray(rng.normal(size=Nz))
    bx = jnp.asarray(rng.normal(size=Nx))
    np.testing.assert_allclose(
        np.asarray(lin.compute_backward_mean(az, bz, ax, bx)),
        np.asarray(thin.compute_backward_mean(az, bz, ax, bx)),
        rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("shape", [(30, 60), (60, 30)])
def test_precomputed_full_svd_all_aspects(shape):
    """ADVICE r4: the svd= slicing must be exercised for BOTH aspects —
    wide (U square, Vt sliced) and tall (U sliced to (Nx,k), Vt square)."""
    Nx, Nz = shape
    rng = np.random.default_rng(3)
    W = rng.normal(size=(Nx, Nz)) / np.sqrt(Nz)
    U, s, Vt = np.linalg.svd(W, full_matrices=True)
    lin = LinearChannel(jnp.asarray(W), svd=(
        jnp.asarray(U), jnp.asarray(s), jnp.asarray(Vt)))
    thin = LinearChannel(jnp.asarray(W))
    k = min(Nx, Nz)
    assert lin.U.shape == (Nx, k) and lin.V.shape == (Nz, k)
    az, ax = 1.1, 0.9
    bz = jnp.asarray(rng.normal(size=Nz))
    bx = jnp.asarray(rng.normal(size=Nx))
    for fn in ("compute_backward_mean", "compute_forward_mean"):
        np.testing.assert_allclose(
            np.asarray(getattr(lin, fn)(az, bz, ax, bx)),
            np.asarray(getattr(thin, fn)(az, bz, ax, bx)),
            rtol=1e-10, atol=1e-12, err_msg=fn)


# ---------------------------------------------------------------------------
# ComplexLinearChannel thin-SVD parity (ADVICE r4): mirror the real-channel
# dense-oracle tests over wide/tall/square shapes — the wide (k < Nz)
# complement branch of compute_backward_mean was previously untested.
# ---------------------------------------------------------------------------

from tramp_tpu.channels import ComplexLinearChannel
from tramp_tpu.utils.misc import complex2array, array2complex


def _dense_complex_oracle(W, az, bz, ax, bx):
    "Complex Gaussian posterior: A rz = bz + W^H bx, A = az I + ax W^H W."
    Nz = W.shape[1]
    A = az * np.eye(Nz) + ax * W.conj().T @ W
    b = bz + W.conj().T @ bx
    rz = np.linalg.solve(A, b)
    return rz, W @ rz


@pytest.mark.parametrize("shape", [(5, 9), (9, 5), (6, 6)])
def test_complex_thin_means_match_dense_oracle(shape):
    Nx, Nz = shape
    rng = np.random.default_rng(4)
    W = (rng.normal(size=(Nx, Nz))
         + 1j * rng.normal(size=(Nx, Nz))) / np.sqrt(2 * Nz)
    ch = ComplexLinearChannel(W)
    k = min(Nx, Nz)
    assert ch.U.shape == (2, Nx, k) and ch.V.shape == (2, Nz, k)
    az, ax = 0.8, 1.6
    bz = rng.normal(size=Nz) + 1j * rng.normal(size=Nz)
    bx = rng.normal(size=Nx) + 1j * rng.normal(size=Nx)
    rz_o, rx_o = _dense_complex_oracle(W, az, bz, ax, bx)
    rz = array2complex(np.asarray(ch.compute_backward_mean(
        az, jnp.asarray(complex2array(bz)), ax,
        jnp.asarray(complex2array(bx)))))
    rx = array2complex(np.asarray(ch.compute_forward_mean(
        az, jnp.asarray(complex2array(bz)), ax,
        jnp.asarray(complex2array(bx)))))
    np.testing.assert_allclose(rz, rz_o, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(rx, rx_o, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("shape", [(5, 9), (9, 5)])
def test_complex_precomputed_svd_is_sliced(shape):
    "ComplexLinearChannel svd= slicing (Vh[:k], U[:, :k]) for both aspects."
    Nx, Nz = shape
    rng = np.random.default_rng(5)
    W = (rng.normal(size=(Nx, Nz))
         + 1j * rng.normal(size=(Nx, Nz))) / np.sqrt(2 * Nz)
    U, s, Vh = np.linalg.svd(W, full_matrices=True)
    ch = ComplexLinearChannel(W, svd=(U, s, Vh))
    thin = ComplexLinearChannel(W)
    k = min(Nx, Nz)
    assert ch.U.shape == (2, Nx, k) and ch.V.shape == (2, Nz, k)
    az, ax = 1.2, 0.5
    bz = jnp.asarray(complex2array(
        rng.normal(size=Nz) + 1j * rng.normal(size=Nz)))
    bx = jnp.asarray(complex2array(
        rng.normal(size=Nx) + 1j * rng.normal(size=Nx)))
    for fn in ("compute_backward_mean", "compute_forward_mean"):
        np.testing.assert_allclose(
            np.asarray(getattr(ch, fn)(az, bz, ax, bx)),
            np.asarray(getattr(thin, fn)(az, bz, ax, bx)),
            rtol=1e-10, atol=1e-12, err_msg=fn)
