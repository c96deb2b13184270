"""Fused Pallas PL-posterior kernel vs the region-based jnp path.

Runs the kernel in Pallas interpreter mode on CPU; on TPU the identical
kernel body is compiled for real (bench.py covers that path).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tramp_tpu.channels import (
    SgnChannel, AbsChannel, ReluChannel, LeakyReluChannel, HardTanhChannel,
    SymmetricDoorChannel,
)
from tramp_tpu.ops import fused_pl_posterior, pl_posterior_reference

CHANNELS = [
    SgnChannel(), AbsChannel(), ReluChannel(), LeakyReluChannel(slope=0.3),
    HardTanhChannel(), SymmetricDoorChannel(width=0.7),
]


@pytest.mark.parametrize("channel", CHANNELS, ids=lambda c: c.name)
def test_fused_matches_region_path(channel):
    rng = np.random.RandomState(0)
    n = 300  # not a multiple of 128: exercises padding
    az, ax = 1.7, 0.9
    bz = jnp.asarray(rng.randn(n) * 2)
    bx = jnp.asarray(rng.randn(n) * 2)

    rz, vz, rx, vx, logZ = fused_pl_posterior(
        az, bz, ax, bx, channel.region_specs, interpret=True)

    rz_w, vz_w = channel.compute_backward_posterior(az, bz, ax, bx)
    rx_w, vx_w = channel.compute_forward_posterior(az, bz, ax, bx)
    A_w = channel.compute_log_partition(az, bz, ax, bx)

    np.testing.assert_allclose(np.asarray(rz), np.asarray(rz_w), rtol=1e-10)
    np.testing.assert_allclose(float(jnp.mean(vz)), float(vz_w), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(rx), np.asarray(rx_w), rtol=1e-10)
    np.testing.assert_allclose(float(jnp.mean(vx)), float(vx_w), rtol=1e-10)
    np.testing.assert_allclose(float(jnp.sum(logZ)), float(A_w), rtol=1e-10)


def test_reference_impl_matches_region_path():
    "The shared jnp implementation itself (no pallas machinery)."
    channel = ReluChannel()
    rng = np.random.RandomState(1)
    n = 64
    az, ax = 2.1, 1.3
    bz = jnp.asarray(rng.randn(n))
    bx = jnp.asarray(rng.randn(n))
    rz, vz, rx, vx, logZ = pl_posterior_reference(
        az, bz, ax, bx, channel.region_specs)
    rz_w, vz_w = channel.compute_backward_posterior(az, bz, ax, bx)
    np.testing.assert_allclose(np.asarray(rz), np.asarray(rz_w), rtol=1e-12)
    np.testing.assert_allclose(float(jnp.mean(vz)), float(vz_w), rtol=1e-12)


def test_fused_vmap_batch():
    "The fused op composes with vmap over a batch of messages."
    channel = SgnChannel()
    rng = np.random.RandomState(2)
    B, n = 3, 256
    az, ax = 1.2, 0.8
    bz = jnp.asarray(rng.randn(B, n))
    bx = jnp.asarray(rng.randn(B, n))

    def one(bz1, bx1):
        return fused_pl_posterior(az, bz1, ax, bx1, channel.region_specs,
                                  interpret=True)[0]

    rz_batch = jax.vmap(one)(bz, bx)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(rz_batch[i]), np.asarray(one(bz[i], bx[i])),
            rtol=1e-10)
