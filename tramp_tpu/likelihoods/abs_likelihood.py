"""Absolute-value likelihood y = |z|.
Reference tramp/likelihoods/abs_likelihood.py."""
import jax.numpy as jnp

from .base_likelihood import Likelihood
from ..beliefs import binary
from ..utils.integration import (
    gaussian_measure_2d, gaussian_measure_boundary, std_normal_nodes)


def _measure_2d_zlayer(sz, mz_hat, q_hat, g):
    """E over z ~ N(0, sz^2), xi ~ N(0,1) of g(mz_hat z + sqrt(q_hat) xi, z)
    with quadrature panels around the z = 0 sign-ambiguity layer.

    The +-z posterior mixing factor transitions over |z| ~ sqrt(q_hat)/mz_hat
    (bz*y ~ mz_hat z^2 + sqrt(q_hat) z xi of order 1) — at large precision a
    vanishing layer that a fixed global rule integrates to zero, killing the
    az^{-3/2} informative correction of the SE recovery cascade."""
    xi, w_xi = std_normal_nodes()
    xi = jnp.asarray(xi)
    w_xi = jnp.asarray(w_xi)

    def integrand(z):
        bz = mz_hat * z[..., None] + jnp.sqrt(q_hat) * xi
        vals = g(bz, jnp.broadcast_to(z[..., None], bz.shape))
        return jnp.sum(w_xi * vals, axis=-1)

    d = 10.0 * (jnp.sqrt(q_hat) + 1.0) / mz_hat
    return gaussian_measure_boundary(
        0.0, sz, jnp.stack([-d, d]), integrand)


class AbsLikelihood(Likelihood):

    _data_fields = ("y",)
    _meta_fields = ("y_name", "isotropic")

    def __init__(self, y, y_name="y", isotropic=True):
        self.y_name = y_name
        self.isotropic = isotropic
        self.y = None if y is None else jnp.asarray(y)

    def sample(self, key, X):
        return jnp.abs(X)

    def math(self):
        return r"$\mathrm{abs}$"

    def scalar_backward_mean(self, az, bz, y):
        return y * binary.r(bz * y)

    def scalar_backward_variance(self, az, bz, y):
        return y**2 * binary.v(bz * y)

    def scalar_log_partition(self, az, bz, y):
        return -0.5 * az * y**2 + binary.A(bz * y)

    def compute_backward_posterior(self, az, bz, y):
        rz = y * binary.r(bz * y)
        vz = y**2 * binary.v(bz * y)
        if self.isotropic:
            vz = jnp.mean(vz)
        return rz, vz

    def compute_log_partition(self, az, bz, y):
        return jnp.mean(self.scalar_log_partition(az, bz, y))

    def b_measure(self, mz_hat, qz_hat, tz0_hat, f):
        tz0 = 1.0 / tz0_hat
        return _measure_2d_zlayer(
            jnp.sqrt(tz0), mz_hat, qz_hat,
            lambda bz, z: f(bz, jnp.abs(z)))

    def bz_measure(self, mz_hat, qz_hat, tz0_hat, f):
        tz0 = 1.0 / tz0_hat
        return _measure_2d_zlayer(
            jnp.sqrt(tz0), mz_hat, qz_hat,
            lambda bz, z: z * f(bz, jnp.abs(z)))

    def beliefs_measure(self, az, tau_z, f):
        # floor at AMIN: the reference asserts az > 1/tau_z strictly
        # (sgn_likelihood.py:81); at the uninformed point az == 1/tau_z
        # the measure degenerates, and a tiny positive floor keeps it
        # defined while preserving the instability of that fixed point
        mz_hat = jnp.maximum(az - 1.0 / tau_z, 1e-11)
        return _measure_2d_zlayer(
            jnp.sqrt(tau_z), mz_hat, mz_hat,
            lambda bz, z: f(bz, jnp.abs(z)))

    def measure(self, y, f):
        return f(+y) + f(-y)
