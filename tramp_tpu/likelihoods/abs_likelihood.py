"""Absolute-value likelihood y = |z|.
Reference tramp/likelihoods/abs_likelihood.py."""
import jax.numpy as jnp

from .base_likelihood import Likelihood
from ..beliefs import binary
from ..utils.integration import gaussian_measure_2d


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
        def integrand(z, xi_b):
            bz = mz_hat * z + jnp.sqrt(qz_hat) * xi_b
            return f(bz, jnp.abs(z))
        tz0 = 1.0 / tz0_hat
        return gaussian_measure_2d(0.0, jnp.sqrt(tz0), 0.0, 1.0, integrand)

    def bz_measure(self, mz_hat, qz_hat, tz0_hat, f):
        def integrand(z, xi_b):
            bz = mz_hat * z + jnp.sqrt(qz_hat) * xi_b
            return z * f(bz, jnp.abs(z))
        tz0 = 1.0 / tz0_hat
        return gaussian_measure_2d(0.0, jnp.sqrt(tz0), 0.0, 1.0, integrand)

    def beliefs_measure(self, az, tau_z, f):
        # floor at AMIN: the reference asserts az > 1/tau_z strictly
        # (sgn_likelihood.py:81); at the uninformed point az == 1/tau_z
        # the measure degenerates, and a tiny positive floor keeps it
        # defined while preserving the instability of that fixed point
        mz_hat = jnp.maximum(az - 1.0 / tau_z, 1e-11)

        def integrand(z, xi_b):
            bz = mz_hat * z + jnp.sqrt(mz_hat) * xi_b
            return f(bz, jnp.abs(z))

        return gaussian_measure_2d(0.0, jnp.sqrt(tau_z), 0.0, 1.0, integrand)

    def measure(self, y, f):
        return f(+y) + f(-y)
