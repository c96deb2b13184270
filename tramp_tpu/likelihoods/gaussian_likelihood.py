"""Gaussian likelihood. Reference tramp/likelihoods/gaussian_likelihood.py."""
import jax
import jax.numpy as jnp

from .base_likelihood import Likelihood
from ..beliefs import normal
from ..utils.integration import gaussian_measure, gaussian_measure_2d_full


class GaussianLikelihood(Likelihood):

    _data_fields = ("y", "var")
    _meta_fields = ("y_name", "isotropic")

    def __init__(self, y, var=1.0, y_name="y", isotropic=True):
        self.y_name = y_name
        self.var = var
        self.isotropic = isotropic
        self.y = None if y is None else jnp.asarray(y)

    @property
    def a(self):
        return 1.0 / self.var

    @property
    def b(self):
        return None if self.y is None else self.y / self.var

    def sample(self, key, X):
        return X + jnp.sqrt(self.var) * jax.random.normal(key, jnp.shape(X))

    def math(self):
        return r"$\mathcal{N}$"

    def scalar_backward_mean(self, az, bz, y):
        return (bz + self.a * y) / (az + self.a)

    def scalar_backward_variance(self, az, bz, y):
        return 1.0 / (az + self.a)

    def scalar_log_partition(self, az, bz, y):
        ay, by = self.a, self.a * y
        return normal.A(az + ay, bz + by) - normal.A(ay, by)

    def compute_backward_posterior(self, az, bz, y):
        a = az + self.a
        b = bz + self.a * y
        return b / a, 1.0 / a

    def compute_log_partition(self, az, bz, y):
        return jnp.mean(self.scalar_log_partition(az, bz, y))

    def compute_backward_error(self, az, tau_z):
        return 1.0 / (az + self.a)

    def compute_backward_v_BO(self, az, tz0_hat):
        return 1.0 / (az + self.a)

    def compute_backward_message(self, az, bz):
        "Fast path: constant message. Reference l:68-71."
        return self.a * jnp.ones_like(az), self.b

    def constant_backward_message(self):
        """The backward message is a model constant (a=1/var, b=y/var):
        engines pin the slot and recompute it from the model inside the
        fused loop, letting XLA hoist consumer GEMMs (message_passing.py
        pinned-slot machinery)."""
        if self.y is None:
            return None
        return {"a": jnp.asarray(self.a), "b": self.b}

    def compute_backward_state_evolution(self, az, tau_z):
        return self.a * jnp.ones_like(az)

    def compute_backward_state_evolution_BO(self, az, tau_z):
        return self.a * jnp.ones_like(az)

    def b_measure(self, mz_hat, qz_hat, tz0_hat, f):
        tz0 = 1.0 / tz0_hat
        cov = jnp.array([
            [qz_hat + mz_hat**2 * tz0, mz_hat * tz0],
            [mz_hat * tz0, self.var + tz0],
        ])
        return gaussian_measure_2d_full(jnp.zeros(2), cov, f)

    def bz_measure(self, mz_hat, qz_hat, tz0_hat, f):
        az_star = mz_hat**2 / qz_hat + tz0_hat
        ay = self.a

        def r_times_f(bz, y):
            bz_star = (mz_hat / qz_hat) * bz
            r = (self.a * y + bz_star) / (ay + az_star)
            return r * f(bz, y)

        tz0 = 1.0 / tz0_hat
        cov = jnp.array([
            [qz_hat + mz_hat**2 * tz0, mz_hat * tz0],
            [mz_hat * tz0, self.var + tz0],
        ])
        return gaussian_measure_2d_full(jnp.zeros(2), cov, r_times_f)

    def beliefs_measure(self, az, tau_z, f):
        u_eff = jnp.maximum(0.0, az * tau_z - 1.0)
        cov = jnp.array([
            [u_eff * az + 1e-12, u_eff],
            [u_eff, self.var + tau_z],
        ])
        return gaussian_measure_2d_full(jnp.zeros(2), cov, f)

    def measure(self, y, f):
        return gaussian_measure(y, jnp.sqrt(self.var), f)

    def compute_mutual_information(self, az, tau_z):
        I = 0.5 * jnp.log((az + self.a) * tau_z)
        N = 0.5 * jnp.log(2 * jnp.pi * jnp.e * self.var)
        return I + N

    def compute_free_energy(self, az, tau_z):
        a = az + self.a
        return 0.5 * az * tau_z - 1.0 - 0.5 * jnp.log(a * self.var)
