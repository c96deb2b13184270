"""Gaussian prior. Reference tramp/priors/gaussian_prior.py."""
import jax
import jax.numpy as jnp

from .base_prior import Prior
from ..beliefs import normal
from ..utils.integration import gaussian_measure


class GaussianPrior(Prior):
    r"""Gaussian prior $p(x)=\mathcal{N}(x|mean, var)$ over an array of
    shape ``size``. Reference tramp/priors/gaussian_prior.py:8-143."""

    _data_fields = ("mean", "var")
    _meta_fields = ("size", "isotropic")

    def __init__(self, size, mean=0.0, var=1.0, isotropic=True):
        self.size = size
        self.mean = mean
        self.var = var
        self.isotropic = isotropic

    @property
    def a(self):
        return 1.0 / self.var

    @property
    def b(self):
        return self.mean / self.var

    def sample(self, key):
        shape = self.size if isinstance(self.size, tuple) else (self.size,)
        return self.mean + jnp.sqrt(self.var) * jax.random.normal(key, shape)

    def math(self):
        return r"$\mathcal{N}$"

    def second_moment(self):
        return self.mean**2 + self.var

    def forward_second_moment_FG(self, tx_hat):
        return normal.tau(tx_hat + self.a, self.b)

    def scalar_forward_mean(self, ax, bx):
        return (bx + self.b) / (ax + self.a)

    def scalar_forward_variance(self, ax, bx):
        return 1.0 / (ax + self.a)

    def scalar_log_partition(self, ax, bx):
        return normal.A(ax + self.a, bx + self.b) - normal.A(self.a, self.b)

    def compute_forward_posterior(self, ax, bx):
        a = ax + self.a
        b = bx + self.b
        return b / a, 1.0 / a

    def compute_log_partition(self, ax, bx):
        return jnp.mean(self.scalar_log_partition(ax, bx))

    def compute_forward_error(self, ax):
        return 1.0 / (ax + self.a)

    def compute_forward_v_BO(self, ax, tx0_hat):
        return 1.0 / (ax + self.a)

    def compute_forward_message(self, ax, bx):
        "Fast path: the outgoing message is constant (reference l:86-89)."
        return self.a * jnp.ones_like(ax), self.b * jnp.ones_like(bx)

    def constant_forward_message(self):
        """Model-constant message (see GaussianLikelihood): a=1/var,
        b=mean/var broadcast to the variable shape (downstream factor
        matvecs need an array-shaped b, like compute_forward_message's
        b * ones_like(bx))."""
        shape = self.size if isinstance(self.size, tuple) else (self.size,)
        return {"a": jnp.asarray(self.a),
                "b": jnp.broadcast_to(jnp.asarray(self.b), shape)}

    def compute_forward_state_evolution(self, ax):
        return self.a * jnp.ones_like(ax)

    def compute_forward_state_evolution_BO(self, ax, tx0_hat):
        return self.a * jnp.ones_like(ax)

    def b_measure(self, mx_hat, qx_hat, tx0_hat, f):
        a0 = self.a + tx0_hat
        r0 = self.b / a0
        v0 = 1.0 / a0
        return gaussian_measure(
            mx_hat * r0, jnp.sqrt(qx_hat + mx_hat**2 * v0), f)

    def bx_measure(self, mx_hat, qx_hat, tx0_hat, f):
        a0 = self.a + tx0_hat
        r0 = self.b / a0
        v0 = 1.0 / a0
        ax_star = mx_hat**2 / qx_hat

        def r_times_f(bx):
            bx_star = (mx_hat / qx_hat) * bx
            return (self.b + bx_star) / (a0 + ax_star) * f(bx)

        return gaussian_measure(
            mx_hat * r0, jnp.sqrt(qx_hat + mx_hat**2 * v0), r_times_f)

    def beliefs_measure(self, ax, f):
        return gaussian_measure(
            ax * self.mean, jnp.sqrt(ax + ax**2 * self.var), f)

    def measure(self, f):
        return gaussian_measure(self.mean, jnp.sqrt(self.var), f)

    def compute_mutual_information(self, ax):
        return 0.5 * jnp.log((ax + self.a) * self.var)

    def compute_free_energy(self, ax):
        tau_x = self.second_moment()
        return 0.5 * ax * tau_x - self.compute_mutual_information(ax)
