"""Binary (+-1) prior. Reference tramp/priors/binary_prior.py."""
import jax
import jax.numpy as jnp

from .base_prior import Prior
from ..beliefs import binary
from ..utils.integration import gaussian_measure


class BinaryPrior(Prior):
    r"""$p(x) = p_+ \delta_+(x) + p_- \delta_-(x)$.
    Reference binary_prior.py:8-89."""

    _data_fields = ("p_pos",)
    _meta_fields = ("size", "isotropic")

    def __init__(self, size, p_pos=0.5, isotropic=True):
        self.size = size
        self.p_pos = p_pos
        self.isotropic = isotropic

    @property
    def p_neg(self):
        return 1.0 - self.p_pos

    @property
    def b(self):
        return 0.5 * jnp.log(self.p_pos / self.p_neg)

    def sample(self, key):
        shape = self.size if isinstance(self.size, tuple) else (self.size,)
        u = jax.random.uniform(key, shape)
        return jnp.where(u < self.p_pos, 1.0, -1.0)

    def math(self):
        return r"$p_\pm$"

    def second_moment(self):
        return 1.0

    def forward_second_moment_FG(self, tx_hat):
        return binary.tau(self.b)

    def scalar_forward_mean(self, ax, bx):
        return binary.r(bx + self.b)

    def scalar_forward_variance(self, ax, bx):
        return binary.v(bx + self.b)

    def scalar_log_partition(self, ax, bx):
        return binary.A(bx + self.b) - binary.A(self.b) - 0.5 * ax

    def compute_forward_posterior(self, ax, bx):
        b = bx + self.b
        rx = binary.r(b)
        vx = binary.v(b)
        if self.isotropic:
            vx = jnp.mean(vx)
        return rx, vx

    def compute_log_partition(self, ax, bx):
        return jnp.mean(self.scalar_log_partition(ax, bx))

    def b_measure(self, mx_hat, qx_hat, tx0_hat, f):
        mu_pos = gaussian_measure(+mx_hat, jnp.sqrt(qx_hat), f)
        mu_neg = gaussian_measure(-mx_hat, jnp.sqrt(qx_hat), f)
        return self.p_pos * mu_pos + self.p_neg * mu_neg

    def bx_measure(self, mx_hat, qx_hat, tx0_hat, f):
        mu_pos = +gaussian_measure(+mx_hat, jnp.sqrt(qx_hat), f)
        mu_neg = -gaussian_measure(-mx_hat, jnp.sqrt(qx_hat), f)
        return self.p_pos * mu_pos + self.p_neg * mu_neg

    def beliefs_measure(self, ax, f):
        mu_pos = gaussian_measure(+ax, jnp.sqrt(ax), f)
        mu_neg = gaussian_measure(-ax, jnp.sqrt(ax), f)
        return self.p_pos * mu_pos + self.p_neg * mu_neg

    def measure(self, f):
        return self.p_pos * f(+1.0) + self.p_neg * f(-1.0)
