"""Positive (half-normal) prior. Reference tramp/priors/positive_prior.py."""
import jax
import jax.numpy as jnp

from .base_prior import Prior
from ..beliefs import positive


class PositivePrior(Prior):
    r"""$p(x) = 2 \cdot 1_+(x) \mathcal{N}(x|0,1)$. Reference positive_prior.py:8-82."""

    _data_fields = ()
    _meta_fields = ("size", "isotropic")

    a = 1.0
    b = 0.0

    def __init__(self, size, isotropic=True):
        self.size = size
        self.isotropic = isotropic

    def sample(self, key):
        shape = self.size if isinstance(self.size, tuple) else (self.size,)
        return jnp.abs(jax.random.normal(key, shape))

    def math(self):
        return r"$\mathcal{N}_+$"

    def second_moment(self):
        return 1.0

    def forward_second_moment_FG(self, tx_hat):
        return positive.tau(tx_hat + self.a, self.b)

    def scalar_forward_mean(self, ax, bx):
        return positive.r(ax + self.a, bx + self.b)

    def scalar_forward_variance(self, ax, bx):
        return positive.v(ax + self.a, bx + self.b)

    def scalar_log_partition(self, ax, bx):
        return (positive.A(ax + self.a, bx + self.b)
                - positive.A(self.a, self.b))

    def compute_forward_posterior(self, ax, bx):
        a = ax + self.a
        b = bx + self.b
        rx = positive.r(a, b)
        vx = positive.v(a, b)
        if self.isotropic:
            vx = jnp.mean(vx)
        return rx, vx

    def compute_log_partition(self, ax, bx):
        return jnp.mean(self.scalar_log_partition(ax, bx))
