"""Exponential prior. Reference tramp/priors/exponential_prior.py."""
import jax
import jax.numpy as jnp

from .base_prior import Prior
from ..beliefs import exponential, positive
from ..utils.integration import exponential_measure


class ExponentialPrior(Prior):
    r"""$p(x) = 1_+(x) \frac{1}{r} e^{-x/r}$. Reference exponential_prior.py:8-82."""

    _data_fields = ("mean",)
    _meta_fields = ("size", "isotropic")

    def __init__(self, size, mean=1.0, isotropic=True):
        self.size = size
        self.mean = mean
        self.isotropic = isotropic

    @property
    def b(self):
        return -1.0 / self.mean

    def sample(self, key):
        shape = self.size if isinstance(self.size, tuple) else (self.size,)
        # NOTE: the reference samples with scale=1/mean (exponential_prior.py:31),
        # inconsistent with its own second_moment; we reproduce its behavior.
        return jax.random.exponential(key, shape) / self.mean

    def math(self):
        return r"$\exp$"

    def second_moment(self):
        return 2.0 * self.mean**2

    def forward_second_moment_FG(self, tx_hat):
        return positive.tau(tx_hat, self.b)

    def scalar_forward_mean(self, ax, bx):
        return positive.r(ax, bx + self.b)

    def scalar_forward_variance(self, ax, bx):
        return positive.v(ax, bx + self.b)

    def scalar_log_partition(self, ax, bx):
        return positive.A(ax, bx + self.b) - exponential.A(self.b)

    def compute_forward_posterior(self, ax, bx):
        b = bx + self.b
        rx = positive.r(ax, b)
        vx = positive.v(ax, b)
        if self.isotropic:
            vx = jnp.mean(vx)
        return rx, vx

    def compute_log_partition(self, ax, bx):
        return jnp.mean(self.scalar_log_partition(ax, bx))

    def measure(self, f):
        return exponential_measure(self.mean, f)

    def beliefs_measure(self, ax, f):
        """BO SE measure (NotImplemented in the reference,
        exponential_prior.py:60-76): bx = ax x* + sqrt(ax) xi with
        x* ~ Exp(mean); exponential nodes (truncated at 10, matching the
        reference's measure convention) x standard-normal nodes on a
        trailing axis."""
        from ..utils.integration import std_normal_nodes

        xs, ws = std_normal_nodes()
        xs = jnp.asarray(xs)
        ws = jnp.asarray(ws)
        sa = jnp.sqrt(ax)

        def inner(x):
            bx = ax * x[..., None] + sa * xs
            return jnp.sum(ws * f(bx), axis=-1)

        return exponential_measure(self.mean, inner)
