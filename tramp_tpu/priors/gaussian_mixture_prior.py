"""Gaussian mixture prior. Reference tramp/priors/gaussian_mixture_prior.py."""
import jax
import jax.numpy as jnp

from .base_prior import Prior
from ..beliefs import normal, mixture
from ..utils.integration import gaussian_measure


class GaussianMixturePrior(Prior):
    r"""$p(x)=\sum_{k=1}^K p_k \mathcal{N}(x|r_k,v_k)$.
    Reference gaussian_mixture_prior.py:8-139. Component parameters are
    arrays of shape (K,)."""

    _data_fields = ("probs", "means", "vars")
    _meta_fields = ("size", "isotropic", "K")

    def __init__(self, size, probs=(0.5, 0.5), means=(-1.0, 1.0),
                 vars=(1.0, 1.0), isotropic=True):
        assert len(probs) == len(means) == len(vars)
        self.size = size
        self.K = len(probs)
        self.probs = jnp.asarray(probs)
        self.means = jnp.asarray(means)
        self.vars = jnp.asarray(vars)
        self.isotropic = isotropic

    @property
    def a(self):
        return 1.0 / self.vars

    @property
    def b(self):
        return self.means / self.vars

    @property
    def eta(self):
        return jnp.log(self.probs) - normal.A(self.a, self.b)

    def sample(self, key):
        shape = self.size if isinstance(self.size, tuple) else (self.size,)
        kg, kc = jax.random.split(key)
        cluster = jax.random.choice(
            kc, self.K, shape=shape, p=self.probs)
        x_gauss = (self.means[cluster]
                   + jnp.sqrt(self.vars)[cluster]
                   * jax.random.normal(kg, shape))
        return x_gauss

    def math(self):
        return r"$\mathrm{GMM}$"

    def second_moment(self):
        return jnp.sum(self.probs * (self.means**2 + self.vars))

    def forward_second_moment_FG(self, tx_hat):
        return mixture.tau(tx_hat + self.a, self.b, self.eta)

    def scalar_forward_mean(self, ax, bx):
        # ax, bx scalar or (n,) node arrays: broadcast K components in front
        a = ax + self.a[:, None]
        b = bx + self.b[:, None]
        return mixture.r(a, b, self.eta[:, None])

    def scalar_forward_variance(self, ax, bx):
        a = ax + self.a[:, None]
        b = bx + self.b[:, None]
        return mixture.v(a, b, self.eta[:, None])

    def scalar_log_partition(self, ax, bx):
        a = ax + self.a[:, None]
        b = bx + self.b[:, None]
        return (mixture.A(a, b, self.eta[:, None])
                - mixture.A(self.a, self.b, self.eta))

    def _Kshape(self, ax, bx):
        extra = (1,) * jnp.ndim(bx)
        a = ax + jnp.reshape(self.a, (self.K,) + extra)
        b = bx + jnp.reshape(self.b, (self.K,) + extra)
        eta = jnp.reshape(self.eta, (self.K,) + extra)
        return a, b, eta

    def compute_forward_posterior(self, ax, bx):
        a, b, eta = self._Kshape(ax, bx)
        rx = mixture.r(a, b, eta)
        vx = mixture.v(a, b, eta)
        if self.isotropic:
            vx = jnp.mean(vx)
        return rx, vx

    def compute_log_partition(self, ax, bx):
        a, b, eta = self._Kshape(ax, bx)
        A = mixture.A(a, b, eta) - mixture.A(self.a, self.b, self.eta)
        return jnp.mean(A)

    def b_measure(self, mx_hat, qx_hat, tx0_hat, f):
        a0 = self.a + tx0_hat
        r0 = self.b / a0
        v0 = 1.0 / a0
        p0 = mixture.p(a0, self.b, self.eta)
        mu = 0.0
        for k in range(self.K):
            mu = mu + p0[k] * gaussian_measure(
                mx_hat * r0[k], jnp.sqrt(qx_hat + mx_hat**2 * v0[k]), f)
        return mu

    def bx_measure(self, mx_hat, qx_hat, tx0_hat, f):
        a0 = self.a + tx0_hat
        r0 = self.b / a0
        v0 = 1.0 / a0
        p0 = mixture.p(a0, self.b, self.eta)
        ax_star = mx_hat**2 / qx_hat
        mu = 0.0
        for k in range(self.K):
            def r_times_f(bx, k=k):
                bx_star = (mx_hat / qx_hat) * bx
                return (self.b[k] + bx_star) / (a0[k] + ax_star) * f(bx)
            mu = mu + p0[k] * gaussian_measure(
                mx_hat * r0[k], jnp.sqrt(qx_hat + mx_hat**2 * v0[k]),
                r_times_f)
        return mu

    def beliefs_measure(self, ax, f):
        mu = 0.0
        for k in range(self.K):
            mu = mu + self.probs[k] * gaussian_measure(
                ax * self.means[k], jnp.sqrt(ax + ax**2 * self.vars[k]), f)
        return mu

    def measure(self, f):
        mu = 0.0
        for k in range(self.K):
            mu = mu + self.probs[k] * gaussian_measure(
                self.means[k], jnp.sqrt(self.vars[k]), f)
        return mu
