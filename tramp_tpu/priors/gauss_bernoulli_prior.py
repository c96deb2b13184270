"""Gauss-Bernoulli (spike-and-slab) prior.
Reference tramp/priors/gauss_bernoulli_prior.py."""
import jax
import jax.numpy as jnp

from .base_prior import Prior
from ..beliefs import normal, sparse
from ..utils.integration import gaussian_measure, gaussian_measure_boundary


class GaussBernoulliPrior(Prior):
    r"""$p(x)=[1-\rho]\,\delta(x)+\rho\,\mathcal{N}(x|mean, var)$.
    Reference gauss_bernoulli_prior.py:8-126."""

    _data_fields = ("rho", "mean", "var")
    _meta_fields = ("size", "isotropic")

    def __init__(self, size, rho=0.5, mean=0.0, var=1.0, isotropic=True):
        self.size = size
        self.rho = rho
        self.mean = mean
        self.var = var
        self.isotropic = isotropic

    @property
    def a(self):
        return 1.0 / self.var

    @property
    def b(self):
        return self.mean / self.var

    @property
    def eta(self):
        # eta = A(a,b) - log(rho/(1-rho)), reference l:36
        return normal.A(self.a, self.b) - jnp.log(self.rho / (1.0 - self.rho))

    def sample(self, key):
        shape = self.size if isinstance(self.size, tuple) else (self.size,)
        kg, kb = jax.random.split(key)
        x_gauss = self.mean + jnp.sqrt(self.var) * jax.random.normal(kg, shape)
        x_bern = jax.random.bernoulli(kb, self.rho, shape)
        return x_gauss * x_bern

    def math(self):
        return r"$\mathcal{N}_\rho$"

    def second_moment(self):
        return self.rho * (self.mean**2 + self.var)

    def forward_second_moment_FG(self, tx_hat):
        return sparse.tau(tx_hat + self.a, self.b, self.eta)

    def scalar_forward_mean(self, ax, bx):
        return sparse.r(ax + self.a, bx + self.b, self.eta)

    def scalar_forward_variance(self, ax, bx):
        return sparse.v(ax + self.a, bx + self.b, self.eta)

    def scalar_log_partition(self, ax, bx):
        return (sparse.A(ax + self.a, bx + self.b, self.eta)
                - sparse.A(self.a, self.b, self.eta))

    def compute_forward_posterior(self, ax, bx):
        a = ax + self.a
        b = bx + self.b
        rx = sparse.r(a, b, self.eta)
        vx = sparse.v(a, b, self.eta)
        if self.isotropic:
            vx = jnp.mean(vx)
        return rx, vx

    def compute_log_partition(self, ax, bx):
        return jnp.mean(self.scalar_log_partition(ax, bx))

    def b_measure(self, mx_hat, qx_hat, tx0_hat, f):
        a0 = self.a + tx0_hat
        r0 = self.b / a0
        v0 = 1.0 / a0
        rho = sparse.p(a0, self.b, self.eta)
        mu_0 = gaussian_measure(0.0, jnp.sqrt(qx_hat), f)
        mu_1 = gaussian_measure(
            mx_hat * r0, jnp.sqrt(qx_hat + mx_hat**2 * v0), f)
        return (1.0 - rho) * mu_0 + rho * mu_1

    def bx_measure(self, mx_hat, qx_hat, tx0_hat, f):
        a0 = self.a + tx0_hat
        r0 = self.b / a0
        v0 = 1.0 / a0
        rho = sparse.p(a0, self.b, self.eta)
        ax_star = mx_hat**2 / qx_hat

        def r_times_f(bx):
            bx_star = (mx_hat / qx_hat) * bx
            return (self.b + bx_star) / (a0 + ax_star) * f(bx)

        mu_1 = gaussian_measure(
            mx_hat * r0, jnp.sqrt(qx_hat + mx_hat**2 * v0), r_times_f)
        return rho * mu_1

    def beliefs_measure(self, ax, f):
        # spike<->slab transition layer: the posterior slab probability
        # expit(normal.A(ax + a, bx + b) - eta) switches at
        # |bx + b| = b* = sqrt(2 a_eff (eta + log(a_eff/2pi)/2)), a layer of
        # width ~a_eff/b* — a vanishing fraction of the measure scale ~ax at
        # large ax, where a global fixed rule loses the informative
        # correction (cf. utils.integration.gaussian_measure_boundary)
        a_eff = ax + self.a
        arg = 2.0 * a_eff * (self.eta + 0.5 * jnp.log(a_eff / (2 * jnp.pi)))
        b_star = jnp.sqrt(jnp.maximum(arg, 0.0))
        w = 10.0 * a_eff / jnp.maximum(b_star, 1.0)
        pts = jnp.stack([-b_star - self.b - w, -b_star - self.b + w,
                         b_star - self.b - w, b_star - self.b + w])
        mu_0 = gaussian_measure_boundary(0.0, jnp.sqrt(ax), pts, f)
        mu_1 = gaussian_measure_boundary(
            ax * self.mean, jnp.sqrt(ax + ax**2 * self.var), pts, f)
        return (1.0 - self.rho) * mu_0 + self.rho * mu_1

    def measure(self, f):
        g = gaussian_measure(self.mean, jnp.sqrt(self.var), f)
        return (1.0 - self.rho) * f(0.0) + self.rho * g
