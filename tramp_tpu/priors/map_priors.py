"""MAP priors (L1 and L2,1 penalties) with soft-threshold proximal maps.
Reference tramp/priors/map_L1_norm_prior.py and map_L21_norm_prior.py.

MAP semantics: the 'variance' is the prox sensitivity 1/ax * d(prox)/db and
q_x = -2 dA/da replaces tau (docs/implementation.rst, section map_priors).
"""
import jax
import jax.numpy as jnp

from .base_prior import Prior


def soft_threshold(x, gamma):
    "Reference map_L1_norm_prior.py:11-13."
    return jnp.maximum(0.0, 1.0 - gamma / jnp.abs(x)) * x


def v_soft_threshold(x, gamma):
    "Reference map_L1_norm_prior.py:16-17."
    return (jnp.abs(x) > gamma).astype(x.dtype)


def group_soft_threshold(x, gamma, axis):
    "Reference map_L21_norm_prior.py:12-14."
    x_norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return jnp.maximum(0.0, 1.0 - gamma / x_norm) * x


def v_group_soft_threshold(x, gamma, axis):
    "Reference map_L21_norm_prior.py:17-20."
    x_norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return (x_norm > gamma) * (
        1.0 + (x**2 / x_norm**2 - 1.0) * gamma / x_norm)


class MAP_L1NormPrior(Prior):
    r"""MAP prior for the L1 penalty $f(x)=e^{-\gamma \|x\|_1}$.
    Reference map_L1_norm_prior.py:20-88."""

    _data_fields = ("gamma",)
    _meta_fields = ("size", "isotropic")

    def __init__(self, size, gamma=1.0, isotropic=True):
        self.size = size
        self.gamma = gamma
        self.isotropic = isotropic

    def sample(self, key):
        shape = self.size if isinstance(self.size, tuple) else (self.size,)
        return jax.random.laplace(key, shape) / self.gamma

    def math(self):
        return r"$\Vert.\Vert_1$"

    def scalar_forward_mean(self, ax, bx):
        return (1.0 / ax) * soft_threshold(bx, self.gamma)

    def scalar_forward_variance(self, ax, bx):
        return (1.0 / ax) * v_soft_threshold(bx, self.gamma)

    def scalar_log_partition(self, ax, bx):
        rx = (1.0 / ax) * soft_threshold(bx, self.gamma)
        return bx * rx - 0.5 * ax * rx**2 - self.gamma * jnp.abs(rx)

    def compute_forward_posterior(self, ax, bx):
        rx = (1.0 / ax) * soft_threshold(bx, self.gamma)
        vx = (1.0 / ax) * v_soft_threshold(bx, self.gamma)
        if self.isotropic:
            vx = jnp.mean(vx)
        return rx, vx

    def compute_log_partition(self, ax, bx):
        return jnp.mean(self.scalar_log_partition(ax, bx))


class MAP_L21NormPrior(Prior):
    r"""MAP prior for the L2,1 penalty $f(x)=e^{-\gamma \|x\|_{2,1}}$,
    group norm over ``axis``. Reference map_L21_norm_prior.py:23-89."""

    _data_fields = ("gamma",)
    _meta_fields = ("size", "axis", "isotropic")

    def __init__(self, size, gamma=1.0, axis=0, isotropic=True):
        assert isinstance(size, tuple) and len(size) > 1, \
            "size must be a tuple of length > 1"
        self.size = size
        self.gamma = gamma
        self.axis = axis
        self.isotropic = isotropic

    def sample(self, key):
        # reference returns zeros as a placeholder (map_L21_norm_prior.py:55-60)
        return jnp.zeros(self.size)

    def math(self):
        return r"$\Vert.\Vert_{2,1}$"

    def compute_forward_posterior(self, ax, bx):
        rx = (1.0 / ax) * group_soft_threshold(bx, self.gamma, self.axis)
        vx = (1.0 / ax) * v_group_soft_threshold(bx, self.gamma, self.axis)
        if self.isotropic:
            vx = jnp.mean(vx)
        return rx, vx

    def compute_log_partition(self, ax, bx):
        rx = (1.0 / ax) * group_soft_threshold(bx, self.gamma, self.axis)
        norms = jnp.linalg.norm(rx, axis=self.axis)
        A_sum = jnp.sum(bx * rx - 0.5 * ax * rx**2) \
            - self.gamma * jnp.sum(norms)
        N = 1
        for s in self.size:
            N *= s
        return A_sum / N
