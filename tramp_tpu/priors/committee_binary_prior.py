"""Committee binary prior: K coupled +-1 spins per component, exact
enumeration over 2^K configurations.
Reference tramp/priors/committee_binary_prior.py."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.nn import softmax
from jax.scipy.special import logsumexp

from .base_prior import Prior
from ..beliefs import binary


def create_spins(K):
    "All 2^K spin configurations, shape (2^K, K). Reference l:9-13."
    x = ((np.arange(2**K)[:, None] >> np.arange(K - 1, -1, -1)[None, :]) & 1)
    return 2 * x - 1


class CommitteeBinaryPrior(Prior):
    r"""Binary prior over x of shape (N, K): K coupled spins with full KxK
    precision coupling ax. Reference committee_binary_prior.py:117-201."""

    _data_fields = ("p_pos",)
    _meta_fields = ("N", "K", "size")

    def __init__(self, N, K, p_pos=0.5):
        self.N = N
        self.K = K
        self.p_pos = p_pos
        self.size = (N, K)

    @property
    def p_neg(self):
        return 1.0 - self.p_pos

    @property
    def b(self):
        return 0.5 * jnp.log(self.p_pos / self.p_neg)

    @property
    def spins(self):
        return jnp.asarray(create_spins(self.K), dtype=float)

    def sample(self, key):
        u = jax.random.uniform(key, self.size)
        return jnp.where(u < self.p_pos, 1.0, -1.0)

    def math(self):
        return r"$p_\pm$"

    def second_moment(self):
        return 1.0

    def _Ax(self, ax, b):
        """Ax_.c = -1/2 x_c.ax.x_c + b.x_c with x_c the spin configs.
        ax is (K, K), b is (..., K). Reference l:37-76."""
        x = self.spins  # (C, K)
        xax = jnp.einsum("ck,kl,cl->c", x, ax, x)
        bx = jnp.einsum("...k,ck->...c", b, x)
        return -0.5 * xax + bx

    def scalar_forward_mean(self, ax, bx):
        prob = softmax(self._Ax(ax, bx + self.b), axis=-1)
        return prob @ self.spins

    def scalar_forward_variance(self, ax, bx):
        x = self.spins
        prob = softmax(self._Ax(ax, bx + self.b), axis=-1)
        m = prob @ x  # (K,)
        xx = jnp.einsum("c,ck,cl->kl", prob, x, x)
        # V = sum_cd p_c p_d (x_c - x_d)(x_c - x_d)^T = 2 (E[xx^T] - m m^T)
        return 2.0 * (xx - jnp.outer(m, m))

    def scalar_log_partition(self, ax, bx):
        Ax = self._Ax(ax, bx + self.b)
        return logsumexp(Ax, axis=-1) / self.K - binary.A(self.b)

    def compute_forward_posterior(self, ax, bx):
        x = self.spins
        prob = softmax(self._Ax(ax, bx + self.b), axis=-1)  # (N, C)
        rx = prob @ x  # (N, K)
        # V_kl = (1/N) sum_i sum_cd p_ic p_id C_cdkl = (2/N) sum_i
        #        (E_i[xx^T] - m_i m_i^T)
        xx = jnp.einsum("ic,ck,cl->kl", prob, x, x) / self.N
        mm = jnp.einsum("ik,il->kl", rx, rx) / self.N
        vx = 2.0 * (xx - mm)
        return rx, vx

    def compute_log_partition(self, ax, bx):
        Ax = self._Ax(ax, bx + self.b)
        return jnp.mean(logsumexp(Ax, axis=-1)) - binary.A(self.b)

    def measure(self, f):
        return self.p_pos * f(+1.0) + self.p_neg * f(-1.0)
