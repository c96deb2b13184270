"""Gaussian-mixture belief with K components along the leading axis.
Reference tramp/beliefs/mixture.py."""
import jax.numpy as jnp
from jax.nn import softmax
from jax.scipy.special import logsumexp

from . import normal


def A(a, b, eta):
    xi = eta + normal.A(a, b)
    return logsumexp(xi, axis=0)


def p(a, b, eta):
    xi = eta + normal.A(a, b)
    return softmax(xi, axis=0)


def r(a, b, eta):
    s = p(a, b, eta)
    return jnp.sum(s * normal.r(a, b), axis=0)


def v(a, b, eta):
    s = p(a, b, eta)
    r_ = normal.r(a, b)
    vs = jnp.sum(s * normal.v(a, b), axis=0)
    # pairwise dispersion term: 0.5 sum_kl s_k s_l (r_k - r_l)^2
    m1 = jnp.sum(s * r_, axis=0)
    m2 = jnp.sum(s * r_**2, axis=0)
    Dr = m2 - m1**2
    return Dr + vs


def tau(a, b, eta):
    s = p(a, b, eta)
    return jnp.sum(s * normal.tau(a, b), axis=0)
