"""Sparse (spike-and-slab) belief. Reference tramp/beliefs/sparse.py."""
import jax.numpy as jnp
from jax.scipy.special import expit

from . import normal


def A(a, b, eta):
    return jnp.logaddexp(eta, normal.A(a, b))


def p(a, b, eta):
    "Probability of the slab component."
    return expit(normal.A(a, b) - eta)


def r(a, b, eta):
    return p(a, b, eta) * (b / a)


def v(a, b, eta):
    s = p(a, b, eta)
    return s / a + s * (1.0 - s) * (b / a) ** 2


def tau(a, b, eta):
    s = p(a, b, eta)
    return s / a + s * (b / a) ** 2
