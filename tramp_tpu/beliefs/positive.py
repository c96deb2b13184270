"""Positive (half-line truncated normal) belief. Reference tramp/beliefs/positive.py."""
import jax.numpy as jnp

from ..utils.truncated_normal import (
    truncated_normal_mean, truncated_normal_var, truncated_normal_logZ,
    truncated_normal_proba,
)

INF = jnp.inf


def A(a, b):
    return truncated_normal_logZ(b / a, 1.0 / a, 0.0, INF)


def r(a, b):
    return truncated_normal_mean(b / a, 1.0 / a, 0.0, INF)


def v(a, b):
    return truncated_normal_var(b / a, 1.0 / a, 0.0, INF)


def tau(a, b):
    return r(a, b) ** 2 + v(a, b)


def p(a, b):
    "Probability that x ~ N(b/a, 1/a) falls within R_+."
    return truncated_normal_proba(b / a, 1.0 / a, 0.0, INF)
