"""Exponential belief (b < 0). Reference tramp/beliefs/exponential.py."""
import jax.numpy as jnp


def A(b):
    return -jnp.log(-b)


def r(b):
    return -1.0 / b


def v(b):
    return 1.0 / b**2


def tau(b):
    return 2.0 / b**2
