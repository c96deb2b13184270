"""Normal belief: log-partition A and moments for N with natural params (a, b).
Reference tramp/beliefs/normal.py."""
import jax.numpy as jnp


def A(a, b):
    return 0.5 * (b**2 / a + jnp.log(2.0 * jnp.pi / a))


def r(a, b):
    return b / a


def v(a, b):
    return 1.0 / a


def tau(a, b):
    return 1.0 / a + (b / a) ** 2
