"""Binary (+-1 spin) belief. Reference tramp/beliefs/binary.py."""
import jax.numpy as jnp


def A(b):
    # ln 2 cosh(b), overflow-safe
    return jnp.logaddexp(b, -b)


def r(b):
    return jnp.tanh(b)


def v(b):
    return 1.0 - jnp.tanh(b) ** 2


def tau(b):
    return 1.0
