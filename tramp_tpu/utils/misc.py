"""Small array helpers. Reference tramp/utils/misc.py."""
import jax.numpy as jnp


def complex2array(z):
    """Pack complex z into a real array Z with Z[0]=Re z, Z[1]=Im z.
    Reference tramp/utils/misc.py:13-19."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=0)


def array2complex(Z):
    """Unpack real array Z (leading axis of length 2) into complex z.
    Reference tramp/utils/misc.py:22-27."""
    if Z.shape[0] != 2:
        raise ValueError("First axis of Z must be of length 2")
    return Z[0] + 1j * Z[1]


def relu(x):
    return jnp.maximum(0.0, x)


def leaky_relu(x, slope):
    return jnp.where(x < 0, slope * x, x)


def hard_tanh(x):
    return jnp.clip(x, -1.0, 1.0)


def hard_sigm(x):
    return jnp.clip(0.5 + x / 6.0, 0.0, 1.0)


def symm_door(x, width):
    return jnp.where(jnp.abs(x) < width, -1.0, 1.0)
