"""Metrics. Reference tramp/algos/metrics.py."""
import jax.numpy as jnp
import numpy as np

from ..utils.misc import complex2array, array2complex


def mean_squared_error(x_true, x_pred):
    return float(jnp.mean((jnp.asarray(x_true) - jnp.asarray(x_pred)) ** 2))


def sign_symmetric_mse(x_true, x_pred):
    "MSE up to a global sign."
    x_true = jnp.asarray(x_true)
    x_pred = jnp.asarray(x_pred)
    mse_pos = jnp.mean((x_true - x_pred) ** 2)
    mse_neg = jnp.mean((x_true + x_pred) ** 2)
    return float(jnp.minimum(mse_pos, mse_neg))


def phase_symmetric_mse(x_true, x_pred):
    "MSE up to a global phase (100-angle scan, reference l:19-26)."
    x_true = jnp.asarray(x_true)
    zp = array2complex(jnp.asarray(x_pred))
    phis = jnp.linspace(0, 2 * jnp.pi, 100)
    rotated = jnp.exp(1j * phis)[:, None] * zp[None, :]
    packed = jnp.stack([jnp.real(rotated), jnp.imag(rotated)], axis=1)
    mses = jnp.mean((x_true[None] - packed) ** 2, axis=(1, 2))
    return float(jnp.min(mses))


def overlap(x_true, x_pred):
    return float(jnp.mean(jnp.asarray(x_true) * jnp.asarray(x_pred)))


METRICS = {
    "sign_mse": sign_symmetric_mse,
    "phase_mse": phase_symmetric_mse,
    "mse": mean_squared_error,
    "overlap": overlap,
}
