"""Standalone analytic abs/relu channels via erfcx-based phi functions.

Functionally equivalent alternatives to the piecewise-linear engine versions
(and, like the reference's tramp/channels/activation/abs_channel.py:8 and
relu_channel.py:8, NOT in the string registry). The posterior is a two-branch
Gaussian mixture weighted through the log-Phi derivatives
phi_0/phi_1/phi_2 (utils/special.py, reference tramp/utils/misc.py:74-86).
"""
import jax
import jax.numpy as jnp

from .base_channel import Channel
from ..utils.special import phi_0, phi_1, phi_2


def _sigmoid(x):
    return jax.nn.sigmoid(x)


class AnalyticAbsChannel(Channel):
    "x = |z| with closed-form two-branch posterior. Reference abs_channel.py."

    _data_fields = ()
    _meta_fields = ()

    def __init__(self):
        pass

    def sample(self, key, Z):
        return jnp.abs(Z)

    def math(self):
        return r"$\mathrm{abs}$"

    def second_moment(self, tau_z):
        return tau_z

    def _branches(self, az, bz, ax, bx):
        a = ax + az
        x_pos = (bx + bz) / jnp.sqrt(a)
        x_neg = (bx - bz) / jnp.sqrt(a)
        delta = phi_0(x_pos) - phi_0(x_neg)
        return a, x_pos, x_neg, _sigmoid(delta), _sigmoid(-delta)

    def compute_forward_posterior(self, az, bz, ax, bx):
        a, x_pos, x_neg, s_pos, s_neg = self._branches(az, bz, ax, bx)
        r_pos = phi_1(x_pos) / jnp.sqrt(a)
        r_neg = phi_1(x_neg) / jnp.sqrt(a)
        v_pos = phi_2(x_pos) / a
        v_neg = phi_2(x_neg) / a
        rx = s_pos * r_pos + s_neg * r_neg
        v = s_pos * s_neg * (r_pos - r_neg) ** 2 \
            + s_pos * v_pos + s_neg * v_neg
        return rx, jnp.mean(v)

    def compute_backward_posterior(self, az, bz, ax, bx):
        a, x_pos, x_neg, s_pos, s_neg = self._branches(az, bz, ax, bx)
        r_pos = +phi_1(x_pos) / jnp.sqrt(a)
        r_neg = -phi_1(x_neg) / jnp.sqrt(a)
        v_pos = phi_2(x_pos) / a
        v_neg = phi_2(x_neg) / a
        rz = s_pos * r_pos + s_neg * r_neg
        v = s_pos * s_neg * (r_pos - r_neg) ** 2 \
            + s_pos * v_pos + s_neg * v_neg
        return rz, jnp.mean(v)


class AnalyticReluChannel(Channel):
    "x = relu(z), closed-form two-branch posterior. Reference relu_channel.py."

    _data_fields = ()
    _meta_fields = ()

    def __init__(self):
        pass

    def sample(self, key, Z):
        return jnp.maximum(Z, 0.0)

    def math(self):
        return r"$\mathrm{relu}$"

    def second_moment(self, tau_z):
        return 0.5 * tau_z

    def _branches(self, az, bz, ax, bx):
        a = ax + az
        x_pos = (bx + bz) / jnp.sqrt(a)
        x_neg = -bz / jnp.sqrt(az)
        delta = phi_0(x_pos) - phi_0(x_neg) + 0.5 * jnp.log(az / a)
        return a, x_pos, x_neg, _sigmoid(delta), _sigmoid(-delta)

    def compute_forward_posterior(self, az, bz, ax, bx):
        a, x_pos, x_neg, s_pos, s_neg = self._branches(az, bz, ax, bx)
        r_pos = phi_1(x_pos) / jnp.sqrt(a)
        v_pos = phi_2(x_pos) / a
        rx = s_pos * r_pos                       # negative branch: x = 0
        v = s_pos * s_neg * r_pos**2 + s_pos * v_pos
        return rx, jnp.mean(v)

    def compute_backward_posterior(self, az, bz, ax, bx):
        a, x_pos, x_neg, s_pos, s_neg = self._branches(az, bz, ax, bx)
        r_pos = +phi_1(x_pos) / jnp.sqrt(a)
        r_neg = -phi_1(x_neg) / jnp.sqrt(az)
        v_pos = phi_2(x_pos) / a
        v_neg = phi_2(x_neg) / az
        rz = s_pos * r_pos + s_neg * r_neg
        v = s_pos * s_neg * (r_pos - r_neg) ** 2 \
            + s_pos * v_pos + s_neg * v_neg
        return rz, jnp.mean(v)
