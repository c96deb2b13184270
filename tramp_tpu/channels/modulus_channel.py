"""Modulus channel x = |z| for complex z packed as real (2, ...) arrays.
Posteriors are not implemented (stub, matching reference
tramp/channels/activation/modulus_channel.py:9-48); used only as a leaf
channel that to_observed() swaps for ModulusLikelihood."""
import jax.numpy as jnp

from .base_channel import Channel
from ..utils.misc import array2complex


class ModulusChannel(Channel):

    _data_fields = ()
    _meta_fields = ()

    def __init__(self):
        pass

    def sample(self, key, Z):
        return jnp.abs(array2complex(Z))

    def math(self):
        return r"$|\cdot|$"

    def second_moment(self, tau_z):
        return 2 * tau_z

    def compute_forward_posterior(self, az, bz, ax, bx):
        raise NotImplementedError

    def compute_backward_posterior(self, az, bz, ax, bx):
        raise NotImplementedError
