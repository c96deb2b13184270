"""Unitary DFT channel x = FFT z (ortho-normalized): messages are FFTs.
Reference tramp/channels/linear/dft_channel.py."""
import jax.numpy as jnp
from jax.numpy.fft import fftn, ifftn

from .base_channel import Channel
from ..utils.misc import complex2array, array2complex


class DFTChannel(Channel):

    _data_fields = ()
    _meta_fields = ("real",)

    def __init__(self, real=True):
        self.real = real

    def sample(self, key, Z):
        if not self.real:
            Z = array2complex(Z)
        return complex2array(fftn(Z, norm="ortho"))

    def math(self):
        return r"$\mathcal{F}$"

    def second_moment(self, tau_z):
        return tau_z

    def compute_forward_message(self, az, bz, ax, bx):
        if not self.real:
            bz = array2complex(bz)
        bx_new = complex2array(fftn(bz, norm="ortho"))
        return az, bx_new

    def compute_backward_message(self, az, bz, ax, bx):
        bz_new = ifftn(array2complex(bx), norm="ortho")
        bz_new = jnp.real(bz_new) if self.real else complex2array(bz_new)
        return ax, bz_new

    def compute_forward_state_evolution(self, az, ax, tau_z):
        return az

    def compute_backward_state_evolution(self, az, ax, tau_z):
        return ax

    def compute_log_partition(self, az, bz, ax, bx):
        _, bz_new = self.compute_backward_message(az, bz, ax, bx)
        b = bz + bz_new
        a = az + ax
        coef = 0.5 if self.real else 1.0
        n = b.size if self.real else b.size / 2
        return 0.5 * jnp.sum(b**2 / a) + coef * n * jnp.log(2 * jnp.pi / a)

    def compute_mutual_information(self, az, ax, tau_z):
        return 0.5 * jnp.log((ax + az) * tau_z)

    def compute_free_energy(self, az, ax, tau_z):
        tau_x = self.second_moment(tau_z)
        I = self.compute_mutual_information(az, ax, tau_z)
        return (0.5 * (az * tau_z + ax * tau_x) - I
                + 0.5 * jnp.log(2 * jnp.pi * tau_z / jnp.e))
