"""Complex unitary channel x = U z, packed-real representation.
Reference tramp/channels/linear/unitary_channel.py."""
import numpy as np
import jax.numpy as jnp

from .base_channel import Channel
from ..utils.misc import complex2array, array2complex


def check_unitary(U):
    if U.shape[0] != U.shape[1]:
        raise ValueError(f"U.shape = {U.shape}")
    if not np.allclose(np.asarray(U) @ np.asarray(U).conj().T,
                       np.identity(U.shape[0]), atol=1e-6):
        raise ValueError("U not unitary")


class UnitaryChannel(Channel):

    _data_fields = ("U",)
    _meta_fields = ("name", "N")

    def __init__(self, U, name="U"):
        check_unitary(U)
        self.name = name
        self.N = U.shape[0]
        self.U = jnp.asarray(U)

    def sample(self, key, Z):
        return complex2array(self.U @ array2complex(Z))

    def math(self):
        return rf"${self.name}$"

    def second_moment(self, tau_z):
        return tau_z

    def compute_forward_message(self, az, bz, ax, bx):
        return az, complex2array(self.U @ array2complex(bz))

    def compute_backward_message(self, az, bz, ax, bx):
        return ax, complex2array(self.U.conj().T @ array2complex(bx))

    def compute_forward_state_evolution(self, az, ax, tau_z):
        return az

    def compute_backward_state_evolution(self, az, ax, tau_z):
        return ax

    def compute_log_partition(self, az, bz, ax, bx):
        b = complex2array(
            array2complex(bz) + self.U.conj().T @ array2complex(bx))
        a = az + ax
        return 0.5 * jnp.sum(b**2 / a) + self.N * jnp.log(2 * jnp.pi / a)

    def compute_mutual_information(self, az, ax, tau_z):
        return 0.5 * jnp.log((ax + az) * tau_z)

    def compute_free_energy(self, az, ax, tau_z):
        tau_x = self.second_moment(tau_z)
        I = self.compute_mutual_information(az, ax, tau_z)
        return (0.5 * (az * tau_z + ax * tau_x) - I
                + 0.5 * jnp.log(2 * jnp.pi * tau_z / jnp.e))
