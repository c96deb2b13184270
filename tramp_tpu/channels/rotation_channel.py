"""Orthogonal rotation channel x = R z (messages are rotations only).
Reference tramp/channels/linear/rotation_channel.py."""
import numpy as np
import jax.numpy as jnp

from .base_channel import Channel


def check_rotation(R):
    if R.shape[0] != R.shape[1]:
        raise ValueError(f"R.shape = {R.shape}")
    if not np.allclose(np.asarray(R) @ np.asarray(R).T,
                       np.identity(R.shape[0]), atol=1e-6):
        raise ValueError("R not a rotation")


class RotationChannel(Channel):

    _data_fields = ("R",)
    _meta_fields = ("name", "N")

    def __init__(self, R, name="R"):
        check_rotation(R)
        self.name = name
        self.N = R.shape[0]
        self.R = jnp.asarray(R)

    def sample(self, key, Z):
        return self.R @ Z

    def math(self):
        return rf"${self.name}$"

    def second_moment(self, tau_z):
        return tau_z

    def compute_forward_message(self, az, bz, ax, bx):
        return az, self.R @ bz

    def compute_backward_message(self, az, bz, ax, bx):
        return ax, self.R.T @ bx

    def compute_forward_state_evolution(self, az, ax, tau_z):
        return az

    def compute_backward_state_evolution(self, az, ax, tau_z):
        return ax

    def compute_log_partition(self, az, bz, ax, bx):
        b = bz + self.R.T @ bx
        a = az + ax
        return (0.5 * jnp.sum(b**2 / a)
                + 0.5 * self.N * jnp.log(2 * jnp.pi / a))

    def compute_mutual_information(self, az, ax, tau_z):
        return 0.5 * jnp.log((ax + az) * tau_z)

    def compute_free_energy(self, az, ax, tau_z):
        tau_x = self.second_moment(tau_z)
        I = self.compute_mutual_information(az, ax, tau_z)
        return (0.5 * (az * tau_z + ax * tau_x) - I
                + 0.5 * jnp.log(2 * jnp.pi * tau_z / jnp.e))
