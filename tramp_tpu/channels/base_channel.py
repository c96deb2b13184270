"""Channel base classes. Reference tramp/channels/base_channel.py:5-139."""
import jax.numpy as jnp

from ..base import Factor, compute_a_new, compute_ab_new


class Channel(Factor):
    n_next = 1
    n_prev = 1

    def compute_forward_message(self, az, bz, ax, bx):
        rx, vx = self.compute_forward_posterior(az, bz, ax, bx)
        return compute_ab_new(rx, vx, ax, bx)

    def compute_backward_message(self, az, bz, ax, bx):
        rz, vz = self.compute_backward_posterior(az, bz, ax, bx)
        return compute_ab_new(rz, vz, az, bz)

    def compute_forward_state_evolution(self, az, ax, tau_z):
        vx = self.compute_forward_error(az, ax, tau_z)
        return compute_a_new(vx, ax)

    def compute_backward_state_evolution(self, az, ax, tau_z):
        vz = self.compute_backward_error(az, ax, tau_z)
        return compute_a_new(vz, az)

    # Elementwise kernels used inside the (vectorized) SE quadrature
    # measures. Channels whose posterior applies an isotropic reduction
    # (mean over elements) MUST override these with non-reducing variants:
    # the quadrature evaluates f on a grid of nodes at once, so a reduction
    # inside f would (incorrectly) average across quadrature nodes.
    def scalar_forward_variance(self, az, bz, ax, bx):
        rx, vx = self.compute_forward_posterior(az, bz, ax, bx)
        return vx

    def scalar_backward_variance(self, az, bz, ax, bx):
        rz, vz = self.compute_backward_posterior(az, bz, ax, bx)
        return vz

    def scalar_log_partition(self, az, bz, ax, bx):
        return self.compute_log_partition(az, bz, ax, bx)

    def compute_forward_error(self, az, ax, tau_z):
        def variance(bz, bx):
            return self.scalar_forward_variance(az, bz, ax, bx)
        return self.beliefs_measure(az, ax, tau_z, f=variance)

    def compute_backward_error(self, az, ax, tau_z):
        def variance(bz, bx):
            return self.scalar_backward_variance(az, bz, ax, bx)
        return self.beliefs_measure(az, ax, tau_z, f=variance)

    def compute_forward_overlap(self, az, ax, tau_z):
        vx = self.compute_forward_error(az, ax, tau_z)
        return self.second_moment(tau_z) - vx

    def compute_backward_overlap(self, az, ax, tau_z):
        vz = self.compute_backward_error(az, ax, tau_z)
        return tau_z - vz

    def compute_free_energy(self, az, ax, tau_z):
        def log_partition(bz, bx):
            return self.scalar_log_partition(az, bz, ax, bx)
        return self.beliefs_measure(az, ax, tau_z, f=log_partition)

    def get_alpha(self):
        return getattr(self, "alpha", 1.0)

    def compute_mutual_information(self, az, ax, tau_z):
        alpha = self.get_alpha()
        tau_x = self.second_moment(tau_z)
        A = self.compute_free_energy(az, ax, tau_z)
        return (0.5 * (az * tau_z + alpha * ax * tau_x) - A
                + 0.5 * jnp.log(2 * jnp.pi * tau_z / jnp.e))

    def compute_precision(self, vz, vx, tau_z, n_steps=60):
        """Solve (backward_error, forward_error) = (vz, vx) for (az, ax) by
        damped fixed-point iteration (replaces scipy root, reference l:70-79).
        """
        az, ax = 1.0 / vz, 1.0 / vx
        for _ in range(n_steps):
            vz_c = self.compute_backward_error(az, ax, tau_z)
            vx_c = self.compute_forward_error(az, ax, tau_z)
            az = jnp.maximum(az + (1.0 / vz - 1.0 / vz_c) * 0.5, 1e-11)
            ax = jnp.maximum(ax + (1.0 / vx - 1.0 / vx_c) * 0.5, 1e-11)
        return az, ax

    def compute_dual_mutual_information(self, vz, vx, tau_z):
        alpha = self.get_alpha()
        az, ax = self.compute_precision(vz, vx, tau_z)
        I = self.compute_mutual_information(az, ax, tau_z)
        return I - 0.5 * (az * vz + alpha * ax * vx)

    def compute_dual_free_energy(self, mz, mx, tau_z):
        alpha = self.get_alpha()
        tau_x = self.second_moment(tau_z)
        az, ax = self.compute_precision(tau_z - mz, tau_x - mx, tau_z)
        A = self.compute_free_energy(az, ax, tau_z)
        return 0.5 * (az * mz + alpha * ax * mx) - A


class SIFactor(Factor):
    "Single-input factor (multi-output). Reference base_channel.py:99-117."
    n_prev = 1

    def compute_backward_message(self, az, bz, ax, bx):
        rz, vz = self.compute_backward_posterior(az, bz, ax, bx)
        return compute_ab_new(rz, vz, az, bz)

    def compute_backward_state_evolution(self, az, ax, tau_z):
        vz = self.compute_backward_error(az, ax, tau_z)
        return compute_a_new(vz, az)


class SOFactor(Factor):
    "Single-output factor (multi-input). Reference base_channel.py:120-136."
    n_next = 1

    def compute_forward_message(self, az, bz, ax, bx):
        rx, vx = self.compute_forward_posterior(az, bz, ax, bx)
        return compute_ab_new(rx, vx, ax, bx)

    def compute_forward_state_evolution(self, az, ax, tau_z):
        vx = self.compute_forward_error(az, ax, tau_z)
        return compute_a_new(vx, ax)


class MatrixFactorization(SOFactor):
    n_prev = 2
