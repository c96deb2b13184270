"""Structural channels: bias, sum, duplicate, concat, reshape.
Reference tramp/channels/linear/bias_channel.py, linear/sum_channel.py,
shape/duplicate_channel.py, shape/concat_channel.py, shape/reshape_channel.py."""
import numpy as np
import jax.numpy as jnp

from .base_channel import Channel, SIFactor, SOFactor


class BiasChannel(Channel):
    "x = z + bias. Reference bias_channel.py:5-53."

    _data_fields = ("bias",)
    _meta_fields = ()

    def __init__(self, bias):
        self.bias = jnp.asarray(bias)

    def sample(self, key, Z):
        return Z + self.bias

    def math(self):
        return r"$+$"

    def second_moment(self, tau_z):
        return tau_z + jnp.mean(self.bias**2)

    def compute_forward_message(self, az, bz, ax, bx):
        return az, bz + az * self.bias

    def compute_backward_message(self, az, bz, ax, bx):
        return ax, bx - ax * self.bias

    def compute_forward_state_evolution(self, az, ax, tau_z):
        return az

    def compute_backward_state_evolution(self, az, ax, tau_z):
        return ax

    def compute_log_partition(self, az, bz, ax, bx):
        b = bx + bz - ax * self.bias
        a = ax + az
        return 0.5 * jnp.sum(
            b**2 / a + jnp.log(2 * jnp.pi / a)
            + 2 * bx * self.bias - ax * self.bias**2)

    def compute_mutual_information(self, az, ax, tau_z):
        return 0.5 * jnp.log((ax + az) * tau_z)

    def compute_free_energy(self, az, ax, tau_z):
        tau_x = self.second_moment(tau_z)
        I = self.compute_mutual_information(az, ax, tau_z)
        return (0.5 * (az * tau_z + ax * tau_x) - I
                + 0.5 * jnp.log(2 * jnp.pi * tau_z / jnp.e))


class SumChannel(SOFactor):
    "x = sum_k z_k. Reference sum_channel.py:5-59."

    _data_fields = ()
    _meta_fields = ("n_prev",)

    def __init__(self, n_prev):
        self.n_prev = n_prev

    def sample(self, key, *Zs):
        return sum(Zs)

    def math(self):
        return r"$\Sigma$"

    def second_moment(self, *tau_zs):
        return sum(tau_zs)

    def compute_forward_message(self, az, bz, ax, bx):
        v_bar = sum(1.0 / a for a in az)
        r_bar = sum(b / a for a, b in zip(az, bz))
        return 1.0 / v_bar, r_bar / v_bar

    def compute_backward_message(self, az, bz, ax, bx):
        v_bar = sum(1.0 / a for a in az)
        r_bar = sum(b / a for a, b in zip(az, bz))
        vx = 1.0 / ax
        rx = bx / ax
        vk = [vx + v_bar - 1.0 / a for a in az]
        rk = [rx - r_bar + b / a for a, b in zip(az, bz)]
        az_new = [1.0 / v for v in vk]
        bz_new = [r / v for v, r in zip(vk, rk)]
        return az_new, bz_new

    def compute_forward_state_evolution(self, az, ax, tau_z):
        v_bar = sum(1.0 / a for a in az)
        return 1.0 / v_bar

    def compute_backward_state_evolution(self, az, ax, tau_z):
        v_bar = sum(1.0 / a for a in az)
        vx = 1.0 / ax
        vk = [vx + v_bar - 1.0 / a for a in az]
        return [1.0 / v for v in vk]

    def compute_log_partition(self, az, bz, ax, bx):
        # Gaussian integral of prod_k N(z_k; b_k/a_k, 1/a_k) delta(x - sum z)
        v_bar = sum(1.0 / a for a in az)
        r_bar = sum(b / a for a, b in zip(az, bz))
        a_sum = 1.0 / v_bar
        # combine with bwd message on x
        a = a_sum + ax
        b = a_sum * r_bar + bx
        logZ_z = sum(
            0.5 * jnp.sum(bk**2 / ak + jnp.log(2 * jnp.pi / ak))
            for ak, bk in zip(az, bz))
        logZ = logZ_z + 0.5 * jnp.sum(
            b**2 / a - a_sum * r_bar**2 + jnp.log(a_sum / a))
        return logZ


class DuplicateChannel(SIFactor):
    "x_k = z for all k. Reference duplicate_channel.py:4-51."

    _data_fields = ()
    _meta_fields = ("n_next",)

    def __init__(self, n_next):
        self.n_next = n_next

    def sample(self, key, Z):
        return (Z,) * self.n_next

    def math(self):
        return r"$\delta$"

    def second_moment(self, tau_z):
        return (tau_z,) * self.n_next

    def compute_forward_posterior(self, az, bz, ax, bx):
        rz, vz = self.compute_backward_posterior(az, bz, ax, bx)
        return [rz] * self.n_next, [vz] * self.n_next

    def compute_backward_posterior(self, az, bz, ax, bx):
        a = az + sum(ax)
        b = bz + sum(bx)
        return b / a, 1.0 / a

    def compute_forward_error(self, az, ax, tau_z):
        vz = self.compute_backward_error(az, ax, tau_z)
        return [vz] * self.n_next

    def compute_backward_error(self, az, ax, tau_z):
        return 1.0 / (az + sum(ax))

    def compute_log_partition(self, az, bz, ax, bx):
        a = az + sum(ax)
        b = bz + sum(bx)
        return 0.5 * jnp.sum(b**2 / a + jnp.log(2 * jnp.pi / a))


class ConcatChannel(SOFactor):
    "x = concat(z_1..z_K) along axis. Reference concat_channel.py:5-84."

    _data_fields = ()
    _meta_fields = ("Ns", "axis", "n_prev", "N")

    def __init__(self, Ns, axis=0):
        self.Ns = tuple(Ns)
        self.axis = axis
        self.n_prev = len(Ns)
        self.N = sum(Ns)

    def sample(self, key, *Zs):
        return jnp.concatenate(Zs, axis=self.axis)

    def math(self):
        return r"$\oplus$"

    def second_moment(self, *tau_zs):
        return sum(N * t for N, t in zip(self.Ns, tau_zs)) / self.N

    def _split(self, bx):
        idx = np.cumsum(self.Ns)[:-1]
        return jnp.split(bx, idx, axis=self.axis)

    def compute_forward_posterior(self, az, bz, ax, bx):
        rz, vz = self.compute_backward_posterior(az, bz, ax, bx)
        rx = jnp.concatenate(rz, axis=self.axis)
        vx = sum(N * v for N, v in zip(self.Ns, vz)) / self.N
        return rx, vx

    def compute_backward_posterior(self, az, bz, ax, bx):
        bx_subs = self._split(bx)
        ak = [a + ax for a in az]
        bk = [b + s for b, s in zip(bz, bx_subs)]
        return [b / a for a, b in zip(ak, bk)], [1.0 / a for a in ak]

    def compute_forward_error(self, az, ax, tau_z):
        vz = self.compute_backward_error(az, ax, tau_z)
        return sum(N * v for N, v in zip(self.Ns, vz)) / self.N

    def compute_backward_error(self, az, ax, tau_z):
        return [1.0 / (a + ax) for a in az]

    def compute_log_partition(self, az, bz, ax, bx):
        bx_subs = self._split(bx)
        ak = [a + ax for a in az]
        bk = [b + s for b, s in zip(bz, bx_subs)]
        return sum(
            0.5 * jnp.sum(b**2 / a + jnp.log(2 * jnp.pi / a))
            for a, b in zip(ak, bk))


class ReshapeChannel(Channel):
    "Reshape passthrough. Reference reshape_channel.py:4-55."

    _data_fields = ()
    _meta_fields = ("prev_shape", "next_shape")

    def __init__(self, prev_shape, next_shape):
        self.prev_shape = (prev_shape if isinstance(prev_shape, tuple)
                           else (prev_shape,))
        self.next_shape = (next_shape if isinstance(next_shape, tuple)
                           else (next_shape,))

    def sample(self, key, Z):
        return Z.reshape(self.next_shape)

    def math(self):
        return r"$\delta$"

    def second_moment(self, tau_z):
        return tau_z

    def compute_forward_message(self, az, bz, ax, bx):
        return az, bz.reshape(self.next_shape)

    def compute_backward_message(self, az, bz, ax, bx):
        return ax, bx.reshape(self.prev_shape)

    def compute_forward_state_evolution(self, az, ax, tau_z):
        return az

    def compute_backward_state_evolution(self, az, ax, tau_z):
        return ax

    def compute_log_partition(self, az, bz, ax, bx):
        a = az + ax
        b = bz + bx.reshape(self.prev_shape)
        return 0.5 * jnp.sum(b**2 / a + jnp.log(2 * jnp.pi / a))

    def compute_mutual_information(self, az, ax, tau_z):
        return 0.5 * jnp.log((ax + az) * tau_z)

    def compute_free_energy(self, az, ax, tau_z):
        tau_x = self.second_moment(tau_z)
        I = self.compute_mutual_information(az, ax, tau_z)
        return (0.5 * (az * tau_z + ax * tau_x) - I
                + 0.5 * jnp.log(2 * jnp.pi * tau_z / jnp.e))
