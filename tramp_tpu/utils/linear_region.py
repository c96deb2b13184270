"""Truncated-Gaussian inference within one linear piece x = x0 + slope*z,
z in [zmin, zmax]. All region parameters are static Python floats.
Reference tramp/utils/linear_region.py:13-114."""
import jax.numpy as jnp

from .truncated_normal import (
    truncated_normal_mean, truncated_normal_var, truncated_normal_logZ,
    truncated_normal_proba,
)
from .integration import (
    gaussian_measure_2d, gaussian_measure_2d_full,
)


class LinearRegion:

    def __init__(self, zmin, zmax, x0, slope):
        assert zmin < zmax
        self.zmin = zmin
        self.zmax = zmax
        self.x0 = x0
        self.slope = slope

    def __repr__(self):
        return (f"LinearRegion(zmin={self.zmin}, zmax={self.zmax}, "
                f"x0={self.x0}, slope={self.slope})")

    def x(self, z):
        return self.x0 + self.slope * z

    def sample(self, Z):
        return self.x(Z) * (self.zmin <= Z) * (Z < self.zmax)

    def get_r0_v0(self, az, bz, ax, bx):
        a = az + self.slope**2 * ax
        b = bz + self.slope * (bx - ax * self.x0)
        return b / a, 1.0 / a

    def backward_mean(self, az, bz, ax, bx):
        r0, v0 = self.get_r0_v0(az, bz, ax, bx)
        return truncated_normal_mean(r0, v0, self.zmin, self.zmax)

    def backward_variance(self, az, bz, ax, bx):
        r0, v0 = self.get_r0_v0(az, bz, ax, bx)
        return truncated_normal_var(r0, v0, self.zmin, self.zmax)

    def forward_mean(self, az, bz, ax, bx):
        return self.slope * self.backward_mean(az, bz, ax, bx) + self.x0

    def forward_variance(self, az, bz, ax, bx):
        return self.slope**2 * self.backward_variance(az, bz, ax, bx)

    def log_partitions(self, az, bz, ax, bx):
        "Element-wise log partition. Reference linear_region.py:59-65."
        r0, v0 = self.get_r0_v0(az, bz, ax, bx)
        trunc_logZ = truncated_normal_logZ(r0, v0, self.zmin, self.zmax)
        return trunc_logZ - 0.5 * ax * self.x0**2 + bx * self.x0

    def second_moment(self, tau_z):
        rz = truncated_normal_mean(0.0, tau_z, self.zmin, self.zmax)
        vz = truncated_normal_var(0.0, tau_z, self.zmin, self.zmax)
        rx = self.slope * rz + self.x0
        vx = self.slope**2 * vz
        return rx**2 + vx

    def proba_tau(self, tau_z):
        return truncated_normal_proba(0.0, tau_z, self.zmin, self.zmax)

    def proba_ab(self, az, bz, ax, bx):
        r0, v0 = self.get_r0_v0(az, bz, ax, bx)
        return truncated_normal_proba(r0, v0, self.zmin, self.zmax)

    def beliefs_measure(self, az, ax, tau_z, f):
        "SE measure over (bz, bx). Reference linear_region.py:82-103."
        u_eff = jnp.maximum(0.0, az * tau_z - 1.0)
        mean_x = ax * self.x0

        def integrand(bz, bx):
            return self.proba_ab(az, bz, ax, bx) * f(bz, bx)

        if self.slope == 0:
            sz_eff = jnp.sqrt(az * u_eff)
            sx_eff = jnp.sqrt(ax * (self.slope**2 * ax * tau_z + 1.0))
            return gaussian_measure_2d(0.0, sz_eff, mean_x, sx_eff, integrand)
        # full covariance; degenerate cases (ax=0 or u_eff=0) handled by
        # jitter on the diagonal
        eps = 1e-12
        cov_zz = az * u_eff + eps
        cov_zx = self.slope * ax * u_eff
        cov_xx = ax * (self.slope**2 * ax * tau_z + 1.0) + eps
        cov = jnp.array([[cov_zz, cov_zx], [cov_zx, cov_xx]])
        mean = jnp.array([0.0, mean_x])
        return gaussian_measure_2d_full(mean, cov, integrand)
