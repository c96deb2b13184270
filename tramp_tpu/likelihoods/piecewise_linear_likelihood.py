"""Piecewise-linear likelihoods (relu, leaky-relu, hard-tanh, ...).
Reference tramp/likelihoods/piecewise_linear_likelihood.py.

SE measures use the probit-transformed truncated Gaussian rule so region
indicators are represented exactly (the reference bypasses them point-by-
point inside adaptive quad, which cannot be jitted)."""
import numpy as np
import jax.numpy as jnp
from jax.nn import softmax
from jax.scipy.special import logsumexp

from .base_likelihood import Likelihood
from ..beliefs import truncated
from jax.scipy.special import ndtri

from ..utils.special import norm_cdf
from ..utils.integration import (
    gaussian_measure, gaussian_measure_boundary, truncated_gaussian_measure,
    truncated_gaussian_measure_boundary, std_normal_nodes,
    composite_gauss_legendre,
)


class LinearRegionLikelihood:
    "One region: z in [zmin, zmax], y = x0 + slope*z. Reference l:9-155."

    def __init__(self, zmin, zmax, x0, slope):
        assert zmin < zmax
        self.zmin = zmin
        self.zmax = zmax
        self.x0 = x0
        self.slope = slope

    def x(self, z):
        return self.x0 + self.slope * z

    def strict_indicator(self, z):
        return (self.zmin < z) & (z < self.zmax)

    def sample(self, Z):
        return self.x(Z) * (self.zmin <= Z) * (Z < self.zmax)

    def contains(self, y):
        if self.slope == 0:
            return y == self.x0
        z = (y - self.x0) / self.slope
        return self.strict_indicator(z)

    def backward_mean(self, az, bz, y):
        if self.slope == 0:
            rz = truncated.r(az, bz, self.zmin, self.zmax)
        else:
            rz = (y - self.x0) / self.slope
        return jnp.where(self.contains(y), rz, 0.0)

    def backward_variance(self, az, bz, y):
        if self.slope == 0:
            vz = truncated.v(az, bz, self.zmin, self.zmax)
        else:
            vz = jnp.zeros_like(az * bz * y)
        return jnp.where(self.contains(y), vz, 0.0)

    def log_partitions(self, az, bz, y):
        if self.slope == 0:
            logZ = truncated.A(az, bz, self.zmin, self.zmax)
        else:
            z = (y - self.x0) / self.slope
            logZ = -0.5 * az * z**2 + bz * z - jnp.log(jnp.abs(self.slope))
        return jnp.where(self.contains(y), logZ, -jnp.inf)

    def b_measure(self, mz_hat, qz_hat, tz0_hat, f):
        tz0 = 1.0 / tz0_hat
        if self.slope == 0:
            az_star = mz_hat**2 / qz_hat + tz0_hat

            def p_times_f(bz):
                bz_star = (mz_hat / qz_hat) * bz
                p = truncated.p(az_star, bz_star, self.zmin, self.zmax)
                # x0 broadcast to bz: f may stack per-region results over
                # regions of mixed slope (PiecewiseLinearLikelihood._merge)
                return p * f(bz, jnp.broadcast_to(jnp.asarray(self.x0),
                                                  jnp.shape(bz)))

            sz_eff = jnp.sqrt(qz_hat + mz_hat**2 * tz0)
            return gaussian_measure(0.0, sz_eff, p_times_f)

        # slope != 0: z restricted to the region (outer truncated probit
        # rule), xi_b standard normal (inner rule)
        xi, w_xi = std_normal_nodes()
        xi = jnp.asarray(xi)
        w_xi = jnp.asarray(w_xi)

        def outer(z):
            # z: (nz,) -> broadcast over xi: (nz, nxi)
            bz = mz_hat * z[:, None] + jnp.sqrt(qz_hat) * xi[None, :]
            y = self.x(z)[:, None]
            vals = f(bz, jnp.broadcast_to(y, bz.shape))
            return jnp.sum(w_xi[None, :] * vals, axis=1)

        return truncated_gaussian_measure(
            0.0, jnp.sqrt(tz0), self.zmin, self.zmax, outer)

    def bz_measure(self, mz_hat, qz_hat, tz0_hat, f):
        tz0 = 1.0 / tz0_hat
        if self.slope == 0:
            az_star = mz_hat**2 / qz_hat + tz0_hat

            def rp_times_f(bz):
                bz_star = (mz_hat / qz_hat) * bz
                r = truncated.r(az_star, bz_star, self.zmin, self.zmax)
                p = truncated.p(az_star, bz_star, self.zmin, self.zmax)
                return r * p * f(bz, jnp.broadcast_to(jnp.asarray(self.x0),
                                                      jnp.shape(bz)))

            sz_eff = jnp.sqrt(qz_hat + mz_hat**2 * tz0)
            return gaussian_measure(0.0, sz_eff, rp_times_f)

        xi, w_xi = std_normal_nodes()
        xi = jnp.asarray(xi)
        w_xi = jnp.asarray(w_xi)

        def outer(z):
            bz = mz_hat * z[:, None] + jnp.sqrt(qz_hat) * xi[None, :]
            y = self.x(z)[:, None]
            vals = f(bz, jnp.broadcast_to(y, bz.shape))
            return z * jnp.sum(w_xi[None, :] * vals, axis=1)

        return truncated_gaussian_measure(
            0.0, jnp.sqrt(tz0), self.zmin, self.zmax, outer)

    def beliefs_measure(self, az, tau_z, f, panel_z=()):
        # floor at AMIN: the reference asserts az > 1/tau_z strictly
        # (sgn_likelihood.py:81); at the uninformed point az == 1/tau_z
        # the measure degenerates, and a tiny positive floor keeps it
        # defined while preserving the instability of that fixed point
        mz_hat = jnp.maximum(az - 1.0 / tau_z, 1e-11)
        if self.slope == 0:
            def integrand(bz):
                p = truncated.p(az, bz, self.zmin, self.zmax)
                return p * f(bz, jnp.broadcast_to(jnp.asarray(self.x0),
                                                  jnp.shape(bz)))
            sz_eff = jnp.sqrt(mz_hat + mz_hat**2 * tau_z)
            # boundary panels: the integrand's informative structure sits in
            # layers of width ~sqrt(az) around b = az * z_b for every finite
            # region boundary z_b (the truncation window of N(b/az, 1/az)).
            # At large az the layer is a vanishing fraction of sz_eff ~ az,
            # and the correction 1/az - v ~ az^{-3/2} that drives the SE
            # recovery cascade is lost without dedicated segments.
            bounds = [z for z in {self.zmin, self.zmax, *panel_z}
                      if np.isfinite(z)]
            if bounds:
                L = 10.0 * jnp.sqrt(az)
                pts = jnp.concatenate(
                    [jnp.stack([az * z - L, az * z + L]) for z in bounds])
                return gaussian_measure_boundary(0.0, sz_eff, pts, integrand)
            return gaussian_measure(0.0, sz_eff, integrand)

        # slope != 0: exact Gaussian factorization with bz OUTER.
        #   z ~ N(0, tau) on [zmin, zmax], bz | z ~ N(mz_hat z, mz_hat)
        # = bz ~ N(0, s_b^2), z | bz ~ N(c bz, s_c^2) truncated to the region
        # The merged integrand f(bz, y) has TWO boundary-layer scales in bz:
        # truncation layers of width ~sqrt(az) at bz = az*z_b, and region
        # log-partition crossings of width O(1) at the same centers (e.g.
        # the +-z sign ambiguity of abs at bz ~ 0). Outer panels carry both
        # scales; the inner probit rule represents the region indicator
        # exactly. This preserves the az^{-3/2} informative correction that
        # drives the SE recovery cascade (reference resolves it with
        # adaptive scipy.quad).
        s_b2 = mz_hat + mz_hat**2 * tau_z
        s_b = jnp.sqrt(s_b2)
        c = mz_hat * tau_z / s_b2
        s_c = jnp.sqrt(tau_z / (mz_hat * tau_z + 1.0))
        u_in, w_in = composite_gauss_legendre(0.0, 1.0, 12, 12)
        u_in = jnp.asarray(u_in)
        w_in = jnp.asarray(w_in)

        def outer(bz):
            m_c = c * bz
            lo = (0.0 if self.zmin == -jnp.inf
                  else norm_cdf((self.zmin - m_c) / s_c))
            hi = (1.0 if self.zmax == jnp.inf
                  else norm_cdf((self.zmax - m_c) / s_c))
            lo = jnp.broadcast_to(jnp.asarray(lo), jnp.shape(bz))
            hi = jnp.broadcast_to(jnp.asarray(hi), jnp.shape(bz))
            mass = (hi - lo)[..., None]
            p = jnp.clip(lo[..., None] + u_in * mass, 1e-300, 1.0 - 1e-16)
            z = m_c[..., None] + s_c * ndtri(p)
            vals = f(jnp.broadcast_to(bz[..., None], z.shape), self.x(z))
            return jnp.sum(mass * w_in * vals, axis=-1)

        bounds = [z for z in {self.zmin, self.zmax, *panel_z}
                  if np.isfinite(z)]
        if bounds:
            L1 = 10.0 * jnp.sqrt(az)   # truncation layers
            L2 = 10.0                  # crossing layers
            pts = jnp.concatenate([
                jnp.stack([az * z - L1, az * z - L2, az * z + L2,
                           az * z + L1]) for z in bounds])
            return gaussian_measure_boundary(0.0, s_b, pts, outer)
        return gaussian_measure(0.0, s_b, outer)


class PiecewiseLinearLikelihood(Likelihood):
    "Mixture of linear regions on the observation side. Reference l:157-242."

    _data_fields = ("y",)
    _meta_fields = ("name", "region_specs", "y_name", "isotropic")

    def __init__(self, name, regions, y, y_name="y", isotropic=True):
        self.y_name = y_name
        self.isotropic = isotropic
        self.name = name
        self.y = None if y is None else jnp.asarray(y)
        self.region_specs = tuple(
            (r["zmin"], r["zmax"], r["x0"], r["slope"]) for r in regions
        )

    @property
    def regions(self):
        return [LinearRegionLikelihood(zmin=a, zmax=b, x0=x0, slope=s)
                for (a, b, x0, s) in self.region_specs]

    @property
    def n_regions(self):
        return len(self.region_specs)

    def sample(self, key, Z):
        return sum(region.sample(Z) for region in self.regions)

    def math(self):
        return rf"$\mathrm{{{self.name}}}$"

    def _merge(self, az, bz, y):
        regions = self.regions
        # broadcast before stacking: slope!=0 regions return y-shaped
        # results, slope==0 regions bz-shaped — mixed when y is scalar
        rs = jnp.stack(jnp.broadcast_arrays(
            *[rg.backward_mean(az, bz, y) for rg in regions]), 0)
        vs = jnp.stack(jnp.broadcast_arrays(
            *[rg.backward_variance(az, bz, y) for rg in regions]), 0)
        As = jnp.stack(jnp.broadcast_arrays(
            *[rg.log_partitions(az, bz, y) for rg in regions]), 0)
        # quadrature nodes can land a rounding error outside every region
        # (y infinitesimally past a strict boundary): all As = -inf would
        # make softmax NaN; such points carry ~zero measure, any finite
        # value works
        all_off = ~jnp.isfinite(jnp.max(As, axis=0, keepdims=True))
        As = jnp.where(all_off, 0.0, As)
        ps = softmax(As, axis=0)
        rz = jnp.sum(ps * rs, axis=0)
        Dr = jnp.sum(ps * rs**2, axis=0) - rz**2
        vz = jnp.sum(ps * vs, axis=0) + Dr
        return rz, vz

    def scalar_backward_mean(self, az, bz, y):
        return self._merge(az, bz, y)[0]

    def scalar_backward_variance(self, az, bz, y):
        return self._merge(az, bz, y)[1]

    def scalar_log_partition(self, az, bz, y):
        As = jnp.stack(
            [rg.log_partitions(az, bz, y) for rg in self.regions], 0)
        return logsumexp(As, axis=0)

    def compute_backward_posterior(self, az, bz, y):
        rz, vz = self._merge(az, bz, y)
        if self.isotropic:
            vz = jnp.mean(vz)
        return rz, vz

    def compute_log_partition(self, az, bz, y):
        return jnp.mean(self.scalar_log_partition(az, bz, y))

    def b_measure(self, mz_hat, qz_hat, tz0_hat, f):
        return sum(rg.b_measure(mz_hat, qz_hat, tz0_hat, f)
                   for rg in self.regions)

    def bz_measure(self, mz_hat, qz_hat, tz0_hat, f):
        return sum(rg.bz_measure(mz_hat, qz_hat, tz0_hat, f)
                   for rg in self.regions)

    def beliefs_measure(self, az, tau_z, f):
        # f merges over ALL regions given y, so every slope-0 region's
        # measure needs boundary panels at every region bound (e.g. the
        # door's inner-region term has f-structure at both +-width)
        panel_z = tuple(
            z for (a, b, _, _) in self.region_specs for z in (a, b)
            if np.isfinite(z))
        return sum(rg.beliefs_measure(az, tau_z, f, panel_z=panel_z)
                   for rg in self.regions)


class ReluLikelihood(PiecewiseLinearLikelihood):
    def __init__(self, y, y_name="y", isotropic=True):
        neg = dict(zmin=-jnp.inf, zmax=0.0, slope=0.0, x0=0.0)
        pos = dict(zmin=0.0, zmax=jnp.inf, slope=1.0, x0=0.0)
        super().__init__("relu", [pos, neg], y, y_name, isotropic)


class LeakyReluLikelihood(PiecewiseLinearLikelihood):
    _meta_fields = ("name", "region_specs", "y_name", "isotropic", "slope")

    def __init__(self, slope, y, y_name="y", isotropic=True):
        self.slope = slope
        neg = dict(zmin=-jnp.inf, zmax=0.0, slope=slope, x0=0.0)
        pos = dict(zmin=0.0, zmax=jnp.inf, slope=1.0, x0=0.0)
        super().__init__("l-relu", [pos, neg], y, y_name, isotropic)


class AsymmetricAbsLikelihood(PiecewiseLinearLikelihood):
    _meta_fields = ("name", "region_specs", "y_name", "isotropic", "shift")

    def __init__(self, y, y_name="y", isotropic=True, shift=1e-4):
        self.shift = shift
        neg = dict(zmin=-jnp.inf, zmax=shift, slope=-1.0, x0=0.0)
        pos = dict(zmin=shift, zmax=jnp.inf, slope=+1.0, x0=0.0)
        super().__init__("a-abs", [pos, neg], y, y_name, isotropic)


class HardTanhLikelihood(PiecewiseLinearLikelihood):
    def __init__(self, y, y_name="y", isotropic=True):
        neg = dict(zmin=-jnp.inf, zmax=-1.0, slope=0.0, x0=-1.0)
        mid = dict(zmin=-1.0, zmax=+1.0, slope=1.0, x0=0.0)
        pos = dict(zmin=+1.0, zmax=jnp.inf, slope=0.0, x0=+1.0)
        super().__init__("h-tanh", [pos, mid, neg], y, y_name, isotropic)


class HardSigmoidLikelihood(PiecewiseLinearLikelihood):
    def __init__(self, y, y_name="y", isotropic=True):
        L = 3.0
        neg = dict(zmin=-jnp.inf, zmax=-L, slope=0.0, x0=0.0)
        mid = dict(zmin=-L, zmax=+L, slope=1.0 / (2 * L), x0=0.5)
        pos = dict(zmin=L, zmax=jnp.inf, slope=0.0, x0=1.0)
        super().__init__("h-sigm", [pos, mid, neg], y, y_name, isotropic)


class SymmetricDoorLikelihood(PiecewiseLinearLikelihood):
    _meta_fields = ("name", "region_specs", "y_name", "isotropic", "width")

    def __init__(self, width, y, y_name="y", isotropic=True):
        self.width = width
        neg = dict(zmin=-jnp.inf, zmax=-width, slope=0.0, x0=+1.0)
        mid = dict(zmin=-width, zmax=+width, slope=0.0, x0=-1.0)
        pos = dict(zmin=+width, zmax=jnp.inf, slope=0.0, x0=+1.0)
        super().__init__("door", [pos, mid, neg], y, y_name, isotropic)
