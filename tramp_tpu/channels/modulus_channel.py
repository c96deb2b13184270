r"""Modulus channel x = |z| for complex z packed as real (2, ...) arrays.

The reference leaves the posteriors unimplemented (stub raising
NotImplementedError, tramp/channels/activation/modulus_channel.py:29-37);
here they are implemented, which unlocks modulus factors mid-graph (e.g.
two-layer phase retrieval x -> W1 -> |.| -> W2 -> y).

Math. With incoming Gaussian beliefs exp(-az|z|^2/2 + bz.z) on z (complex,
2 real coords) and exp(-ax x^2/2 + bx x) on x = |z|, the tilted joint in
polar coordinates z = rho e^{i theta} integrates over the phase to

    p(rho) \propto rho exp(-(az+ax) rho^2/2 + bx rho) I0(|bz| rho)

(2 pi I0 from the angular integral). All posterior moments are 1D radial
integrals evaluated with a fixed composite Gauss-Legendre rule on the
+/- 12 sigma bracket of the integrand's peak — jit/vmap-safe (node
positions are an affine map of static nodes). The scaled Bessel i0e keeps
the weights bounded: log-integrand uses log i0e(b rho) + b rho.

Moments:
  E[z]    = (bz/|bz|) E[rho I1/I0(|bz| rho)]     (phase locked to bz)
  V[z]    = (E[rho^2] - E[rho I]^2) / 2           per real coordinate
  E[x]    = E[rho],  V[x] = E[rho^2] - E[rho]^2
  log Z   = log 2pi + log \int rho e^{g(rho)} drho

SE measure: the Bayes-optimal (bz, bx) ensemble factorizes through the
likelihood's (b=|bz|, y=rho*) measure (same derivation as reference
tramp/likelihoods/modulus_likelihood.py:101-120) with bx | y ~ N(ax y, ax).
"""
import jax.numpy as jnp

from .base_channel import Channel
from ..utils.integration import composite_gauss_legendre
from ..likelihoods.modulus_likelihood import (
    i0e, ive_ratio, pair_abs, pair_normalize)

#: radial quadrature: panels x order nodes over the peak bracket
_R_PANELS = 8
_R_ORDER = 16
#: half-width of the radial bracket in posterior standard deviations
_R_RANGE = 12.0
#: lighter node counts for the (already 3D) SE ensemble measure
_SE_R_PANELS = 4
_SE_R_ORDER = 8
_SE_GRID = dict(n_panels=8, order=8)


def _radial_moments(az, bz, ax, bx, panels=_R_PANELS, order=_R_ORDER):
    r"""Radial posterior moments of p(rho) ~ rho e^{-a rho^2/2 + bx rho}
    I0(b rho) on rho > 0.

    Returns (m1, m2, mI, logZ) elementwise over the trailing shape of bx:
    E[rho], E[rho^2], E[rho I1/I0(b rho)], and the log-partition
    log \int_0^inf 2 pi rho e^{...} I0(b rho) drho.
    """
    a = jnp.maximum(az + ax, 1e-11)
    b = pair_abs(bz)
    sigma = 1.0 / jnp.sqrt(a)

    # peak bracket: g'(rho) = -a rho + c_eff + 1/rho with the Bessel slope
    # c_eff = bx + b * (I1/I0)(b rho) in [bx, bx + b]; bracket the roots for
    # both extremes and pad by _R_RANGE sigmas
    def peak(c):
        return (c + jnp.sqrt(c**2 + 4.0 * a)) / (2.0 * a)

    lo = jnp.maximum(0.0, peak(bx) - _R_RANGE * sigma)
    hi = peak(bx + b) + _R_RANGE * sigma

    xs, ws = composite_gauss_legendre(0.0, 1.0, panels, order)
    shape = (xs.size,) + (1,) * jnp.ndim(b)
    xs = xs.reshape(shape)
    ws = ws.reshape(shape)
    rho = lo + (hi - lo) * xs          # (K,) + shape of b, all rho > 0
    w = (hi - lo) * ws

    g = (-0.5 * a * rho**2 + (bx + b) * rho + jnp.log(i0e(b * rho))
         + jnp.log(rho) + jnp.log(w))
    g_max = jnp.max(g, axis=0)
    p = jnp.exp(g - g_max)
    Z = jnp.sum(p, axis=0)
    p = p / Z
    m1 = jnp.sum(p * rho, axis=0)
    m2 = jnp.sum(p * rho**2, axis=0)
    mI = jnp.sum(p * rho * ive_ratio(b * rho), axis=0)
    logZ = jnp.log(2 * jnp.pi) + g_max + jnp.log(Z)
    return m1, m2, mI, logZ


class ModulusChannel(Channel):

    _data_fields = ()
    _meta_fields = ("isotropic",)

    def __init__(self, isotropic=True):
        self.isotropic = isotropic

    def sample(self, key, Z):
        return pair_abs(Z)

    def math(self):
        return r"$|\cdot|$"

    def second_moment(self, tau_z):
        return 2 * tau_z

    # -- posteriors --------------------------------------------------------
    def scalar_backward_mean(self, az, bz, ax, bx):
        _, _, mI, _ = _radial_moments(az, bz, ax, bx)
        return pair_normalize(bz) * mI

    def scalar_backward_variance(self, az, bz, ax, bx):
        _, m2, mI, _ = _radial_moments(az, bz, ax, bx)
        return 0.5 * (m2 - mI**2)

    def scalar_forward_mean(self, az, bz, ax, bx):
        m1, _, _, _ = _radial_moments(az, bz, ax, bx)
        return m1

    def scalar_forward_variance(self, az, bz, ax, bx):
        m1, m2, _, _ = _radial_moments(az, bz, ax, bx)
        return m2 - m1**2

    def compute_backward_posterior(self, az, bz, ax, bx):
        _, m2, mI, _ = _radial_moments(az, bz, ax, bx)
        rz = pair_normalize(bz) * mI
        vz = 0.5 * (m2 - mI**2)
        if self.isotropic:
            vz = jnp.mean(vz)
        return rz, vz

    def compute_forward_posterior(self, az, bz, ax, bx):
        m1, m2, _, _ = _radial_moments(az, bz, ax, bx)
        vx = m2 - m1**2
        if self.isotropic:
            vx = jnp.mean(vx)
        return m1, vx

    def compute_log_partition(self, az, bz, ax, bx):
        """Extensive log-partition, summed over complex elements (each
        element's radial integral is the joint over its 2 real coords,
        matching the ComplexLinearChannel convention)."""
        _, _, _, logZ = _radial_moments(az, bz, ax, bx)
        return jnp.sum(logZ)

    def scalar_log_partition(self, az, bz, ax, bx):
        _, _, _, logZ = _radial_moments(az, bz, ax, bx)
        return logZ

    # -- SE measure ---------------------------------------------------------
    # SE errors go through a lighter radial rule: the ensemble measure is
    # already 3D (xi_b, xi_y, xi_bx), so the inner radial integral uses
    # _SE_R_* nodes to bound the quadrature tensor
    def compute_forward_error(self, az, ax, tau_z):
        def variance(bz, bx):
            m1, m2, _, _ = _radial_moments(
                az, bz, ax, bx, _SE_R_PANELS, _SE_R_ORDER)
            return m2 - m1**2
        return self.beliefs_measure(az, ax, tau_z, f=variance)

    def compute_backward_error(self, az, ax, tau_z):
        def variance(bz, bx):
            _, m2, mI, _ = _radial_moments(
                az, bz, ax, bx, _SE_R_PANELS, _SE_R_ORDER)
            return 0.5 * (m2 - mI**2)
        return self.beliefs_measure(az, ax, tau_z, f=variance)

    def compute_free_energy(self, az, ax, tau_z):
        def log_partition(bz, bx):
            _, _, _, logZ = _radial_moments(
                az, bz, ax, bx, _SE_R_PANELS, _SE_R_ORDER)
            return logZ
        return self.beliefs_measure(az, ax, tau_z, f=log_partition)

    def compute_mutual_information(self, az, ax, tau_z):
        """The generic Channel formula assumes one real coordinate per
        element; the modulus input z has TWO (complex), so the az tau_z
        energy and the Gaussian entropy terms double (validated: I = 0 at
        the zero-information point az tau_z = 1, ax = 0)."""
        tau_x = self.second_moment(tau_z)
        A = self.compute_free_energy(az, ax, tau_z)
        return (0.5 * (2 * az * tau_z + ax * tau_x) - A
                + jnp.log(2 * jnp.pi * tau_z / jnp.e))

    def beliefs_measure(self, az, ax, tau_z, f):
        """BO ensemble average of f(bz, bx). Same (b=|bz|, y=rho*) measure
        as ModulusLikelihood.beliefs_measure (reference
        modulus_likelihood.py:101-120) with bx | y ~ N(ax y, ax) on a third
        quadrature axis; the y integral is done in y-space over [0, inf)
        (truncated-normal nodes) instead of the reference's xi_y
        substitution, removing the relu(y) kink from the quadrature — the
        relu(b) kink is removed by restricting the (static) xi_b nodes to
        the positive half-line.
        """
        from ..utils.integration import (
            std_normal_nodes, composite_gauss_legendre)

        u_eff = jnp.maximum(0.0, az * tau_z - 1.0)
        pos = u_eff > 0
        u_safe = jnp.where(pos, u_eff, 1.0)
        sz_eff = jnp.sqrt(az * u_safe)

        xbx, wbx = std_normal_nodes(**_SE_GRID)
        xbx = jnp.asarray(xbx)
        wbx = jnp.asarray(wbx)

        def with_bx(bz, y):
            "E_{bx ~ N(ax y, ax)} f(bz, bx) on a trailing node axis."
            bx = ax * y[..., None] + jnp.sqrt(ax) * xbx
            return jnp.sum(wbx * f(bz[..., None], bx), axis=-1)

        def y_measure(m, s, g):
            """sum of N(y | m, s^2) g(y) over y > 0 on a trailing node
            axis; composite GL in y-space with the density in the weights."""
            u, w = composite_gauss_legendre(0.0, 1.0, 8, 8)
            u = jnp.asarray(u)
            w = jnp.asarray(w)
            lo = jnp.maximum(0.0, m - 10.0 * s)
            hi = jnp.maximum(m + 10.0 * s, lo + 10.0 * s)
            y = lo[..., None] + (hi - lo)[..., None] * u
            dens = jnp.exp(-0.5 * ((y - m[..., None]) / s) ** 2) / (
                jnp.sqrt(2 * jnp.pi) * s)
            wy = (hi - lo)[..., None] * w * dens
            return jnp.sum(wy * g(y), axis=-1)

        # typical case u_eff > 0: static positive-half xi_b nodes
        xb, wb = std_normal_nodes(n_panels=8, order=12)
        keep = xb > 0
        xb = jnp.asarray(xb[keep])
        wb = jnp.asarray(wb[keep])
        b = sz_eff * xb
        bz_b = jnp.stack([b, jnp.zeros_like(b)], axis=0)
        coef = 2 * jnp.pi / jnp.sqrt(u_safe)

        def g_typical(y):
            # y: (Kb, Ky); broadcast bz to match
            return (coef * b[:, None] * y * i0e(b[:, None] * y)
                    * with_bx(jnp.broadcast_to(bz_b[..., None], bz_b.shape
                                               + (y.shape[-1],)), y))

        inner = y_measure(b / az, 1.0 / jnp.sqrt(az), g_typical)
        I_typical = jnp.sum(wb * inner, axis=-1)

        # special case az*tau_z <= 1 (b pinned at 0, 1D measure over y > 0)
        def g_zero(y):
            bz = jnp.stack([jnp.zeros_like(y), jnp.zeros_like(y)], axis=0)
            return jnp.sqrt(2 * jnp.pi * az) * y * with_bx(bz, y)

        I_zero = y_measure(jnp.zeros(()), 1.0 / jnp.sqrt(az), g_zero)
        return jnp.where(pos, I_typical, I_zero)
