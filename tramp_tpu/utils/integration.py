"""Fixed-node quadrature replacing the reference's adaptive scipy quad.

The reference computes SE ensemble averages with ``scipy.integrate.quad`` /
``dblquad`` over [-10, 10] (tramp/utils/integration.py:13-100). Adaptive
quadrature cannot be jitted or batched; we use

- Gauss-Hermite nodes for expectations against a Gaussian measure (exact for
  polynomial integrands, spectrally accurate for the smooth erfcx-based
  denoisers), and
- a probit-transformed Gauss-Legendre rule for expectations restricted to an
  interval (handles the discontinuous region indicators of the piecewise
  linear factors *exactly*, where naive fixed nodes would lose accuracy).

All functions accept vectorized integrands: ``f`` must map arrays to arrays
elementwise (every tramp_tpu kernel does). Nodes/weights are numpy constants
computed at trace time, so everything stays jit/vmap compatible.
"""
from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import ndtri

from .. import config
from .special import norm_cdf

#: integration range in standard deviations, matching the reference's
#: quad(integrand, -10, 10) (tramp/utils/integration.py:27).
QUAD_RANGE = 10.0


@lru_cache(maxsize=None)
def gauss_hermite(n=config.GH_NODES):
    """Nodes/weights (x, w) such that sum_i w_i f(x_i) = E[f(X)], X~N(0,1).
    Note: plain Gauss-Hermite converges slowly for saturating integrands
    (tanh/erf-like denoisers); prefer ``std_normal_nodes``."""
    x, w = np.polynomial.hermite_e.hermegauss(n)
    w = w / np.sqrt(2.0 * np.pi)
    return x, w


@lru_cache(maxsize=None)
def gauss_legendre(n=config.GL_NODES):
    "Nodes/weights on [0, 1]."
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w


@lru_cache(maxsize=None)
def composite_gauss_legendre(a, b, panels, order):
    "Composite Gauss-Legendre nodes/weights on [a, b]."
    u, w = np.polynomial.legendre.leggauss(order)
    edges = np.linspace(a, b, panels + 1)
    lo, hi = edges[:-1], edges[1:]
    h = 0.5 * (hi - lo)
    x = (lo[:, None] + h[:, None] * (u[None, :] + 1.0)).ravel()
    ww = (h[:, None] * w[None, :]).ravel()
    return x, ww


@lru_cache(maxsize=None)
def std_normal_nodes(n_panels=16, order=16, rng=QUAD_RANGE):
    """Nodes/weights for E[f(X)], X~N(0,1), over [-rng, rng]: composite
    Gauss-Legendre with the Gaussian density folded into the weights.
    Geometric convergence for the saturating (erf/tanh/expit-like)
    integrands of AMP state evolution, where Gauss-Hermite stalls."""
    x, w = composite_gauss_legendre(-rng, rng, n_panels, order)
    w = w * np.exp(-0.5 * x**2) / np.sqrt(2.0 * np.pi)
    return x, w


def gaussian_measure(m, s, f):
    """integral of N(x | m, s^2) f(x) over m +- 10 s.
    Reference integration.py:13-28."""
    x, w = std_normal_nodes()
    return jnp.sum(jnp.asarray(w) * f(m + s * jnp.asarray(x)), axis=-1)


def gaussian_measure_2d(m1, s1, m2, s2, f, n_panels=10, order=10):
    """integral of N(x1|m1,s1^2) N(x2|m2,s2^2) f(x1, x2).
    Reference integration.py:31-47."""
    x, w = std_normal_nodes(n_panels, order)
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    x1 = m1 + s1 * x[:, None]
    x2 = m2 + s2 * x[None, :]
    n = x.shape[0]
    vals = f(jnp.broadcast_to(x1, (n, n)), jnp.broadcast_to(x2, (n, n)))
    return jnp.sum(w[:, None] * w[None, :] * vals)


def gaussian_measure_2d_full(mean, cov, f, n_panels=10, order=10):
    """integral of N((x1,x2) | mean, cov) f(x1, x2), full 2x2 covariance.
    Reference integration.py:50-73 (Cholesky + independent standard normals).
    """
    cov = jnp.asarray(cov)
    mean = jnp.broadcast_to(jnp.asarray(mean, dtype=cov.dtype), (2,))
    L = jnp.linalg.cholesky(cov)
    x, w = std_normal_nodes(n_panels, order)
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    n = x.shape[0]
    u1 = x[:, None]
    u2 = x[None, :]
    y1 = jnp.broadcast_to(mean[0] + L[0, 0] * u1, (n, n))
    y2 = jnp.broadcast_to(mean[1] + L[1, 0] * u1 + L[1, 1] * u2, (n, n))
    vals = f(y1, y2)
    return jnp.sum(w[:, None] * w[None, :] * vals)


def truncated_gaussian_measure(m, s, zmin, zmax, f, n=config.GL_NODES):
    """integral of N(z | m, s^2) f(z) over the interval [zmin, zmax].

    Probit change of variables z = m + s * Phi^{-1}(Phi(a) + u (Phi(b)-Phi(a)))
    makes the integrand smooth in u (Gauss-Legendre converges spectrally) and
    represents the interval indicator exactly. zmin/zmax are static floats
    (possibly +-inf).
    """
    lo = 0.0 if zmin == -jnp.inf else norm_cdf((zmin - m) / s)
    hi = 1.0 if zmax == jnp.inf else norm_cdf((zmax - m) / s)
    mass = hi - lo
    u, w = composite_gauss_legendre(0.0, 1.0, 12, 12)
    u = jnp.asarray(u)
    w = jnp.asarray(w)
    # clip away from 0/1 to keep ndtri finite
    p = jnp.clip(lo + u * mass, 1e-300, 1.0 - 1e-16)
    z = m + s * ndtri(p)
    return mass * jnp.sum(w * f(z), axis=-1)


def gaussian_measure_boundary(m, s, points, f, order=16, panels=8):
    """integral of N(x | m, s^2) f(x) over m +- 10 s with explicit quadrature
    segments split at the (traced) breakpoints ``points``.

    For integrands with boundary layers (e.g. SE averages of truncated-normal
    variances at large precision az: structure of width ~sqrt(az) around
    b = az * z_boundary, a vanishing fraction of the measure's scale ~az),
    a fixed global rule loses the informative correction — the reference's
    adaptive scipy.quad resolves it (tramp/utils/integration.py:27).

    Implementation: composite Gauss-Legendre in x per segment with the
    Gaussian density folded into the weights (same construction as
    ``std_normal_nodes``, which is machine-exact for the smooth SE
    integrands) — segment edges are the breakpoints clipped into the
    +-10 sigma range and sorted, so overlapping or out-of-range breakpoints
    degrade gracefully to zero-width (zero-weight) segments. The domain
    matches the reference's quad(-10, 10) exactly.
    """
    points = jnp.asarray(points)
    z = jnp.clip((points - m) / s, -QUAD_RANGE, QUAD_RANGE)
    edges = jnp.sort(jnp.concatenate(
        [jnp.full((1,), -QUAD_RANGE), z, jnp.full((1,), QUAD_RANGE)]))
    return _xspace_segments(m, s, edges, f, order, panels)


def truncated_gaussian_measure_boundary(m, s, zmin, zmax, points, f,
                                        order=12, panels=12):
    """``truncated_gaussian_measure`` with extra (traced) segment breakpoints,
    clipped into [zmin, zmax] — boundary-layer analog for integrands
    restricted to a region (see gaussian_measure_boundary)."""
    lo = 0.0 if zmin == -jnp.inf else norm_cdf((zmin - m) / s)
    hi = 1.0 if zmax == jnp.inf else norm_cdf((zmax - m) / s)
    points = jnp.asarray(points)
    c = jnp.clip(norm_cdf((points - m) / s), lo, hi)
    c = jnp.sort(jnp.concatenate(
        [jnp.full((1,), lo), c, jnp.full((1,), hi)]))
    return _probit_segments(m, s, c, f, order, panels)


def _probit_segments(m, s, c, f, order, panels):
    "Sum of probit-GL integrals over CDF segments given by sorted edges c."
    u, w = composite_gauss_legendre(0.0, 1.0, panels, order)
    u = jnp.asarray(u)
    w = jnp.asarray(w)
    lo = c[:-1][:, None]                       # (n_seg, 1)
    mass = (c[1:] - c[:-1])[:, None]           # (n_seg, 1)
    p = jnp.clip(lo + u[None, :] * mass, 1e-300, 1.0 - 1e-16)
    x = m + s * ndtri(p)                       # (n_seg, n_nodes)
    vals = f(x)
    return jnp.sum(mass * w[None, :] * vals, axis=(-1, -2))


def _xspace_segments(m, s, z_edges, f, order, panels):
    """Sum of composite-GL integrals of N(x|m,s^2) f(x) over segments of
    standard-unit edges ``z_edges`` (sorted, traced), Gaussian density folded
    into the weights."""
    u, w = composite_gauss_legendre(0.0, 1.0, panels, order)
    u = jnp.asarray(u)
    w = jnp.asarray(w)
    lo = z_edges[:-1][:, None]                 # (n_seg, 1)
    h = (z_edges[1:] - z_edges[:-1])[:, None]  # (n_seg, 1)
    z = lo + u[None, :] * h                    # (n_seg, n_nodes)
    ww = h * w[None, :] * jnp.exp(-0.5 * z**2) / jnp.sqrt(2.0 * jnp.pi)
    vals = f(m + s * z)
    return jnp.sum(ww * vals, axis=(-1, -2))


def exponential_measure(m, f, n=config.GL_NODES):
    """integral of (1/m) exp(-x/m) f(x) over [0, 10] (reference truncates at
    10, integration.py:103-118). Uses Gauss-Legendre on [0, 10]."""
    u, w = gauss_legendre(n)
    x = 10.0 * jnp.asarray(u)
    w = 10.0 * jnp.asarray(w)
    return jnp.sum(w * (1.0 / m) * jnp.exp(-x / m) * f(x), axis=-1)
