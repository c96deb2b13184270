"""Positive (half-line truncated normal) belief. Reference tramp/beliefs/positive.py.

Exponential limit: for b < 0 and u = a/b^2 -> 0 the tilted density
e^{b x - a x^2/2} on x > 0 degenerates to Exp(-b); the truncated-normal
formulas lose the variance to cancellation there (v ~ u/b^2 vs v0 = 1/a,
a relative signal of u^2). A branchless second-order expansion in u takes
over below u < 1e-4 (relative error O(u^2) <= 1e-8):

  Z    = (1/l) (1 - u + 3 u^2),        l = -b
  E[x] = (1/l) (1 - 2u + 10 u^2) + O(u^3)
  V[x] = (1/l^2) (1 - 6u + 50 u^2) + O(u^3)

This regime is unreachable in the reference (its exponential-prior SE is
NotImplemented and EP clips precisions to AMIN before they get here).
"""
import jax.numpy as jnp

from ..utils.truncated_normal import (
    truncated_normal_mean, truncated_normal_var, truncated_normal_logZ,
    truncated_normal_proba,
)

INF = jnp.inf

#: switch to the exponential-limit expansion below this u = a/b^2
#: (expansion error O(u^3) ~ 1e-9 at the switch; the truncated-normal route
#: loses ~eps/u of the variance to cancellation as u -> 0)
_U_EXP = 1e-3


def _exp_limit(a, b):
    """Returns (use_limit, u, lam) with inputs sanitized on the unselected
    branch (double-where) so reverse-mode second derivatives stay finite."""
    use = (b < 0) & (a >= 0) & (a < _U_EXP * b**2)
    b_safe = jnp.where(use, b, -1.0)
    lam = -b_safe
    u = jnp.where(use, a, 0.0) / lam**2
    return use, u, lam


def A(a, b):
    use, u, lam = _exp_limit(a, b)
    a_safe = jnp.where(use, 1.0, a)
    A_tn = truncated_normal_logZ(b / a_safe, 1.0 / a_safe, 0.0, INF)
    A_exp = -jnp.log(lam) + jnp.log1p(-u + 3.0 * u**2)
    return jnp.where(use, A_exp, A_tn)


def r(a, b):
    use, u, lam = _exp_limit(a, b)
    a_safe = jnp.where(use, 1.0, a)
    r_tn = truncated_normal_mean(b / a_safe, 1.0 / a_safe, 0.0, INF)
    r_exp = (1.0 - 2.0 * u + 10.0 * u**2) / lam
    return jnp.where(use, r_exp, r_tn)


def v(a, b):
    use, u, lam = _exp_limit(a, b)
    a_safe = jnp.where(use, 1.0, a)
    v_tn = truncated_normal_var(b / a_safe, 1.0 / a_safe, 0.0, INF)
    v_exp = (1.0 - 6.0 * u + 50.0 * u**2) / lam**2
    return jnp.where(use, v_exp, v_tn)


def tau(a, b):
    return r(a, b) ** 2 + v(a, b)


def p(a, b):
    "Probability that x ~ N(b/a, 1/a) falls within R_+."
    return truncated_normal_proba(b / a, 1.0 / a, 0.0, INF)
