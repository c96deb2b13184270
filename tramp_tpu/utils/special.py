"""Special functions needed by the belief kernels, implemented branchless
for XLA/TPU (every regime is computed on sanitized inputs and selected with
``jnp.where`` so the kernels are jit-, vmap- and grad-safe).

Provides the scaled complementary error function ``erfcx`` (absent from
jax.scipy) plus the log-Gaussian-cdf helpers that the reference keeps in
tramp/utils/misc.py:55-83.
"""
import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

SQRT2 = 1.4142135623730951
SQRT_PI = 1.7724538509055159
SQRT_2PI = 2.5066282746310002

# |x| below which exp(x^2)*erfc(x) is computed directly without overflow
# (float64 overflows at x ~ 26.6; erfc underflows around 27).
_ERFCX_DIRECT_MAX = 25.0


@jax.custom_jvp
def erfcx(x):
    """Scaled complementary error function exp(x**2) * erfc(x).

    Matches scipy.special.erfcx on the real line, including the reference's
    overflow-to-inf behavior for large negative arguments
    (tramp/utils/truncated_normal.py uses erfcx throughout F0/F1/F2).
    """
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    # direct product, safe for |x| <= 25
    axc = jnp.minimum(ax, _ERFCX_DIRECT_MAX)
    direct = jnp.exp(axc * axc) * jsp.erfc(axc)
    # asymptotic series for |x| > 25:
    # erfcx(x) ~ (1/(x sqrt(pi))) * sum_n (-1)^n (2n-1)!! / (2x^2)^n
    axa = jnp.maximum(ax, _ERFCX_DIRECT_MAX)
    z = 1.0 / (2.0 * axa * axa)
    poly = 1.0 + z * (-1.0 + z * (3.0 + z * (-15.0 + z * (105.0 + z * -945.0))))
    asym = poly / (axa * SQRT_PI)
    pos = jnp.where(ax <= _ERFCX_DIRECT_MAX, direct, asym)
    # negative arguments: erfcx(x) = 2 exp(x^2) - erfcx(-x); overflows to +inf
    # for x << 0 exactly as scipy does.
    neg = 2.0 * jnp.exp(jnp.square(x)) - pos
    return jnp.where(x >= 0, pos, neg)


@erfcx.defjvp
def _erfcx_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = erfcx(x)
    # d/dx erfcx(x) = 2 x erfcx(x) - 2/sqrt(pi)
    return y, (2.0 * x * y - 2.0 / SQRT_PI) * dx


def norm_cdf(x):
    "Standard normal cdf Phi(x). Reference tramp/utils/misc.py:55-57."
    return jsp.ndtr(x)


def norm_pdf(x):
    "Standard normal pdf N(x). Reference tramp/utils/misc.py:60-62."
    return jnp.exp(-0.5 * jnp.square(x)) / SQRT_2PI


def log_Phi(x):
    "log Phi(x), stable for large |x|. Reference truncated_normal.py:22-30."
    return jsp.log_ndtr(x)


def log_norm_cdf_prime(x):
    "(log Phi)'(x) = N(x)/Phi(x). Reference tramp/utils/misc.py:65-70."
    return 1.0 / (SQRT_2PI * 0.5 * erfcx(-x / SQRT2))


def phi_0(x):
    "phi(x) = x^2/2 + log Phi(x). Reference tramp/utils/misc.py:74-76."
    return jnp.log(0.5 * erfcx(-x / SQRT2))


def phi_1(x):
    "phi'(x) = x + N/Phi. Reference tramp/utils/misc.py:79-81."
    return x + log_norm_cdf_prime(x)


def phi_2(x):
    "phi''(x) = 1 - N/Phi * (x + N/Phi). Reference tramp/utils/misc.py:84-86."
    y = log_norm_cdf_prime(x)
    return 1.0 - y * (x + y)
