"""Prior property tests, mirroring reference tramp/tests/test_priors.py:
- moments are exact gradients of the scalar log partition (via jax.grad),
- vectorized posteriors match the scalar kernels elementwise,
- second_moment matches Monte-Carlo sampling.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tramp_tpu.priors import (
    GaussianPrior, GaussBernoulliPrior, BinaryPrior, GaussianMixturePrior,
    ExponentialPrior, PositivePrior, MAP_L1NormPrior,
)

PRIORS = [
    GaussianPrior(size=10, mean=0.3, var=1.7),
    GaussBernoulliPrior(size=10, rho=0.4, mean=-0.2, var=0.8),
    BinaryPrior(size=10, p_pos=0.6),
    GaussianMixturePrior(size=10, probs=(0.3, 0.7), means=(-1.0, 0.5),
                         vars=(0.5, 1.5)),
    ExponentialPrior(size=10, mean=1.3),
    PositivePrior(size=10),
]

POINTS = [(1.0, 0.5), (2.3, -1.1), (0.6, 2.0)]


@pytest.mark.parametrize("prior", PRIORS, ids=lambda p: type(p).__name__)
@pytest.mark.parametrize("ax,bx", POINTS)
def test_scalar_moments_are_gradients(prior, ax, bx):
    def A(b):
        out = prior.scalar_log_partition(ax, b)
        return jnp.sum(out)  # mixture kernels return scalars already

    r = prior.scalar_forward_mean(ax, bx)
    v = prior.scalar_forward_variance(ax, bx)
    dA = jax.grad(A)(bx)
    d2A = jax.grad(lambda b: jax.grad(A)(b))(bx)
    np.testing.assert_allclose(np.sum(r), dA, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.sum(v), d2A, rtol=1e-6, atol=1e-10)


@pytest.mark.parametrize("prior", PRIORS, ids=lambda p: type(p).__name__)
def test_vectorized_matches_scalar(prior):
    rng = np.random.RandomState(3)
    ax = 1.3
    bx = jnp.asarray(rng.randn(10))
    r, v = prior.compute_forward_posterior(ax, bx)
    r_scalar = np.array([
        float(np.sum(prior.scalar_forward_mean(ax, float(b)))) for b in bx])
    np.testing.assert_allclose(np.asarray(r).ravel().sum() if r.ndim > 1
                               else np.asarray(r),
                               r_scalar.sum() if r.ndim > 1 else r_scalar,
                               rtol=1e-10)


@pytest.mark.parametrize("prior", PRIORS[:4], ids=lambda p: type(p).__name__)
def test_second_moment_mc(prior):
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    big = type(prior).__new__(type(prior))
    big.__dict__.update(prior.__dict__)
    big.size = 5000
    xs = jnp.stack([big.sample(k) for k in keys[:20]])
    mc = float(jnp.mean(xs**2))
    np.testing.assert_allclose(float(prior.second_moment()), mc, rtol=5e-2)


def test_map_l1_prox():
    prior = MAP_L1NormPrior(size=10, gamma=1.5)
    bx = jnp.asarray([-3.0, -1.0, 0.5, 2.0, 4.0])
    ax = 2.0
    r, v = prior.compute_forward_posterior(ax, bx)
    want_r = np.where(np.abs(bx) > 1.5,
                      (np.abs(bx) - 1.5) * np.sign(bx) / ax, 0.0)
    np.testing.assert_allclose(np.asarray(r), want_r, rtol=1e-12)


def test_gauss_bernoulli_forward_error_vs_reference_formula():
    "SE forward error: compare quadrature vs brute-force numpy integration."
    from scipy.integrate import quad
    from scipy.special import expit
    prior = GaussBernoulliPrior(size=10, rho=0.3, mean=0.0, var=1.0)
    ax = 1.7
    got = float(prior.compute_forward_error(ax))

    # replicate reference beliefs_measure with scipy quad
    a0, b0, eta = 1.0, 0.0, float(prior.eta)

    def v_func(bx):
        a = ax + a0
        b = bx + b0
        An = 0.5 * (b**2 / a + np.log(2 * np.pi / a))
        s = expit(An - eta)
        return s / a + s * (1 - s) * (b / a) ** 2

    def gm(m, s_, f):
        return quad(lambda u: np.exp(-u**2 / 2) / np.sqrt(2 * np.pi)
                    * f(m + s_ * u), -10, 10)[0]

    want = (1 - 0.3) * gm(0.0, np.sqrt(ax), v_func) + 0.3 * gm(
        0.0, np.sqrt(ax + ax**2), v_func)
    np.testing.assert_allclose(got, want, rtol=1e-8)


# -- SE measures for Positive/Exponential priors (NotImplemented in the
# reference, positive_prior.py:60-76 / exponential_prior.py:60-76) --------

SE_PRIORS = [
    PositivePrior(size=10, isotropic=False),
    ExponentialPrior(size=10, mean=0.7, isotropic=False),
]


@pytest.mark.parametrize("prior", SE_PRIORS, ids=lambda p: type(p).__name__)
@pytest.mark.parametrize("ax", [0.5, 2.0, 20.0])
def test_positive_exponential_beliefs_measure_normalized(prior, ax):
    mu = float(prior.beliefs_measure(ax, lambda bx: 1.0))
    # the exponential measure truncates x at 10 like the reference
    # (exp(-10/0.7) ~ 6e-7 missing mass)
    np.testing.assert_allclose(mu, 1.0, atol=1e-6)


@pytest.mark.parametrize("prior,sampler", [
    (PositivePrior(size=10, isotropic=False),
     lambda rng, n: np.abs(rng.randn(n))),
    (ExponentialPrior(size=10, mean=0.7, isotropic=False),
     lambda rng, n: rng.exponential(scale=0.7, size=n)),
], ids=["PositivePrior", "ExponentialPrior"])
@pytest.mark.parametrize("ax", [0.5, 2.0, 20.0])
def test_positive_exponential_se_error_vs_monte_carlo(prior, sampler, ax):
    """Nishimori: SE forward error == BO-ensemble posterior variance ==
    ensemble MSE of the posterior mean."""
    rng = np.random.RandomState(0)
    n = 200_000
    xs = sampler(rng, n)
    bx = ax * xs + np.sqrt(ax) * rng.randn(n)
    r, v = prior.compute_forward_posterior(ax, jnp.asarray(bx))
    se = float(prior.compute_forward_error(ax))
    np.testing.assert_allclose(se, float(jnp.mean(v)), rtol=2e-2)
    np.testing.assert_allclose(
        se, float(np.mean((np.asarray(r) - xs) ** 2)), rtol=2e-2)


def test_positive_prior_rs_reduces_to_bo():
    "b_measure(ax, ax, 0) == beliefs_measure(ax); both normalized."
    prior = PositivePrior(size=10)
    np.testing.assert_allclose(
        float(prior.b_measure(2.0, 1.5, 0.5, lambda bx: 1.0)), 1.0,
        rtol=1e-10)
    f = lambda bx: bx**2  # noqa: E731
    np.testing.assert_allclose(
        float(prior.b_measure(3.0, 3.0, 0.0, f)),
        float(prior.beliefs_measure(3.0, f)), rtol=1e-12)


def test_positive_prior_bx_measure_moments():
    """bx_measure(f=1) = E[x*] of the tilted half-normal; with f=bx it
    gives E[x* bx] = mx_hat E[x*^2] (since E[xi]=0)."""
    prior = PositivePrior(size=10)
    mx_hat, qx_hat, tx0 = 1.7, 0.9, 0.5
    v0 = 1.0 / (1.0 + tx0)
    # half-normal with variance v0: E[x] = sqrt(2 v0 / pi), E[x^2] = v0
    Ex = np.sqrt(2 * v0 / np.pi)
    np.testing.assert_allclose(
        float(prior.bx_measure(mx_hat, qx_hat, tx0, lambda bx: 1.0)),
        Ex, rtol=1e-10)
    np.testing.assert_allclose(
        float(prior.bx_measure(mx_hat, qx_hat, tx0, lambda bx: bx)),
        mx_hat * v0, rtol=1e-10)


def test_positive_prior_se_glm_end_to_end():
    "StateEvolution on a positive-prior GLM now runs (reference cannot)."
    from tramp_tpu import glm_state_evolution, StateEvolution
    m = glm_state_evolution(alpha=2.0, prior_type="positive",
                            output_type="gaussian", output_var=1e-2)
    se = StateEvolution(m)
    se.iterate(max_iter=200)
    v = float(np.mean(np.asarray(se.get_variable_data("x")["v"])))
    assert 0 < v < 0.1, v
