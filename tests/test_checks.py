"""Checks-package self-tests (the reference's correctness methodology,
tramp/checks/, as a library surface)."""
import numpy as np

from tramp_tpu import beliefs
from tramp_tpu.priors import GaussBernoulliPrior, BinaryPrior
from tramp_tpu.likelihoods import SgnLikelihood
from tramp_tpu.checks import (
    check_belief_grad_b, check_prior_grad_EP, check_prior_grad_RS,
    check_likelihood_grad_EP, check_prior_BO_limit, check_prior_concentration,
)


def test_check_belief_grad_b():
    df = check_belief_grad_b(beliefs.sparse, a=1.3, eta=0.4)
    assert np.allclose(df["r"], df["A1"], rtol=1e-8, atol=1e-10)
    assert np.allclose(df["v"], df["A2"], rtol=1e-6, atol=1e-9)


def test_check_prior_grad_EP():
    prior = GaussBernoulliPrior(size=1, rho=0.4)
    df = check_prior_grad_EP(prior)
    assert df["r_err"].max() < 1e-8
    assert df["v_err"].max() < 1e-7


def test_check_prior_grad_RS():
    prior = BinaryPrior(size=1, p_pos=0.6)
    df = check_prior_grad_RS(prior, prior)
    assert df["m_err"].iloc[0] < 1e-6
    assert df["q_err"].iloc[0] < 1e-5


def test_check_prior_BO_limit():
    prior = GaussBernoulliPrior(size=1, rho=0.3)
    df = check_prior_BO_limit(prior)
    assert df["err"].max() < 1e-7


def test_check_likelihood_grad_EP():
    lk = SgnLikelihood(y=None)
    df = check_likelihood_grad_EP(lk, y=1.0)
    assert df["r_err"].max() < 1e-7
    assert df["v_err"].max() < 1e-6


def test_check_prior_concentration():
    df = check_prior_concentration(
        lambda N: GaussBernoulliPrior(size=N, rho=0.5),
        N_values=(100, 10000))
    assert df["err"].iloc[-1] < df["err"].iloc[0] + 1e-3
    assert df["err"].iloc[-1] < 0.01


def test_check_prior_grad_BO_gradient_identity():
    from tramp_tpu.checks import check_prior_grad_BO
    from tramp_tpu.priors import GaussBernoulliPrior
    df = check_prior_grad_BO(GaussBernoulliPrior(size=1, rho=0.4))
    assert df["m_err"].max() < 1e-6


def test_check_prior_grad_BO_BN():
    from tramp_tpu.checks import check_prior_grad_BO_BN
    from tramp_tpu.priors import BinaryPrior
    df = check_prior_grad_BO_BN(BinaryPrior(size=1, p_pos=0.6))
    assert df["m_err"].max() < 1e-6
    assert df["v_err"].max() < 1e-6


def test_check_prior_grad_FG():
    from tramp_tpu.checks import check_prior_grad_FG
    from tramp_tpu.priors import GaussBernoulliPrior
    df = check_prior_grad_FG(GaussBernoulliPrior(size=1, rho=0.3))
    assert df["t_err"].max() < 1e-6


def test_check_likelihood_grad_BO_and_BN():
    import jax.numpy as jnp
    from tramp_tpu.checks import (
        check_likelihood_grad_BO, check_likelihood_grad_BO_BN)
    from tramp_tpu.likelihoods import SgnLikelihood
    lik = SgnLikelihood(y=jnp.asarray([1.0]))
    df = check_likelihood_grad_BO(lik)
    assert df["m_err"].max() < 1e-5
    df2 = check_likelihood_grad_BO_BN(lik)
    assert df2["m_err"].max() < 1e-5


def test_check_likelihood_grad_RS():
    import jax.numpy as jnp
    from tramp_tpu.checks import check_likelihood_grad_RS
    from tramp_tpu.likelihoods import SgnLikelihood
    lik = SgnLikelihood(y=jnp.asarray([1.0]))
    df = check_likelihood_grad_RS(lik, lik)
    assert df["m_err"].max() < 1e-5
    assert df["q_err"].max() < 1e-5


def test_check_bn_limits():
    import jax.numpy as jnp
    from tramp_tpu.checks import check_prior_BN_limit, check_likelihood_BN_limit
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.likelihoods import SgnLikelihood
    df = check_prior_BN_limit(GaussBernoulliPrior(size=1, rho=0.4))
    assert df["v_err"].max() < 1e-4
    df2 = check_likelihood_BN_limit(SgnLikelihood(y=jnp.asarray([1.0])))
    assert df2["v_err"].max() < 1e-4


def test_check_high_dim_concentration_bo_bn():
    from tramp_tpu.checks import check_prior_BO_BN_high_dim
    from tramp_tpu.priors import GaussBernoulliPrior
    prior = GaussBernoulliPrior(size=3000, rho=0.5)
    df = check_prior_BO_BN_high_dim(prior, n_samples=2,
                                    ax_values=[1.0, 2.0])
    # instance averages concentrate on the ensemble values at N=3000
    assert np.max(np.abs(df["vx"] - df["vx_avg"])) < 5e-2
    assert np.max(np.abs(df["mx"] - df["mx_avg"])) < 5e-2


def test_reference_api_symbol_coverage():
    """Every public class and function of every reference module has an
    equivalent here (full API-surface parity)."""
    from reference_oracle import reference_available, load_reference
    if not reference_available():
        pytest.skip("reference checkout not available")
    load_reference()
    import importlib
    import tramp
    import tramp_tpu
    for name in ["algos", "models", "experiments", "priors", "channels",
                 "likelihoods", "ensembles", "variables", "checks"]:
        rmod = importlib.import_module(f"tramp.{name}")
        mmod = importlib.import_module(f"tramp_tpu.{name}")
        missing = [
            s for s in dir(rmod)
            if not s.startswith("_") and callable(getattr(rmod, s, None))
            and getattr(getattr(rmod, s), "__module__", "").startswith("tramp")
            and not hasattr(mmod, s)
        ]
        assert not missing, f"tramp_tpu.{name} missing: {missing}"
