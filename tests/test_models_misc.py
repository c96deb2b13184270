"""Committee models, explain engines, trackers, latex display.

Includes a twin parity test against the actual reference for the soft
committee (covers SumChannel / multi-input variables end-to-end).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tramp_tpu.models import committee, sgn_committee, soft_committee
from tramp_tpu.algos import (
    ExpectationPropagation, StateEvolution, TrackEvolution, TrackErrors,
    JoinCallback, ExplainMessagePassing, ExplainStateEvolution,
    DisplayLatexMessagePassing,
)
from tramp_tpu.experiments import TeacherStudentScenario

from reference_oracle import reference_available, load_reference


def test_soft_committee_ep_runs():
    model = soft_committee(
        K=2, N=40, alpha=1.5, ensemble_type="gaussian",
        prior_mean=[0.1, -0.2], prior_var=[1.0, 1.0], noise_var=1e-2,
        key=jax.random.PRNGKey(0))
    scenario = TeacherStudentScenario(model, model, x_ids=["x_0", "x_1"])
    scenario.setup(seed=0)
    ep = ExpectationPropagation(scenario.student)
    ep.iterate(max_iter=100, damping=0.3)
    for x_id in ("x_0", "x_1"):
        d = ep.get_variable_data(x_id)
        assert np.all(np.isfinite(np.asarray(d["r"])))
        assert 0 < float(np.mean(np.asarray(d["v"]))) < 1.5


def test_sgn_committee_builds_and_samples():
    model = sgn_committee(
        K=3, N=30, alpha=1.0, ensemble_type="gaussian", p_pos=0.6,
        noise_var=1e-2, key=jax.random.PRNGKey(1))
    sample = model.sample(jax.random.PRNGKey(2))
    assert sample["y"].shape == (30,)
    assert set(sample) >= {"x_0", "x_1", "x_2", "y"}


@pytest.mark.skipif(not reference_available(),
                    reason="reference checkout not available")
def test_committee_parity_vs_reference():
    """Soft committee EP fixed point vs reference on identical (F, y)."""
    load_reference()
    import tramp.channels as rc
    import tramp.priors as rp
    import tramp.likelihoods as rl
    from tramp.channels import SumChannel as RefSum
    from tramp.variables import SISOVariable as RV, SILeafVariable as RO
    from tramp.algos import ExpectationPropagation as RefEP

    import tramp_tpu as tt
    from tramp_tpu.channels import (
        LinearChannel, SumChannel, AbsChannel, GaussianChannel)
    from tramp_tpu.priors import GaussianPrior
    from tramp_tpu.likelihoods import GaussianLikelihood

    rng = np.random.RandomState(5)
    K, N, M = 2, 30, 45
    F = rng.randn(M, N) / np.sqrt(N)
    xs = [rng.randn(N) for _ in range(K)]
    noise_var = 1e-2
    y = sum(np.abs(F @ x) for x in xs) + np.sqrt(noise_var) * rng.randn(M)

    def build(linear_cls, prior_cls, abs_cls, sum_cls, gauss_cls, lik_cls,
              v_cls, o_cls, Fm, ym):
        experts = None
        for k in range(K):
            e = (prior_cls(size=N) @ v_cls(id=f"x_{k}") @
                 linear_cls(Fm, name="F") @ v_cls(id=f"z_{k}") @
                 abs_cls() @ v_cls(id=f"a_{k}"))
            experts = e if experts is None else experts + e
        dag = (experts @ sum_cls(n_prev=K) @ v_cls(id="a") @
               lik_cls(y=ym, var=noise_var))
        return dag.to_model()

    ref_model = build(rc.LinearChannel, rp.GaussianPrior, rc.AbsChannel,
                      RefSum, rc.GaussianChannel, rl.GaussianLikelihood,
                      RV, RO, F, y)
    my_model = build(LinearChannel, GaussianPrior, AbsChannel, SumChannel,
                     GaussianChannel, GaussianLikelihood,
                     tt.V, tt.O, jnp.asarray(F), jnp.asarray(y))

    n_iter = 50
    ref_ep = RefEP(ref_model)
    ref_ep.iterate(max_iter=n_iter, damping=0.3, callback=lambda *a: False)
    my_ep = ExpectationPropagation(my_model)
    my_ep.iterate(max_iter=n_iter, damping=0.3, tol=0.0,
                  check_nan=False)

    for k in range(K):
        ref_d = ref_ep.get_variable_data(f"x_{k}")
        my_d = my_ep.get_variable_data(f"x_{k}")
        np.testing.assert_allclose(
            np.asarray(my_d["r"]), ref_d["r"], rtol=1e-4, atol=1e-6,
            err_msg=f"x_{k} r")
        np.testing.assert_allclose(
            np.asarray(my_d["v"]), ref_d["v"], rtol=1e-4, atol=1e-6,
            err_msg=f"x_{k} v")


def _small_glm():
    from tramp_tpu import glm_generative
    from tramp_tpu.experiments import BayesOptimalScenario
    model = glm_generative(
        N=30, alpha=0.8, ensemble_type="gaussian",
        prior_type="gauss_bernoulli", output_type="gaussian",
        prior_rho=0.5, output_var=1e-2, key=jax.random.PRNGKey(0))
    sc = BayesOptimalScenario(model, x_ids=["x"])
    sc.setup(seed=0)
    return sc


def test_trackers_produce_dataframes():
    sc = _small_glm()
    ep = ExpectationPropagation(sc.student)
    evo = TrackEvolution()
    errs = TrackErrors(true_values=sc.x_true)
    ep.iterate(max_iter=5, damping=0.1, callback=JoinCallback([evo, errs]))
    df_e = evo.get_dataframe()
    df_r = errs.get_dataframe()
    assert len(df_e) > 0 and "v" in df_e.columns
    assert len(df_r) > 0 and "mse" in df_r.columns


def test_explain_engines_smoke(capsys):
    sc = _small_glm()
    exp = ExplainMessagePassing(sc.student)
    exp.iterate(max_iter=1)
    out = capsys.readouterr().out
    assert "x" in out

    se = ExplainStateEvolution(sc.student)
    se.iterate(max_iter=1)
    assert len(capsys.readouterr().out) > 0


def test_display_latex_smoke(capsys):
    sc = _small_glm()
    disp = DisplayLatexMessagePassing(sc.student)
    disp.iterate(max_iter=1)
    out = capsys.readouterr().out
    assert "\\" in out or "$" in out


def test_multi_layer_model():
    """MultiLayerModel: prior -> channels -> observed chain with default ids
    x, t_1, ..., y (reference multi_layer_model.py:21-49)."""
    from tramp_tpu.models import MultiLayerModel
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.channels import GaussianChannel, AbsChannel

    model = MultiLayerModel(
        [GaussBernoulliPrior(size=50, rho=0.5), AbsChannel(),
         GaussianChannel(var=1e-2)])
    assert model.ids == ["x", "t_1", "y"]
    sample = model.sample(jax.random.PRNGKey(0))
    assert set(sample) == {"x", "t_1", "y"}

    student = model.to_observed({"y": sample["y"]})
    ep = ExpectationPropagation(student)
    ep.iterate(max_iter=100, damping=0.3)
    # x's sign is elementwise unidentifiable under y = |x| + noise; the
    # magnitude variable t_1 = |x| must be recovered to the noise floor
    r_t = np.asarray(ep.get_variable_data("t_1")["r"])
    mse_t = float(np.mean((r_t - np.asarray(sample["t_1"])) ** 2))
    assert mse_t < 5e-2, mse_t


def test_model_plot_smoke():
    import matplotlib
    matplotlib.use("Agg")
    from tramp_tpu import glm_generative
    model = glm_generative(
        N=20, alpha=0.5, ensemble_type="gaussian",
        prior_type="gauss_bernoulli", output_type="gaussian",
        prior_rho=0.5, output_var=1e-2, key=jax.random.PRNGKey(0))
    model.plot()


def test_qplot_smoke():
    import matplotlib
    matplotlib.use("Agg")
    import pandas as pd
    from tramp_tpu.experiments import qplot
    df = pd.DataFrame([
        dict(alpha=a, v=1.0 / (1 + a), source=s)
        for a in (0.1, 0.2, 0.5, 1.0) for s in ("SE", "EP")
    ])
    qplot(df, x="alpha", y="v", color="source")
