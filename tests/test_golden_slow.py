"""Full critical-line golden families (round-3 VERDICT item 7): every
number previously labelled "verified offline" is reproducible in-suite.

These are @slow: each family is ONE batched bisection (vmapped SE solves
over the rho grid, ~10 bisection levels), but the relu family's SE sweeps
are quadrature-heavy (~6 min on the 2-core CPU host). Run just these with
``./test.sh tests/test_golden_slow.py`` or ``pytest -m slow``.
"""
import numpy as np
import pytest

from tramp_tpu import glm_state_evolution
from tramp_tpu.experiments import find_critical_alpha_batched


# reference examples/glm/data/relu_critical_lines.csv: the COMPLETE
# 19-line family (a0=0, perfect, prior_mean=0, rho=linspace(0.05,0.95,19)).
# Exact match expected (same bisection schedule; see test_golden_csv.py).
RELU_CRITICAL_FULL = [
    0.18799734130859375, 0.3354575415039062, 0.4682693774414063,
    0.5913156372070312, 0.7075259936523439, 0.8169004467773437,
    0.9223686694335937, 1.023930661621094, 1.1206098657226562,
    1.214359396972656, 1.3051792553710935, 1.3930694409179685,
    1.4790065112304687, 1.5610373510742184, 1.6420916333007813,
    1.7192396850585938, 1.7934580639648439, 1.8627936547851562,
    1.9213871118164065,
]


@pytest.mark.slow
def test_relu_critical_line_full_family():
    alphas = find_critical_alpha_batched(
        id="x", a0=0, mse_criterion="perfect",
        alpha_min=1e-5, alpha_max=2.0, alpha_tol=0.001,
        model_builder=glm_state_evolution,
        grid_kwargs={"prior_rho": list(np.linspace(0.05, 0.95, 19))},
        prior_type="gauss_bernoulli", output_type="relu", prior_mean=0)
    np.testing.assert_allclose(alphas, RELU_CRITICAL_FULL, atol=1e-12)


# reference examples/glm/data/sgn_retrieval_critical_lines.csv, the full
# a0=0, prior_mean=0.01 families (symmetry broken by the prior mean, so
# the threshold is well-defined; these coincide with the a0=0.1 lines
# wherever both exist in the CSV). rho=linspace(0.05,0.95,19).
SGN_CRITICAL_FULL = {
    "random": [
        0.6665083520507813, 0.5176814672851564, 0.5141658715820312,
        0.5100643432617187, 0.5065487475585937, 0.5036190844726562,
        0.5006894213867188, 0.49834569091796876, 0.4954160278320313,
        0.49248636474609375, 0.4895567016601563, 0.4860411059570313,
        0.48252551025390633, 0.47900991455078135, 0.4749083862304688,
        0.4708068579101563, 0.4667053295898438, 0.46201786865234384,
        0.4573304077148438,
    ],
    "perfect": [
        0.6665083520507813, 0.5270563891601563, 0.5504936938476563,
        0.5885793139648436, 0.6454147778320314, 0.7069377026367187,
        0.7649450317382813, 0.8182648999023439, 0.8674832397460939,
        0.9114281860351563, 0.9518575366210937, 0.9875994262695313,
        1.0198257202148437, 1.0479504858398438, 1.0719737231445314,
        1.0924813647460938, 1.1083015454101564, 1.1206061303710937,
        1.1276373217773437,
    ],
}


@pytest.mark.slow
@pytest.mark.parametrize("criterion", ["random", "perfect"])
def test_sgn_retrieval_critical_line_full_family(criterion):
    alphas = find_critical_alpha_batched(
        id="x", a0=0, mse_criterion=criterion,
        alpha_min=1e-5, alpha_max=1.2, alpha_tol=0.001,
        model_builder=glm_state_evolution,
        grid_kwargs={"prior_rho": list(np.linspace(0.05, 0.95, 19))},
        prior_type="gauss_bernoulli", output_type="abs", prior_mean=0.01)
    np.testing.assert_allclose(alphas, SGN_CRITICAL_FULL[criterion],
                               atol=1e-12)


@pytest.mark.slow
def test_sgn_a0_zero_mean_zero_is_numerically_seeded():
    """Documents WHY the (a0=0, prior_mean=0) sgn-retrieval lines are not
    a parity target: with an exactly-symmetric model the escape from the
    uninformative SE fixed point is seeded only by numerical perturbation
    (the AMIN=1e-11 precision clip), so the measured "threshold" depends
    on how each implementation amplifies that seed — an artifact, not a
    property of the model. Measured evidence pinned here: our thresholds
    disagree with the reference CSV in BOTH directions and
    non-monotonically (ours 0.553/0.594/0.760 vs reference
    0.524/0.893/0.647 at rho=0.05/0.15/0.25; at rho=0.35 our symmetric
    run does not escape below alpha=1.2 at all), while the
    symmetry-broken (prior_mean=0.01 / a0=0.1) families match the CSV
    BIT-EXACTLY (tests above + test_golden_csv.py)."""
    ref = [0.5235407934570313, 0.8926783422851563, 0.6465866430664065]
    alphas = find_critical_alpha_batched(
        id="x", a0=0, mse_criterion="perfect",
        alpha_min=1e-5, alpha_max=1.2, alpha_tol=0.001,
        model_builder=glm_state_evolution,
        grid_kwargs={"prior_rho": [0.05, 0.15, 0.25]},
        prior_type="gauss_bernoulli", output_type="abs", prior_mean=0.0)
    alphas = np.asarray(alphas)
    np.testing.assert_allclose(
        alphas, [0.552837, 0.594439, 0.759672], atol=1e-3)
    # every line differs from the reference CSV by orders of alpha_tol,
    # and not in a single direction — the defining instability signature
    devs = alphas - np.asarray(ref)
    assert np.all(np.abs(devs) > 0.02), devs
    assert devs.max() > 0 and devs.min() < 0, devs
