"""EP-level golden tests (round-3 VERDICT item 3): the reference's headline
claim is that *EP tracks SE* on sampled finite-N instances. Its committed
CSVs pin v_EP (converged EP posterior variance) and the empirical mse per
(alpha, rho) for N=1000 BayesOptimalScenario runs
(/root/reference/examples/glm/data/compressed_sensing_ep_vs_se.py:7-27,
perceptron_ep_vs_se.py:7-16; CSV columns source=EP / source=mse).

The reference instances cannot be replayed bit-for-bit (numpy RandomState
ancestral sampling vs our jax PRNG), so the parity contract is statistical:
the CSV value is ONE draw of the instance distribution; we draw N_SEEDS
instances with our sampler, and assert the CSV draw lies within the
finite-N fluctuation band of our ensemble (|mean - csv| <= 3.3 sigma,
sigma estimated from our seeds — 3.3 = 3 * sqrt(1 + 1/N_SEEDS) rounded up)
AND that our ensemble tracks the SE prediction the same way. Rows chosen
where the reference EP itself converged (n_iter < max_iter).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tramp_tpu as tt
from tramp_tpu.parallel import EPSolver, stack_pytrees

N_SEEDS = 8
N = 1000


def _build_cs(alpha, rho, key, noise_var=1e-11):
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.channels import LinearChannel, GaussianChannel

    M = int(np.ceil(alpha * N))
    kW, ks = jax.random.split(key)
    W = jax.random.normal(kW, (M, N)) / jnp.sqrt(N)
    teacher = (
        GaussBernoulliPrior(size=N, rho=rho) @ tt.V(id="x") @
        LinearChannel(W, name="W") @ tt.V(id="z") @
        GaussianChannel(var=noise_var) @ tt.O(id="y")
    ).to_model()
    sample = teacher.sample(ks)
    return teacher.to_observed({"y": sample["y"]}), sample["x"]


def _build_perceptron(alpha, p_pos, key):
    from tramp_tpu.priors import BinaryPrior
    from tramp_tpu.channels import LinearChannel
    from tramp_tpu.likelihoods import SgnLikelihood

    M = int(np.ceil(alpha * N))
    kW, ks = jax.random.split(key)
    W = jax.random.normal(kW, (M, N)) / jnp.sqrt(N)
    teacher = (
        BinaryPrior(size=N, p_pos=p_pos) @ tt.V(id="x") @
        LinearChannel(W, name="W") @ tt.V(id="z") @
        tt.channels.SgnChannel() @ tt.O(id="y")
    ).to_model()
    sample = teacher.sample(ks)
    student = teacher.to_observed({"y": sample["y"]})
    # the observed model swaps sgn channel -> SgnLikelihood
    assert any(isinstance(f, SgnLikelihood) for f in student.factors)
    return student, sample["x"]


def _run_ensemble(builder, seed0=0, max_iter=200):
    "v_EP and empirical mse over N_SEEDS sampled instances (one batch)."
    keys = jax.random.split(jax.random.PRNGKey(seed0), N_SEEDS)
    models, x0s = zip(*[builder(k) for k in keys])
    solver = EPSolver(models[0], damping=None, max_iter=max_iter, tol=1e-6)
    post, n_iter = solver.solve_batch(stack_pytrees(list(models)))
    r = np.asarray(post["x"]["r"], np.float64)
    v = np.asarray(post["x"]["v"], np.float64)
    x0 = np.stack([np.asarray(x, np.float64) for x in x0s])
    v_ep = v.reshape(N_SEEDS, -1).mean(axis=1)
    mse = ((r - x0) ** 2).mean(axis=1)
    return v_ep, mse, np.asarray(n_iter)


def _assert_in_band(ours, csv_value, label, atol=0.0):
    mean, sd = ours.mean(), ours.std(ddof=1)
    band = 3.3 * sd + atol
    assert abs(mean - csv_value) <= band, (
        f"{label}: csv {csv_value:.6e} outside ours "
        f"{mean:.6e} +- {band:.2e} (seeds: {ours})")


# (alpha, rho, v_SE_csv, v_EP_csv, mse_csv, atol) — reference
# compressed_sensing_ep_vs_se.csv rows at rho=0.25 where EP converged
CS_EP_ROWS = [
    (0.02040816326530612, 0.25,
     0.2449736425973765, 0.2468006782454586, 0.2731001954228221, 0.0),
    (0.2040816326530612, 0.25,
     0.182124943349197, 0.1729345336714338, 0.19236415075857102, 0.0),
    # deep-recovery branch: v ~ 1e-8 fluctuates multiplicatively; atol
    # covers the scale of both the CSV draw and our draws
    (0.8163265306122448, 0.25,
     5.5538359406470276e-08, 8.977752930825822e-09, 9.120211555173712e-09,
     1e-7),
]


@pytest.mark.parametrize("alpha,rho,v_se,v_ep_csv,mse_csv,atol", CS_EP_ROWS)
def test_cs_ep_golden(alpha, rho, v_se, v_ep_csv, mse_csv, atol):
    v_ep, mse, n_iter = _run_ensemble(
        lambda k: _build_cs(alpha, rho, k))
    _assert_in_band(v_ep, v_ep_csv, f"CS v_EP alpha={alpha}", atol)
    _assert_in_band(mse, mse_csv, f"CS mse alpha={alpha}", atol)
    # EP tracks SE: ensemble mean of v_EP within the same band of v_SE
    _assert_in_band(v_ep, v_se, f"CS v_EP-vs-SE alpha={alpha}",
                    atol + 0.05 * v_se)


# (alpha, p_pos, v_SE_csv, v_EP_csv, mse_csv) — reference
# perceptron_ep_vs_se.csv rows at p_pos=0.25
PERCEPTRON_EP_ROWS = [
    (0.02, 0.25, 0.7414219343897764, 0.7401054839825113, 0.7378951585127177),
    (0.5, 0.25, 0.531372205233981, 0.5390421435770469, 0.5003689302069502),
    (1.0, 0.25, 0.31072880209244685, 0.31209597643165743,
     0.30408800689296206),
]


@pytest.mark.parametrize("alpha,p_pos,v_se,v_ep_csv,mse_csv",
                         PERCEPTRON_EP_ROWS)
def test_perceptron_ep_golden(alpha, p_pos, v_se, v_ep_csv, mse_csv):
    v_ep, mse, n_iter = _run_ensemble(
        lambda k: _build_perceptron(alpha, p_pos, k))
    _assert_in_band(v_ep, v_ep_csv, f"perceptron v_EP alpha={alpha}")
    _assert_in_band(mse, mse_csv, f"perceptron mse alpha={alpha}")
    _assert_in_band(v_ep, v_se, f"perceptron v_EP-vs-SE alpha={alpha}",
                    0.05 * v_se)
