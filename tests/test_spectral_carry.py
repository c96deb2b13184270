"""Spectral-image carry in the generic tree engine (config.SPECTRAL_CARRY).

The EP engine carries each dense LinearChannel's backward spectral image
U^T bx in the message state across sweeps (the ML-VAMP carry discipline,
parallel/ml_vamp.py:16-47, generalized to arbitrary tree positions).
Contract under test: trajectories are BIT-IDENTICAL to the uncached
engine — the cached value is produced by the same _mm on the same stored
operand the uncached forward pass would read. The two matvecs being
cached are the reference's linear_channel.py:69-83.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tramp_tpu import config
from tramp_tpu.algos import ExpectationPropagation, NoisyInit
from tramp_tpu.models import sparse_gradient_regression
from tramp_tpu.parallel import EPSolver
from tramp_tpu.parallel.solver import stack_pytrees

RNG = np.random.RandomState(11)


@pytest.fixture
def no_carry():
    "Build-time gate: engines constructed inside see SPECTRAL_CARRY off."
    prev = config.SPECTRAL_CARRY
    config.SPECTRAL_CARRY = False
    yield
    config.SPECTRAL_CARRY = prev


def _glm(N=40, alpha=0.7, seed=0):
    from tramp_tpu import V
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.channels import LinearChannel
    from tramp_tpu.likelihoods import GaussianLikelihood
    rng = np.random.RandomState(seed)
    M = int(alpha * N)
    W = rng.randn(M, N) / np.sqrt(N)
    x0 = rng.randn(N) * (rng.rand(N) < 0.3)
    y = W @ x0 + 0.1 * rng.randn(M)
    return (
        GaussBernoulliPrior(size=N, rho=0.3) @ V(id="x") @
        LinearChannel(jnp.asarray(W), name="W") @ V(id="z") @
        GaussianLikelihood(y=jnp.asarray(y), var=1e-2)
    ).to_model()


def _tree(N=32, M=24, seed=2):
    rng = np.random.RandomState(seed)
    x0 = np.zeros(N)
    x0[: N // 2] = 1.0
    A = rng.randn(M, N) / np.sqrt(N)
    y = A @ x0 + 1e-3 * rng.randn(M)
    return sparse_gradient_regression(
        jnp.asarray(A), jnp.asarray(y), x_shape=(N,), grad_rho=0.1,
        noise_var=1e-3, prior_var=1.0)


def _run(model, n_iter, damping, initializer=None):
    ep = ExpectationPropagation(model)
    ep.iterate(max_iter=n_iter, damping=damping, tol=0.0,
               initializer=initializer)
    return ep


def _assert_states_equal(ep_a, ep_b):
    "Slot-by-slot exact equality of the message state (cache excluded)."
    n = ep_a.n_slots
    for s, (m_a, m_b) in enumerate(zip(ep_a.state[:n], ep_b.state[:n])):
        for k in ("a", "b"):
            np.testing.assert_array_equal(
                np.asarray(m_a[k]), np.asarray(m_b[k]),
                err_msg=f"slot {s} key {k}")


def test_registration():
    "GLM: 1 linear factor registered; sparse-gradient tree: 1 (dense A only)."
    ep = ExpectationPropagation(_glm())
    assert len(ep.spectral_factors) == 1
    ep_t = ExpectationPropagation(_tree())
    # the GradientChannel is a structured (FFT) channel, NOT type-is
    # LinearChannel — only the dense sensing matrix carries an image
    assert len(ep_t.spectral_factors) == 1
    # the cache rides the state: one extra trailing dict entry
    st = ep.init_state()
    assert len(st) == ep.n_slots + 1
    i = ep.spectral_factors[0]
    assert st[ep.n_slots][str(i)].shape == (ep.nodes[i].k,)


@pytest.mark.parametrize("damping", [0.0, 0.3])
def test_glm_bit_identical(no_carry, damping):
    model = _glm()
    ep_off = _run(model, 25, damping)
    assert ep_off.spectral_factors == ()
    config.SPECTRAL_CARRY = True
    ep_on = _run(model, 25, damping)
    assert len(ep_on.spectral_factors) == 1
    _assert_states_equal(ep_on, ep_off)


def test_tree_bit_identical(no_carry):
    "Sparse-gradient tree (SIMO x): carry at a non-chain position."
    model = _tree()
    ep_off = _run(model, 40, 0.1)
    config.SPECTRAL_CARRY = True
    ep_on = _run(model, 40, 0.1)
    _assert_states_equal(ep_on, ep_off)


def test_noisy_init_bit_identical(no_carry):
    "Init cache must equal U^T bx0 of the ACTUAL (random) initial slots."
    model = _glm()
    ep_off = _run(model, 8, 0.0, initializer=NoisyInit(seed=5))
    config.SPECTRAL_CARRY = True
    ep_on = _run(model, 8, 0.0, initializer=NoisyInit(seed=5))
    _assert_states_equal(ep_on, ep_off)


def test_adaptive_damping_bit_identical(no_carry):
    model = _glm()
    ep_off = _run(model, 10, "adaptive")
    config.SPECTRAL_CARRY = True
    ep_on = _run(model, 10, "adaptive")
    _assert_states_equal(ep_on, ep_off)


def test_batched_solver_tree(no_carry):
    "EPSolver batched path on the tree model: same posteriors either way."
    models = [_tree(seed=s) for s in (2, 3, 4)]
    stacked = stack_pytrees(models)
    s_off = EPSolver(models[0], damping=0.1, tol=1e-8, max_iter=150)
    post_off, n_off = s_off.solve_batch(stacked)
    config.SPECTRAL_CARRY = True
    s_on = EPSolver(models[0], damping=0.1, tol=1e-8, max_iter=150)
    post_on, n_on = s_on.solve_batch(stacked)
    np.testing.assert_array_equal(np.asarray(n_on), np.asarray(n_off))
    for vid in post_off:
        for k in ("r", "v"):
            np.testing.assert_array_equal(
                np.asarray(post_on[vid][k]), np.asarray(post_off[vid][k]),
                err_msg=f"{vid} {k}")


def test_save_load_roundtrip(tmp_path):
    model = _glm()
    ep = _run(model, 12, 0.2)
    path = tmp_path / "state.npz"
    ep.save_state(path)
    ep2 = ExpectationPropagation(model)
    ep2.load_state(path)
    assert ep2.n_iter == ep.n_iter
    _assert_states_equal(ep2, ep)
    cache, cache2 = ep.state[ep.n_slots], ep2.state[ep2.n_slots]
    for k in cache:
        np.testing.assert_array_equal(np.asarray(cache[k]),
                                      np.asarray(cache2[k]))
    # resuming continues the identical trajectory
    ep.iterate(max_iter=5, damping=0.2, tol=0.0, warm_start=True)
    ep2.iterate(max_iter=5, damping=0.2, tol=0.0, warm_start=True)
    _assert_states_equal(ep2, ep)


def test_load_legacy_checkpoint(no_carry, tmp_path):
    "A checkpoint saved WITHOUT the carry loads into a carrying engine."
    model = _glm()
    ep_off = _run(model, 12, 0.2)
    path = tmp_path / "legacy.npz"
    ep_off.save_state(path)
    config.SPECTRAL_CARRY = True
    ep_on = ExpectationPropagation(model)
    ep_on.load_state(path)
    # the rebuilt cache equals U^T bx of the restored slots, so the resumed
    # trajectory matches the uncached engine's exactly
    ep_off.iterate(max_iter=6, damping=0.2, tol=0.0, warm_start=True)
    ep_on.iterate(max_iter=6, damping=0.2, tol=0.0, warm_start=True)
    _assert_states_equal(ep_on, ep_off)


def test_batched_per_lane_W_noisy_init():
    """Regression (round-5 review): the batched solver shares ONE
    init-state template across lanes whose W (hence U) leaves differ; the
    carried spectral image must be re-derived from each lane's OWN
    operator inside the compiled run — with a nonzero initial bx a
    template-baked U^T bx0 would silently break bit-identity for every
    non-template lane."""
    models = [_glm(seed=s) for s in (0, 1, 2)]
    stacked = stack_pytrees(models)
    init = NoisyInit(seed=9)
    solver = EPSolver(models[0], damping=0.2, tol=1e-9, max_iter=120)
    post_b, n_b = solver.solve_batch(stacked, initializer=init)
    for j, m in enumerate(models):
        post_s, n_s, _ = solver.solve_info(m, initializer=NoisyInit(seed=9))
        assert int(np.asarray(n_b)[j]) == int(n_s), (j, n_b, n_s)
        for k in ("r", "v"):
            np.testing.assert_array_equal(
                np.asarray(post_b["x"][k])[j], np.asarray(post_s["x"][k]),
                err_msg=f"lane {j} {k}")
