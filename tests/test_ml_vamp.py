"""ML-VAMP spectral chain solver: parity vs the generic engine
(VERDICT r3 item 2b) and the dispatch front door (item 2a).

The contract: MLVAMPSolver runs the engine's serial schedule with cached
spectral transforms, so with pin_terminal=False the trajectory is
iterate-by-iterate identical to EPSolver; with the default pinning the
transient differs but the fixed point does not (like
tests/test_vamp_glm.py for the 3-factor GLM chain)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tramp_tpu as tt
from tramp_tpu.priors import GaussBernoulliPrior, GaussianPrior, BinaryPrior
from tramp_tpu.channels import (LinearChannel, GaussianChannel, ReluChannel,
                                BiasChannel, LeakyReluChannel,
                                HardTanhChannel)
from tramp_tpu.likelihoods import SgnLikelihood
from tramp_tpu.parallel import (EPSolver, MLVAMPSolver, SpectralVAMPSolver,
                                dispatch_solver)


def glm_student(N=300, alpha=0.7, rho=0.3, seed=0):
    W = np.random.RandomState(seed).randn(int(alpha * N), N) / np.sqrt(N)
    teacher = (GaussBernoulliPrior(size=N, rho=rho) @ tt.V(id="x") @
               LinearChannel(jnp.asarray(W)) @ tt.V(id="z") @
               GaussianChannel(var=1e-2) @ tt.O(id="y")).to_model()
    sample = teacher.sample(jax.random.PRNGKey(seed + 1))
    return teacher.to_observed({"y": sample["y"]}), sample


def relu_student(N=256, alpha=0.5, rho=0.25, seed=11):
    rng = np.random.RandomState(seed)
    W = rng.randn(int(alpha * N), N) / np.sqrt(N)
    teacher = (GaussBernoulliPrior(size=N, rho=rho) @ tt.V(id="x") @
               LinearChannel(jnp.asarray(W), name="W") @ tt.V(id="z") @
               ReluChannel() @ tt.V(id="a") @
               GaussianChannel(var=1e-2) @ tt.O(id="y")).to_model()
    sample = teacher.sample(jax.random.PRNGKey(2))
    return teacher.to_observed({"y": sample["y"]}), sample


def vae_student(D=8, H=32, P=64, seed=11):
    "Two-layer decoder chain with bias/activation/mask — the config-4 shape."
    rng = np.random.RandomState(seed)
    W1, b1 = rng.randn(H, D) / np.sqrt(D), 0.1 * rng.randn(H)
    W2, b2 = rng.randn(P, H) / np.sqrt(H), 0.1 * rng.randn(P)
    F = np.eye(P)[: P // 2]
    teacher = (GaussianPrior(size=D) @ tt.V(id="z0") @
               LinearChannel(jnp.asarray(W1), name="W1") @ tt.V(id="h") @
               BiasChannel(jnp.asarray(b1)) @ tt.V(id="hb") @
               LeakyReluChannel(0.0) @ tt.V(id="z1") @
               LinearChannel(jnp.asarray(W2), name="W2") @ tt.V(id="g") @
               BiasChannel(jnp.asarray(b2)) @ tt.V(id="gb") @
               HardTanhChannel() @ tt.V(id="x") @
               LinearChannel(jnp.asarray(F), name="F") @ tt.V(id="obs") @
               GaussianChannel(var=1e-2) @ tt.O(id="y")).to_model()
    sample = teacher.sample(jax.random.PRNGKey(3))
    return teacher.to_observed({"y": sample["y"]}), sample


def test_glm_fixed_point_parity():
    student, _ = glm_student()
    post_ep, it_ep = EPSolver(student, damping=0.1, max_iter=500,
                              tol=1e-10).solve(student)
    post_ml, it_ml = MLVAMPSolver(student, damping=0.1, max_iter=500,
                                  tol=1e-10).solve(student)
    for vid in ("x", "z"):
        np.testing.assert_allclose(np.asarray(post_ml[vid]["r"]),
                                   np.asarray(post_ep[vid]["r"]),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(post_ml[vid]["v"]),
                            np.shape(post_ep[vid]["v"])),
            np.asarray(post_ep[vid]["v"]), rtol=1e-6)


def test_relu_net_trajectory_parity():
    """The relu-net chain (interior dense linear + PL activation): the
    spectral-cached linear messages must reproduce the engine exactly."""
    student, _ = relu_student()
    n_it = 40
    ep = EPSolver(student, damping=0.1, max_iter=n_it, tol=0.0,
                  rollback_increase=float("inf"))
    post_ep, it_ep = ep.solve(student)
    ml = MLVAMPSolver(student, damping=0.1, max_iter=n_it, tol=0.0,
                      pin_terminal=False)
    post_ml, it_ml = ml.solve(student)
    assert int(it_ep) == int(it_ml) == n_it
    for vid in ("x", "z", "a"):
        np.testing.assert_allclose(np.asarray(post_ml[vid]["r"]),
                                   np.asarray(post_ep[vid]["r"]),
                                   rtol=1e-9, atol=1e-12, err_msg=vid)


def test_relu_net_pinned_fixed_point():
    "Default pinning changes the transient, not the fixed point."
    student, sample = relu_student()
    post_ep, _ = EPSolver(student, damping=0.1, max_iter=500,
                          tol=1e-10).solve(student)
    post_ml, it_ml = MLVAMPSolver(student, damping=0.1, max_iter=500,
                                  tol=1e-10).solve(student)
    for vid in ("x", "z", "a"):
        np.testing.assert_allclose(np.asarray(post_ml[vid]["r"]),
                                   np.asarray(post_ep[vid]["r"]),
                                   rtol=1e-6, atol=1e-8, err_msg=vid)


def test_vae_chain_trajectory_parity():
    """Config-4-shaped chain (two dense layers, bias, leaky-relu,
    hard-tanh, selection mask): 60-iteration snapshot must match the
    engine bit-tolerantly — the relevant contract for a model family
    where EP can lack a fixed point (bench solve_vae_inpainting)."""
    student, _ = vae_student()
    n_it = 60
    ep = EPSolver(student, damping=0.5, max_iter=n_it, tol=0.0,
                  rollback_increase=float("inf"))
    post_ep, _ = ep.solve(student)
    ml = MLVAMPSolver(student, damping=0.5, max_iter=n_it, tol=0.0,
                      pin_terminal=False)
    post_ml, _ = ml.solve(student)
    assert set(post_ml) == set(post_ep)
    for vid in post_ep:
        np.testing.assert_allclose(np.asarray(post_ml[vid]["r"]),
                                   np.asarray(post_ep[vid]["r"]),
                                   rtol=1e-8, atol=1e-10, err_msg=vid)


def test_sgn_likelihood_chain():
    "Non-constant terminal (perceptron): generic terminal, spectral linear."
    N = 200
    rng = np.random.RandomState(7)
    W = rng.randn(N, N) / np.sqrt(N)
    x0 = np.where(rng.rand(N) < 0.5, 1.0, -1.0)
    y = np.sign(W @ x0)
    y[y == 0] = 1.0
    student = (BinaryPrior(size=N, p_pos=0.5) @ tt.V(id="x") @
               LinearChannel(jnp.asarray(W), name="W") @ tt.V(id="z") @
               SgnLikelihood(y=jnp.asarray(y))).to_model()
    n_it = 30
    ep = EPSolver(student, damping=0.2, max_iter=n_it, tol=0.0,
                  rollback_increase=float("inf"))
    post_ep, _ = ep.solve(student)
    ml = MLVAMPSolver(student, damping=0.2, max_iter=n_it, tol=0.0)
    assert not ml._pin_terminal
    post_ml, _ = ml.solve(student)
    for vid in ("x", "z"):
        np.testing.assert_allclose(np.asarray(post_ml[vid]["r"]),
                                   np.asarray(post_ep[vid]["r"]),
                                   rtol=1e-9, atol=1e-12, err_msg=vid)


def test_solve_batch_matches_single():
    student, _ = glm_student(N=120, alpha=0.5)
    from tramp_tpu.parallel import stack_pytrees
    ys = []
    models = []
    for s in range(3):
        m, _ = glm_student(N=120, alpha=0.5, seed=s)
        models.append(m)
    stacked = stack_pytrees(models)
    solver = MLVAMPSolver(models[0], damping=0.1, max_iter=300, tol=1e-9)
    post_b, it_b = solver.solve_batch(stacked)
    for i, m in enumerate(models):
        post_i, _ = solver.solve(m)
        np.testing.assert_allclose(np.asarray(post_b["x"]["r"])[i],
                                   np.asarray(post_i["x"]["r"]),
                                   rtol=1e-9, atol=1e-12)


def test_dispatch_routes():
    glm, _ = glm_student(N=80, alpha=0.5)
    assert isinstance(dispatch_solver(glm), SpectralVAMPSolver)
    relu, _ = relu_student(N=64, alpha=0.5)
    assert isinstance(dispatch_solver(relu), MLVAMPSolver)
    # non-chain (SIMO tree): generic engine fallback
    from tramp_tpu.variables import (SIMOVariable, MILeafVariable,
                                     SILeafVariable as O)
    from tramp_tpu.channels import GradientChannel
    N = 32
    y = np.random.RandomState(1).randn(N)
    tree = (GaussianPrior(size=(N,)) @
            SIMOVariable(id="x", n_next=2) @ (
                GaussianChannel(var=1e-2) @ O("y") + (
                    GradientChannel(shape=(N,)) +
                    GaussBernoulliPrior(size=(1, N), rho=0.1)
                ) @ MILeafVariable(id="z", n_prev=2)
            )).to_model().to_observed({"y": jnp.asarray(y)})
    assert isinstance(dispatch_solver(tree), EPSolver)


def test_minimal_denoising_chain():
    "Smallest chain (prior @ GaussianLikelihood, L=1) through dispatch."
    from tramp_tpu.channels import GaussianChannel as GC

    N = 300
    teacher = (GaussBernoulliPrior(size=N, rho=0.3) @ tt.V(id="x") @
               GC(var=0.05) @ tt.O(id="y")).to_model()
    s = teacher.sample(jax.random.PRNGKey(0))
    student = teacher.to_observed({"y": s["y"]})
    solver = dispatch_solver(student, damping=0.1, max_iter=200, tol=1e-10)
    assert isinstance(solver, MLVAMPSolver)
    post, _ = solver.solve(student)
    post_ep, _ = EPSolver(student, damping=0.1, max_iter=200,
                          tol=1e-10).solve(student)
    np.testing.assert_allclose(np.asarray(post["x"]["r"]),
                               np.asarray(post_ep["x"]["r"]),
                               rtol=1e-6, atol=1e-9)
