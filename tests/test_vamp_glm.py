"""Spectral VAMP fast path (parallel/vamp_glm.py): same moment-matching
fixed point as the generic EP engine on prior @ LinearChannel @
GaussianLikelihood chains, at 2 Nz^2 MACs per iteration (the
Gaussian-likelihood LMMSE step stays entirely in the SVD basis)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tramp_tpu as tt
from tramp_tpu.parallel import EPSolver, SpectralVAMPSolver, stack_pytrees


def _build(N=300, alpha=0.6, rho=0.3, noise_var=1e-2, seed=0,
           prior="gauss_bernoulli"):
    from tramp_tpu.priors import (
        GaussBernoulliPrior, GaussianPrior, BinaryPrior)
    from tramp_tpu.channels import LinearChannel, GaussianChannel

    M = int(alpha * N)
    W = jax.random.normal(jax.random.PRNGKey(seed), (M, N)) / jnp.sqrt(N)
    priors = {
        "gauss_bernoulli": GaussBernoulliPrior(size=N, rho=rho),
        "gaussian": GaussianPrior(size=N),
        "binary": BinaryPrior(size=N, p_pos=0.6),
    }
    teacher = (priors[prior] @ tt.V(id="x") @
               LinearChannel(W, name="W") @ tt.V(id="z") @
               GaussianChannel(var=noise_var) @ tt.O(id="y")).to_model()
    sample = teacher.sample(jax.random.PRNGKey(seed + 1))
    return teacher.to_observed({"y": sample["y"]}), sample


@pytest.mark.parametrize("prior", ["gauss_bernoulli", "gaussian", "binary"])
def test_vamp_matches_ep_fixed_point(prior):
    student, sample = _build(prior=prior)
    ep = EPSolver(student, damping=0.1, max_iter=500, tol=1e-10)
    post_ep, _ = ep.solve(student)
    vamp = SpectralVAMPSolver(student, max_iter=500, tol=1e-12)
    post_v, n_iter, conv = vamp.solve_info(student)
    assert bool(conv)
    r_ep = np.asarray(post_ep["x"]["r"], np.float64)
    r_v = np.asarray(post_v["x"]["r"], np.float64)
    np.testing.assert_allclose(r_v, r_ep, rtol=1e-6, atol=1e-8)
    # atol: in the perfect-recovery regime (binary prior) both engines'
    # posterior variances sit at the AMAX clip floor (~1e-11 vs exactly 0)
    np.testing.assert_allclose(
        float(post_v["x"]["v"]),
        float(np.mean(np.asarray(post_ep["x"]["v"]))), rtol=1e-6,
        atol=1e-9)


def test_vamp_uses_model_variable_ids_and_returns_z():
    "Posterior keys follow the model's ids; z-side posterior matches EP."
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.channels import LinearChannel, GaussianChannel

    N = 200
    W = jax.random.normal(jax.random.PRNGKey(2), (120, N)) / jnp.sqrt(N)
    teacher = (GaussBernoulliPrior(size=N, rho=0.3) @ tt.V(id="w") @
               LinearChannel(W) @ tt.V(id="zz") @
               GaussianChannel(var=1e-2) @ tt.O(id="y")).to_model()
    sample = teacher.sample(jax.random.PRNGKey(3))
    student = teacher.to_observed({"y": sample["y"]})
    post_v, _, conv = SpectralVAMPSolver(
        student, max_iter=500, tol=1e-12).solve_info(student)
    assert set(post_v) == {"w", "zz"}
    ep = EPSolver(student, damping=0.1, max_iter=500, tol=1e-10)
    post_ep, _ = ep.solve(student)
    for vid in ("w", "zz"):
        np.testing.assert_allclose(
            np.asarray(post_v[vid]["r"]), np.asarray(post_ep[vid]["r"]),
            rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(
            float(np.mean(np.asarray(post_v[vid]["v"]))),
            float(np.mean(np.asarray(post_ep[vid]["v"]))), rtol=1e-5)


def test_vamp_batched_matches_single():
    models, samples = zip(*[_build(seed=s) for s in range(4)])
    vamp = SpectralVAMPSolver(models[0], max_iter=500, tol=1e-10)
    post_b, n_iter_b = vamp.solve_batch(stack_pytrees(list(models)))
    for i, m in enumerate(models):
        post_i, n_i = vamp.solve(m)
        assert int(n_iter_b[i]) == int(n_i)
        np.testing.assert_allclose(
            np.asarray(post_b["x"]["r"][i]), np.asarray(post_i["x"]["r"]),
            rtol=1e-8, atol=1e-12)


def test_vamp_rejects_non_glm():
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.channels import LinearChannel, ReluChannel, GaussianChannel

    N = 32
    W = jax.random.normal(jax.random.PRNGKey(0), (16, N)) / jnp.sqrt(N)
    teacher = (GaussBernoulliPrior(size=N, rho=0.5) @ tt.V(id="x") @
               LinearChannel(W) @ tt.V(id="z") @
               ReluChannel() @ tt.V(id="a") @
               GaussianChannel(var=1e-2) @ tt.O(id="y")).to_model()
    sample = teacher.sample(jax.random.PRNGKey(1))
    student = teacher.to_observed({"y": sample["y"]})
    with pytest.raises(ValueError, match="SpectralVAMPSolver"):
        SpectralVAMPSolver(student)


def test_vamp_sharded_matches_unsharded():
    "GSPMD (data x model) mesh solve bit-matches the unsharded batch."
    from tramp_tpu.parallel import make_mesh, shard_batched_model

    assert len(jax.devices()) == 8
    models, _ = zip(*[_build(N=256, seed=s) for s in range(4)])
    solver = SpectralVAMPSolver(models[0], max_iter=300, tol=1e-10)
    stacked = stack_pytrees(list(models))
    post_ref, n_ref = solver.solve_batch(stacked)
    mesh = make_mesh((4, 2), ("data", "model"))
    sharded = shard_batched_model(stacked, mesh)
    with mesh:
        post_s, n_s = solver.solve_batch(sharded)
        jax.block_until_ready(post_s)
    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_ref))
    for vid in post_ref:
        np.testing.assert_allclose(
            np.asarray(post_s[vid]["r"]), np.asarray(post_ref[vid]["r"]),
            rtol=1e-10, atol=1e-13)


def test_vamp_damping_same_fixed_point():
    student, _ = _build(seed=9)
    undamped, _, c1 = SpectralVAMPSolver(
        student, max_iter=500, tol=1e-12).solve_info(student)
    damped, _, c2 = SpectralVAMPSolver(
        student, damping=0.3, max_iter=800, tol=1e-12).solve_info(student)
    assert bool(c1) and bool(c2)
    # the v-based stop fires slightly before r fully settles; 1e-5 is
    # the honest shared band at tol=1e-12 on v
    np.testing.assert_allclose(
        np.asarray(damped["x"]["r"]), np.asarray(undamped["x"]["r"]),
        rtol=1e-5, atol=1e-8)
