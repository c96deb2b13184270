"""Batched/sharded solver tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from tramp_tpu.parallel import (
    EPSolver, SESolver, stack_pytrees, make_mesh, shard_batched_model)


def _build(N, alpha, key, rho=0.3, noise_var=1e-2):
    import tramp_tpu as tt
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.channels import LinearChannel, GaussianChannel
    M = int(alpha * N)
    W = jax.random.normal(key, (M, N)) / jnp.sqrt(N)
    teacher = (
        GaussBernoulliPrior(size=N, rho=rho) @ tt.V(id="x") @
        LinearChannel(W, name="W") @ tt.V(id="z") @
        GaussianChannel(var=noise_var) @ tt.O(id="y")
    ).to_model()
    sample = teacher.sample(jax.random.fold_in(key, 1))
    return teacher.to_observed({"y": sample["y"]}), sample


def test_batched_ep_matches_sequential():
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    models, samples = zip(*[_build(64, 0.7, k) for k in keys])
    solver = EPSolver(models[0], damping=0.1, max_iter=100, tol=1e-8)
    stacked = stack_pytrees(list(models))
    post_b, n_iter_b = solver.solve_batch(stacked)
    for i, model in enumerate(models):
        post_i, _ = solver.solve(model)
        np.testing.assert_allclose(
            np.asarray(post_b["x"]["r"][i]), np.asarray(post_i["x"]["r"]),
            rtol=1e-4, atol=1e-6)


def test_sharded_batched_ep():
    assert len(jax.devices()) == 8
    mesh = make_mesh((4, 2), ("data", "model"))
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    models, samples = zip(*[_build(64, 0.5, k) for k in keys])
    solver = EPSolver(models[0], damping=0.1, max_iter=50, tol=1e-8)
    stacked = stack_pytrees(list(models))
    sharded = shard_batched_model(stacked, mesh)
    with mesh:
        post, n_iter = solver.solve_batch(sharded)
        jax.block_until_ready(post)
    r = np.asarray(post["x"]["r"])
    assert r.shape == (8, 64)
    assert np.all(np.isfinite(r))
    # parity vs unsharded batch
    post_u, _ = solver.solve_batch(stacked)
    np.testing.assert_allclose(r, np.asarray(post_u["x"]["r"]),
                               rtol=1e-6, atol=1e-8)


def test_graft_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)
