#!/usr/bin/env python
"""Benchmark: AMP (EP) iterations/s/chip on the reference's headline workload
(sparse linear regression / compressed sensing GLM, BASELINE.md).

Prints ONE JSON line:
  {"metric": "ep_iterations_per_s_N1e4", "value": ..., "unit": "iter/s",
   "vs_baseline": ...}

- value: EP message-passing iterations/s at N=10^4, aggregated over a batch
  of instances sharing the sensing matrix (vmapped; the SVD-basis matvecs
  become MXU matmuls).
- vs_baseline: ratio vs the same workload on a SINGLE CPU CORE (taskset -c 0,
  XLA CPU, batch=1) — the reference tramp is single-core numpy whose EP
  iteration cost is the same two dense matvecs, so this is a faithful proxy
  for the reference baseline (its deps, networkx<2, cannot be installed
  here). Cached in .bench_cpu_baseline.json.

Usage: python bench.py            (TPU via ambient axon env)
       python bench.py --cpu-baseline   (internal: single-core CPU measure)
"""
import json
import os
import subprocess
import sys
import time

# persistent compilation cache: the batch-512 EP graph takes minutes to
# compile through the remote-compile tunnel; cache it across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

N = 10_000
ALPHA = 0.5
RHO = 0.25
NOISE = 1e-2
N_LOOP = 20
BATCH_TPU = 768  # throughput knee measured on v5e (161.6k iter/s;
                 # 512 -> 149.9k, 1024 -> 123.3k: HBM pressure)

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cpu_baseline.json")


def build(N, alpha, dtype):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import tramp_tpu as tt
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.channels import LinearChannel, GaussianChannel

    M = int(alpha * N)
    rng = np.random.RandomState(0)
    W = (rng.randn(M, N) / np.sqrt(N)).astype(np.float64)
    # host SVD in float64 (cached on disk: ~2min at N=1e4 on 2 cores),
    # shipped to device in the working dtype
    svd_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             f".bench_svd_{M}x{N}.npz")
    if os.path.exists(svd_cache):
        d = np.load(svd_cache)
        U, s, Vt = d["U"], d["s"], d["Vt"]
    else:
        U, s, Vt = np.linalg.svd(W, full_matrices=True)
        np.savez(svd_cache, U=U, s=s, Vt=Vt)
    lin = LinearChannel(
        jnp.asarray(W, dtype),
        svd=(jnp.asarray(U, dtype), jnp.asarray(s, dtype),
             jnp.asarray(Vt, dtype)),
        name="W")
    teacher = (
        GaussBernoulliPrior(size=N, rho=RHO) @ tt.V(id="x") @
        lin @ tt.V(id="z") @
        GaussianChannel(var=NOISE) @ tt.O(id="y")
    ).to_model()
    sample = teacher.sample(jax.random.PRNGKey(1))
    student = teacher.to_observed(
        {"y": jnp.asarray(sample["y"], dtype)})
    return student, sample


def bench_iterations(student, batch, n_loop):
    "Time n_loop fused EP sweeps (optionally vmapped over batch ys)."
    import jax
    import jax.numpy as jnp
    import tramp_tpu as tt

    engine = tt.ExpectationPropagation(student)
    damp = engine._damping_per_slot(0.1)
    state0 = engine.init_state()

    def loop(model, state):
        def body(i, st):
            return engine._sweep(model, st, damp)
        return jax.lax.fori_loop(0, n_loop, body, state)

    if batch > 1:
        # batch over observations: same W, different y (vmapped leaf)
        y_leaf = None
        for f in student.factors:
            if hasattr(f, "y") and f.y is not None:
                y_leaf = f.y
        leaves, treedef = jax.tree.flatten(student)
        in_axes_leaves = [0 if l is y_leaf else None for l in leaves]
        in_axes_model = jax.tree.unflatten(treedef, in_axes_leaves)
        stacked_leaves = [
            jnp.stack([l] * batch) if l is y_leaf else l for l in leaves]
        model_in = jax.tree.unflatten(treedef, stacked_leaves)
        fn = jax.jit(jax.vmap(loop, in_axes=(in_axes_model, None)))
    else:
        model_in = student
        fn = jax.jit(loop)

    out = fn(model_in, state0)  # compile + warmup
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(model_in, state0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return batch * n_loop / best


def main_cpu_baseline():
    import jax
    student, _ = build(N, ALPHA, "float32")
    its = bench_iterations(student, batch=1, n_loop=10)
    print(json.dumps({"cpu_single_core_iter_per_s": its}))


def main():
    if "--cpu-baseline" in sys.argv:
        main_cpu_baseline()
        return

    # single-core CPU baseline (cached)
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cpu_its = json.load(f)["cpu_single_core_iter_per_s"]
    else:
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = ""
        out = subprocess.run(
            ["taskset", "-c", "0", sys.executable,
             os.path.abspath(__file__), "--cpu-baseline"],
            env=env, capture_output=True, text=True, timeout=3000)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")][-1]
        cpu_its = json.loads(line)["cpu_single_core_iter_per_s"]
        with open(CACHE, "w") as f:
            json.dump({"cpu_single_core_iter_per_s": cpu_its}, f)

    student, _ = build(N, ALPHA, "float32")
    tpu_its = bench_iterations(student, batch=BATCH_TPU, n_loop=N_LOOP)
    print(json.dumps({
        "metric": "ep_iterations_per_s_N1e4",
        "value": round(tpu_its, 2),
        "unit": "iter/s",
        "vs_baseline": round(tpu_its / cpu_its, 2),
    }))


if __name__ == "__main__":
    main()
