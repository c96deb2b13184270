"""Compressed sensing: EP vs SE across the measurement ratio alpha.

Reference analog: examples/glm/plot_cs.py:19-23 and
examples/glm/data/compressed_sensing_ep_vs_se.py (CSV committed upstream).

Sweeps alpha, runs EP on a sampled instance and SE on the analytic
Marchenko-Pastur model, and writes a CSV of (alpha, v_EP, mse_EP, v_SE).
"""
import argparse
import os

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)  # SE sweeps need f64 quadrature accuracy
import jax.numpy as jnp

from tramp_tpu import glm_generative, glm_state_evolution, StateEvolution
from tramp_tpu.experiments import BayesOptimalScenario, save_experiments


def run_cs(alpha, N, rho, noise_var, seed):
    model = glm_generative(
        N=N, alpha=alpha, ensemble_type="gaussian",
        prior_type="gauss_bernoulli", output_type="gaussian",
        prior_rho=rho, output_var=noise_var,
        key=jax.random.PRNGKey(seed))
    scenario = BayesOptimalScenario(model, x_ids=["x"])
    scenario.setup(seed=seed)
    x_ep = scenario.run_ep(max_iter=250, damping=0.1)
    mse = float(jnp.mean((x_ep["x"]["r"] - scenario.x_true["x"]) ** 2))
    v_ep = float(np.mean(x_ep["x"]["v"]))

    se_model = glm_state_evolution(
        alpha=alpha, prior_type="gauss_bernoulli", output_type="gaussian",
        prior_rho=rho, output_var=noise_var)
    se = StateEvolution(se_model)
    se.iterate(max_iter=250)
    v_se = float(np.mean(se.get_variable_data("x")["v"]))
    return dict(v_EP=v_ep, mse_EP=mse, v_SE=v_se)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true")
    args = p.parse_args()
    N = 1000 if args.big else 250
    alphas = list(np.linspace(0.05, 1.0, 20 if args.big else 8).round(4))
    out = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(out, exist_ok=True)
    csv = os.path.join(out, "compressed_sensing_ep_vs_se.csv")
    df = save_experiments(
        lambda alpha, seed: run_cs(alpha, N=N, rho=0.25, noise_var=1e-2,
                                   seed=seed),
        csv, alpha=alphas, seed=[0])
    print(df.to_string(index=False))
    print(f"wrote {csv}")


if __name__ == "__main__":
    main()
