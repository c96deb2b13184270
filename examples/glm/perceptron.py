"""Perceptron: sgn-output GLM, EP vs SE across alpha.

Reference analog: examples/glm/data/perceptron_ep_vs_se.py:7-16.
"""
import argparse
import os

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)  # SE sweeps need f64 quadrature accuracy
import jax.numpy as jnp

from tramp_tpu import glm_generative, glm_state_evolution, StateEvolution
from tramp_tpu.experiments import BayesOptimalScenario, save_experiments


def run_perceptron(alpha, N, seed):
    model = glm_generative(
        N=N, alpha=alpha, ensemble_type="gaussian",
        prior_type="binary", output_type="sgn",
        key=jax.random.PRNGKey(seed))
    scenario = BayesOptimalScenario(model, x_ids=["x"])
    scenario.setup(seed=seed)
    x_ep = scenario.run_ep(max_iter=250)
    mse = float(jnp.mean((x_ep["x"]["r"] - scenario.x_true["x"]) ** 2))
    v_ep = float(np.mean(x_ep["x"]["v"]))

    se_model = glm_state_evolution(
        alpha=alpha, prior_type="binary", output_type="sgn")
    se = StateEvolution(se_model)
    se.iterate(max_iter=250)
    v_se = float(np.mean(se.get_variable_data("x")["v"]))
    return dict(v_EP=v_ep, mse_EP=mse, v_SE=v_se)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true")
    args = p.parse_args()
    N = 1000 if args.big else 250
    alphas = list(np.linspace(0.2, 2.0, 19 if args.big else 7).round(4))
    out = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(out, exist_ok=True)
    csv = os.path.join(out, "perceptron_ep_vs_se.csv")
    df = save_experiments(
        lambda alpha, seed: run_perceptron(alpha, N=N, seed=seed),
        csv, alpha=alphas, seed=[0])
    print(df.to_string(index=False))
    print(f"wrote {csv}")


if __name__ == "__main__":
    main()
