"""Complex phase retrieval: y = |F x| with complex Gaussian sensing matrix.

Reference analog: examples/glm/plot_complex_pr.py. Complex arrays are packed
as (2, .) real arrays (reference tramp/utils/misc.py:13-27); the metric is
the phase-symmetric mse (reference tramp/algos/metrics.py:21-29).
"""
import argparse
import os

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)  # SE sweeps need f64 quadrature accuracy

from tramp_tpu import glm_generative
from tramp_tpu.experiments import BayesOptimalScenario, save_experiments
from tramp_tpu.algos.metrics import phase_symmetric_mse
from tramp_tpu.algos import EarlyStopping


def run_pr(alpha, N, seed):
    # small nonzero prior mean breaks the global phase symmetry
    # (reference plot_complex_pr.py:20-24: prior_mean=0.01, rho=0.5)
    model = glm_generative(
        N=N, alpha=alpha, ensemble_type="complex_gaussian",
        prior_type="gauss_bernoulli", output_type="modulus",
        prior_mean=0.01, prior_rho=0.5,
        key=jax.random.PRNGKey(seed))
    scenario = BayesOptimalScenario(model, x_ids=["x"])
    scenario.setup(seed=seed)
    # reference data script: EarlyStopping(wait_increase=10) (v-based)
    # for both EP and SE, damping 0.3 (phase_retrieval_ep_vs_se.py:14-18)
    x_ep = scenario.run_ep(max_iter=200, damping=0.3,
                           early_stop=EarlyStopping(wait_increase=10))
    mse = float(phase_symmetric_mse(scenario.x_true["x"], x_ep["x"]["r"]))
    return dict(mse_EP=mse, v_EP=float(np.mean(x_ep["x"]["v"])))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true")
    args = p.parse_args()
    N = 500 if args.big else 120
    alphas = [1.5, 2.0, 3.0] if not args.big else \
        list(np.linspace(1.0, 4.0, 13).round(3))
    out = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(out, exist_ok=True)
    csv = os.path.join(out, "phase_retrieval_ep.csv")
    df = save_experiments(
        lambda alpha, seed: run_pr(alpha, N=N, seed=seed),
        csv, alpha=alphas, seed=[0])
    print(df.to_string(index=False))
    print(f"wrote {csv}")


if __name__ == "__main__":
    main()
