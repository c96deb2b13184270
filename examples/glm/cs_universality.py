"""Universality of noiseless compressed sensing over sensing ensembles.

Reference analog: examples/glm/plot_cs_universality.py +
examples/glm/data/cs_universality.py (reference file:line
plot_cs_universality.py:12-26, data/cs_universality.py:7-27).

The sensing matrix is a random-features matrix F = f(WX)/sqrt(N) with
f in {abs, sgn, relu, tanh}; EP/SE MSE curves are expected to collapse
onto the Gaussian-ensemble curve (universality).  Writes a CSV of
(f, rho, alpha, source, v, mse) and optionally a qplot figure.
"""
import argparse
import os

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tramp_tpu import glm_generative
from tramp_tpu.algos import EarlyStopping, EarlyStoppingEP
from tramp_tpu.experiments import BayesOptimalScenario, save_experiments


def run_cs(N, alpha, f, prior_rho, seed=0):
    model = glm_generative(
        N=N, alpha=alpha, ensemble_type="random_feature",
        prior_type="gauss_bernoulli", output_type="gaussian",
        ensemble_f=f, prior_rho=prior_rho, output_var=1e-11,
        key=jax.random.PRNGKey(seed))
    scenario = BayesOptimalScenario(model, x_ids=["x"])
    # v-based EarlyStopping works for both the SE and EP passes of run_all
    # (reference data/cs_universality.py:14-17)
    return scenario.run_all(metrics=["mse"], seed=seed, max_iter=200,
                            callback=EarlyStopping())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true")
    p.add_argument("--plot", action="store_true")
    args = p.parse_args()
    N = 1000 if args.big else 250
    n_alpha = 20 if args.big else 6
    alphas = list(np.linspace(0, 1, n_alpha + 1)[1:].round(4))
    rhos = [0.25, 0.50, 0.75] if args.big else [0.25, 0.5]
    out = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(out, exist_ok=True)
    csv = os.path.join(out, "cs_universality.csv")
    df = save_experiments(
        lambda alpha, f, prior_rho: run_cs(N, alpha, f, prior_rho),
        csv, f=["abs", "sgn", "relu", "tanh"], prior_rho=rhos, alpha=alphas)
    print(df.to_string(index=False))
    print(f"wrote {csv}")
    if args.plot:
        from tramp_tpu.experiments import qplot
        ax = qplot(df.query("source=='SE'"), x="alpha", y="v",
                   linestyle="f", column="prior_rho", show=False)
        fig = (ax[0] if isinstance(ax, (list, np.ndarray)) else ax).figure
        fig.savefig(os.path.join(out, "cs_universality.png"), dpi=120)


if __name__ == "__main__":
    main()
