"""EP wall-time benchmark on sparse linear regression, vs scikit-learn Lasso
when available.

Reference analog: examples/figures/compute_benchmark.py:16-93 (EP vs
LassoCV/PyMC3-NUTS; PyMC3 is not installable offline, Lasso is optional).
EP time includes the SVD precompute, like the reference (l:21-28).
"""
import argparse
import os
import time

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)  # SE sweeps need f64 quadrature accuracy
import jax.numpy as jnp

from tramp_tpu import glm_generative
from tramp_tpu.experiments import BayesOptimalScenario, save_experiments


def run_ep(alpha, N, rho, noise_var, seed):
    t0 = time.perf_counter()
    model = glm_generative(
        N=N, alpha=alpha, ensemble_type="gaussian",
        prior_type="gauss_bernoulli", output_type="gaussian",
        prior_rho=rho, output_var=noise_var, key=jax.random.PRNGKey(seed))
    scenario = BayesOptimalScenario(model, x_ids=["x"])
    scenario.setup(seed=seed)
    x_ep = scenario.run_ep(max_iter=1000, damping=0.1)
    mse = float(jnp.mean((x_ep["x"]["r"] - scenario.x_true["x"]) ** 2))
    return dict(source="EP", mse=mse, time=time.perf_counter() - t0)


def run_lasso(alpha, N, rho, noise_var, seed):
    try:
        from sklearn.linear_model import LassoCV
    except ImportError:
        return dict(source="Lasso", mse=np.nan, time=np.nan)
    model = glm_generative(
        N=N, alpha=alpha, ensemble_type="gaussian",
        prior_type="gauss_bernoulli", output_type="gaussian",
        prior_rho=rho, output_var=noise_var, key=jax.random.PRNGKey(seed))
    scenario = BayesOptimalScenario(model, x_ids=["x"])
    scenario.setup(seed=seed)
    F = np.asarray(model.factors[1].W)
    y = np.asarray(scenario.observations["y"])
    t0 = time.perf_counter()
    reg = LassoCV(cv=5).fit(F, y)
    mse = float(np.mean((reg.coef_ - np.asarray(scenario.x_true["x"])) ** 2))
    return dict(source="Lasso", mse=mse, time=time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true")
    args = p.parse_args()
    N = 1000 if args.big else 250
    alphas = [0.1, 0.3, 0.6] if not args.big else \
        list(np.linspace(0.02, 1.0, 25).round(3))

    def run(alpha, seed):
        out = run_ep(alpha, N=N, rho=0.05, noise_var=1e-2, seed=seed)
        lasso = run_lasso(alpha, N=N, rho=0.05, noise_var=1e-2, seed=seed)
        return dict(ep_mse=out["mse"], ep_time=out["time"],
                    lasso_mse=lasso["mse"], lasso_time=lasso["time"])

    out = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(out, exist_ok=True)
    csv = os.path.join(out, "benchmark.csv")
    df = save_experiments(run, csv, alpha=alphas, seed=[0, 1])
    print(df.to_string(index=False))
    print(f"wrote {csv}")


if __name__ == "__main__":
    main()
