"""Sparse-gradient regression: recover a piecewise-constant signal from
random projections using the TV-like tree model (GaussBernoulli prior on
the gradient).

Reference analog: examples/sparse/plot_sparse_gradient.py:21-41.
"""
import argparse
import os

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)  # SE sweeps need f64 quadrature accuracy
import jax.numpy as jnp  # SE sweeps need f64 quadrature accuracy

from tramp_tpu.models import sparse_gradient_regression
from tramp_tpu.algos import ExpectationPropagation


def make_signal(N, n_pieces, rng):
    "Piecewise-constant teacher signal."
    x = np.zeros(N)
    edges = np.sort(rng.choice(np.arange(1, N), n_pieces - 1, replace=False))
    levels = rng.randn(n_pieces)
    start = 0
    for lvl, end in zip(levels, list(edges) + [N]):
        x[start:end] = lvl
        start = end
    return x


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true")
    args = p.parse_args()
    N = 400 if args.big else 128
    alpha = 0.6
    M = int(alpha * N)
    rng = np.random.RandomState(0)
    x0 = make_signal(N, 6, rng)
    A = rng.randn(M, N) / np.sqrt(N)
    noise_var = 1e-3
    y = A @ x0 + np.sqrt(noise_var) * rng.randn(M)

    model = sparse_gradient_regression(
        jnp.asarray(A), jnp.asarray(y), x_shape=(N,), grad_rho=0.05,
        noise_var=noise_var, prior_var=2.0)
    ep = ExpectationPropagation(model)
    ep.iterate(max_iter=200, damping=0.1)
    r = np.asarray(ep.get_variable_data("x")["r"])
    mse = float(np.mean((r - x0) ** 2))
    print(f"N={N} M={M} sparse-gradient EP mse={mse:.2e} "
          f"(signal var {x0.var():.3f})")

    out = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(out, exist_ok=True)
    np.savetxt(os.path.join(out, "sparse_gradient_recovery.csv"),
               np.c_[x0, r], delimiter=",", header="x_true,x_ep")
    print(f"wrote {out}/sparse_gradient_recovery.csv")


if __name__ == "__main__":
    main()
