"""Image denoising with a sparse-gradient (or TV/MAP-L21) prior.

Reference analog: examples/sparse/plot_raccoon_denoise.py (sparse-gradient
teacher/student on the raccoon image; here a synthetic piecewise-constant
image so the gallery runs offline, like image_deconvolution.py).

Model: x has a Gaussian prior AND its gradient x' = grad(x) carries a
GaussBernoulli (sparse) or MAP-L21 (TV) prior; y = x + noise observed.
The tree is the reference's: SIMO x feeding the Gaussian likelihood and
the gradient branch merged at the MI leaf x'.
"""
import argparse
import os

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tramp_tpu.variables import SIMOVariable, MILeafVariable, SILeafVariable as O
from tramp_tpu.priors import GaussianPrior, GaussBernoulliPrior, MAP_L21NormPrior
from tramp_tpu.channels import GradientChannel, GaussianChannel
from tramp_tpu.algos import ExpectationPropagation, EarlyStoppingEP, ConstantInit


def make_image(H, W, rng):
    x = np.zeros((H, W))
    for _ in range(6):
        r0, c0 = rng.randint(0, H - 4), rng.randint(0, W - 4)
        r1, c1 = rng.randint(r0 + 2, H), rng.randint(c0 + 2, W)
        x[r0:r1, c0:c1] += rng.randn()
    return (x - x.mean()) / x.std()


def build_student(shape, y, noise_var, grad_prior):
    return (
        GaussianPrior(size=shape) @
        SIMOVariable(id="x", n_next=2) @ (
            GaussianChannel(var=noise_var) @ O("y") + (
                GradientChannel(shape=shape) + grad_prior
            ) @ MILeafVariable(id="x'", n_prev=2)
        )
    ).to_model().to_observed({"y": jnp.asarray(y)})


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true")
    p.add_argument("--tv", action="store_true",
                   help="MAP-L21 (TV) gradient prior instead of GaussBernoulli")
    args = p.parse_args()
    H = W = 64 if args.big else 32
    noise_var = 0.1
    rng = np.random.RandomState(0)
    x0 = make_image(H, W, rng)
    y = x0 + np.sqrt(noise_var) * rng.randn(H, W)

    # gradient-prior hyperparameters matched to the teacher's gradient
    # statistics (as the reference tunes them to the raccoon's histograms,
    # plot_raccoon_denoise.py "hyperparam for grad x")
    g = np.stack(np.gradient(x0))
    nz = np.abs(g) > 0.05
    grad_shape = (2, H, W)
    if args.tv:
        # gamma=1 as the reference (plot_raccoon_denoise.py:140)
        grad_prior = MAP_L21NormPrior(size=grad_shape, gamma=1.0, axis=0)
    else:
        grad_prior = GaussBernoulliPrior(
            size=grad_shape, rho=float(nz.mean()), var=float(g[nz].var()))
    student = build_student((H, W), y, noise_var, grad_prior)

    ep = ExpectationPropagation(student)
    if args.tv:
        # a = b = 1 init: EP on the MAP-L21 denoiser diverges from zero
        # init (reference plot_raccoon_denoise.py: "We need to set initial
        # conditions a = b = 1")
        ep.iterate(max_iter=100, damping=0.0,
                   initializer=ConstantInit(a=1, b=1))
    else:
        ep.iterate(max_iter=200, damping=0.1, callback=EarlyStoppingEP())
    x_hat = np.asarray(ep.get_variable_data("x")["r"])
    mse_y = float(np.mean((y - x0) ** 2))
    mse = float(np.mean((x_hat - x0) ** 2))
    # pure-Gaussian-prior baseline: shrinkage mse ~ noise/(1+noise)
    mse_gauss = noise_var / (1 + noise_var)
    print(f"noisy mse={mse_y:.4f} gaussian-prior mse~{mse_gauss:.4f} -> "
          f"denoised mse={mse:.4f} "
          f"({'TV' if args.tv else 'sparse-gradient'} prior)")
    assert mse < mse_gauss, "edge prior should beat plain Gaussian shrinkage"


if __name__ == "__main__":
    main()
