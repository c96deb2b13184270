"""Image deblurring: y = blur(x) + noise, Gaussian image prior.

Reference analog: examples/sparse/plot_raccoon_deconv.py:60-82 (Gaussian
prior deconvolution of the blurred raccoon; here a synthetic standardized
image, since the gallery must run offline). The companion sparse-gradient
prior is exercised on the regression task in sparse_gradient.py, as in the
reference's plot_raccoon_denoise.py / plot_sparse_gradient.py.
"""
import argparse
import os

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)  # f64 for CPU parity
import jax.numpy as jnp

from tramp_tpu.variables import SISOVariable as V, SILeafVariable as O
from tramp_tpu.priors import GaussianPrior
from tramp_tpu.channels import Blur2DChannel, GaussianChannel
from tramp_tpu.algos import ExpectationPropagation


def make_image(H, W, rng):
    "Piecewise-constant blocks, standardized like the reference raccoon."
    x = np.zeros((H, W))
    for _ in range(6):
        r0, c0 = rng.randint(0, H - 4), rng.randint(0, W - 4)
        r1, c1 = rng.randint(r0 + 2, H), rng.randint(c0 + 2, W)
        x[r0:r1, c0:c1] += rng.randn()
    return (x - x.mean()) / x.std()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true")
    args = p.parse_args()
    H = W = 64 if args.big else 32
    rng = np.random.RandomState(0)
    x0 = make_image(H, W, rng)
    # reference: sigma=[10,10] on the 768x1024 raccoon; scale to image size
    sigma = H / 16.0
    noise_var = 0.1

    blur = Blur2DChannel(sigma=(sigma, sigma), shape=(H, W))
    y = np.asarray(blur.sample(None, jnp.asarray(x0)))
    y = y + np.sqrt(noise_var) * rng.randn(H, W)

    model = (
        GaussianPrior(size=(H, W)) @ V(id="x") @
        Blur2DChannel(sigma=(sigma, sigma), shape=(H, W)) @ V(id="z") @
        GaussianChannel(var=noise_var) @ O(id="y")
    ).to_model().to_observed({"y": jnp.asarray(y)})

    ep = ExpectationPropagation(model)
    ep.iterate(max_iter=100)
    r = np.asarray(ep.get_variable_data("x")["r"])
    mse_blurred = float(np.mean((y - x0) ** 2))
    mse_ep = float(np.mean((r - x0) ** 2))
    print(f"{H}x{W} deblur: observation mse={mse_blurred:.3e} "
          f"EP mse={mse_ep:.3e}")
    assert mse_ep < mse_blurred

    out = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(out, exist_ok=True)
    np.savez(os.path.join(out, "deconvolution.npz"), x0=x0, y=y, r=r)
    print(f"wrote {out}/deconvolution.npz")


if __name__ == "__main__":
    main()
