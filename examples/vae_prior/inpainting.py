"""Inpainting with a trained VAE decoder as generative prior.

Reference analog: examples/vae_prior/plot_vae.py:100-160 (MNIST decoder
weights committed upstream). The observation erases a band of pixels; the
decoder prior hallucinates them back.

Uses the reference's committed weights when available, else random weights
of the same architecture (demo only).
"""
import argparse
import os

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)  # SE sweeps need f64 quadrature accuracy
import jax.numpy as jnp

from tramp_tpu.models.vae_prior import vae_prior_block, vae_prior_from_h5
from tramp_tpu.variables import SISOVariable as V, SILeafVariable as O
from tramp_tpu.channels import GaussianChannel
from tramp_tpu.algos import ExpectationPropagation

REF_H5 = ("/root/reference/examples/vae_prior/weights_vae/mnist/"
          "vae_mnist_20_relu_400_sigmoid_784_bias.h5")


def get_block():
    if os.path.exists(REF_H5):
        print(f"using reference weights {REF_H5}")
        return vae_prior_from_h5(REF_H5)
    print("reference weights not found: using random decoder weights")
    rng = np.random.RandomState(0)
    weights = [rng.randn(400, 20) / np.sqrt(20),
               rng.randn(784, 400) / np.sqrt(400)]
    biases = [rng.randn(400) * 0.01, rng.randn(784) * 0.01]
    return vae_prior_block(weights, biases)


def main():
    argparse.ArgumentParser().parse_args()
    block = get_block()
    noise_var = 0.01

    teacher = (block @ V(id="x") @
               GaussianChannel(var=noise_var) @ O(id="y")).to_model()
    sample = teacher.sample(jax.random.PRNGKey(4))
    x0 = np.asarray(sample["x"])

    # erase a 25% middle band; observed pixels are selected by a row-deleted
    # identity sensing matrix (reference plot_vae.py:186-227, 448-450)
    band = np.zeros(784, bool)
    n_rem = int(0.25 * 784)
    band[392 - n_rem // 2: 392 - n_rem // 2 + n_rem] = True
    F_obs = np.eye(784)[~band]
    y_obs = np.asarray(sample["y"])[~band]

    from tramp_tpu.channels import LinearChannel
    from tramp_tpu.likelihoods import GaussianLikelihood
    student = (block @ V(id="x") @
               LinearChannel(jnp.asarray(F_obs), name="F") @ V(id="z") @
               GaussianLikelihood(y=jnp.asarray(y_obs), var=noise_var)
               ).to_model()

    # NoisyInit breaks the deep decoder's symmetries; mse is reported
    # sign-symmetrically, both as in the reference (plot_vae.py:303-334).
    # NB: like the reference, EP only partially hallucinates the band --
    # verified side by side on identical data.
    from tramp_tpu.algos.initial_conditions import NoisyInit
    ep = ExpectationPropagation(student)
    ep.iterate(max_iter=200, damping=0.5, initializer=NoisyInit())
    r = np.asarray(ep.get_variable_data("x")["r"])

    mse_band = min(float(np.mean((r[band] - x0[band]) ** 2)),
                   float(np.mean((r[band] + x0[band]) ** 2)))
    mse_zero = float(np.mean(x0[band] ** 2))
    print(f"inpainting mse on erased band: {mse_band:.4f} "
          f"(trivial fill-zero mse {mse_zero:.4f})")

    out = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(out, exist_ok=True)
    np.savez(os.path.join(out, "inpainting.npz"),
             x0=x0, y_obs=y_obs, r=r, band=band)
    print(f"wrote {out}/inpainting.npz")


if __name__ == "__main__":
    main()
