"""VAE-prior workload (BASELINE config 4): multi-layer dense+bias+activation
prior for denoising/inpainting. Uses the reference's committed MNIST VAE
decoder weights when present; otherwise random weights of the same shapes."""
import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tramp_tpu.models.vae_prior import vae_prior_block, vae_prior_from_h5
from tramp_tpu.variables import SISOVariable as V, SILeafVariable as O
from tramp_tpu.channels import GaussianChannel
from tramp_tpu.algos import ExpectationPropagation

REF_H5 = ("/root/reference/examples/vae_prior/weights_vae/mnist/"
          "vae_mnist_20_relu_400_sigmoid_784_bias.h5")


def _get_block():
    if os.path.exists(REF_H5):
        return vae_prior_from_h5(REF_H5)
    rng = np.random.RandomState(0)
    weights = [rng.randn(400, 20) / np.sqrt(20),
               rng.randn(784, 400) / np.sqrt(400)]
    biases = [rng.randn(400) * 0.01, rng.randn(784) * 0.01]
    return vae_prior_block(weights, biases)


def test_vae_prior_denoising():
    block = _get_block()
    noise_var = 0.05
    teacher = (block @ V(id="x") @
               GaussianChannel(var=noise_var) @ O(id="y")).to_model()
    sample = teacher.sample(jax.random.PRNGKey(0))
    assert sample["x"].shape == (784,)
    student = teacher.to_observed({"y": sample["y"]})
    ep = ExpectationPropagation(student)
    ep.iterate(max_iter=100, damping=0.3)
    r = np.asarray(ep.get_variable_data("x")["r"])
    mse = float(np.mean((r - np.asarray(sample["x"])) ** 2))
    mse_y = float(np.mean((np.asarray(sample["y"])
                           - np.asarray(sample["x"])) ** 2))
    # denoised estimate must beat the raw observation
    assert mse < 0.6 * mse_y, (mse, mse_y)


@pytest.mark.skipif(not os.path.exists(REF_H5),
                    reason="reference VAE weights not present")
def test_vae_prior_reference_weights_shapes():
    block = vae_prior_from_h5(REF_H5)
    model = (block @ O(id="x")).to_model()
    sample = model.sample(jax.random.PRNGKey(1))
    x = np.asarray(sample["x"])
    assert x.shape == (784,)
    # hard-tanh output in [-1, 1]
    assert x.min() >= -1.0 - 1e-6 and x.max() <= 1.0 + 1e-6
