"""VAE generative prior: a trained VAE decoder as a multi-layer prior block
for inpainting/denoising. Reference examples/vae_prior/plot_vae.py:100-160.

Weights come from an .h5 file with a Keras-style 'decoder' group (the
reference ships MNIST/FashionMNIST weights under
examples/vae_prior/weights_vae/<type>/vae_<type>_<id>.h5)."""
import numpy as np
import jax.numpy as jnp

from ..variables import SISOVariable as V
from ..priors import GaussianPrior
from ..channels import (
    LinearChannel, BiasChannel, LeakyReluChannel, HardTanhChannel,
    ReshapeChannel,
)


def load_vae_decoder_weights(path):
    "Load (biases, weights) from a Keras VAE decoder .h5 file."
    import h5py
    with h5py.File(path, "r") as file:
        decoder = file["decoder"]
        layers = [decoder[key] for key in list(decoder.keys())]
        weights = [np.asarray(layer["kernel:0"][()]).T for layer in layers]
        try:
            biases = [np.asarray(layer["bias:0"][()]) for layer in layers]
        except Exception:
            biases = []
    return biases, weights


def vae_prior_block(weights, biases, latent_dim=20, output_shape=784):
    """Decoder-as-prior DAG block:
    N(0,1)^D @ z0 @ W1 + b1 @ leaky-relu(0) @ W2 + b2 @ hard-tanh @ reshape.
    Reference plot_vae.py:125-136 (id '20_relu_400_sigmoid_784_bias')."""
    W1, W2 = (jnp.asarray(w) for w in weights)
    b1, b2 = (jnp.asarray(b) for b in biases)
    D = latent_dim
    assert W1.shape[1] == D
    N = W2.shape[0]
    prior_x = (
        GaussianPrior(size=D) @ V(id="z_0") @
        LinearChannel(W1, name="W_1") @ V(id="Wz_1") @
        BiasChannel(b1) @ V(id="b_1") @
        LeakyReluChannel(0.0) @ V(id="z_1") @
        LinearChannel(W2, name="W_2") @ V(id="Wz_2") @
        BiasChannel(b2) @ V(id="b_2") @
        HardTanhChannel() @ V(id="z_2") @
        ReshapeChannel(prev_shape=N, next_shape=output_shape)
    )
    return prior_x


def vae_prior_from_h5(path, latent_dim=20, output_shape=784):
    biases, weights = load_vae_decoder_weights(path)
    return vae_prior_block(weights, biases, latent_dim=latent_dim,
                           output_shape=output_shape)
