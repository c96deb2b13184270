"""GLM builders. Reference tramp/models/generalized_linear_model.py."""
import jax

from ..channels import get_channel
from ..priors import get_prior
from ..ensembles import get_ensemble
from ..likelihoods import get_likelihood
from ..variables import SISOVariable as V, SILeafVariable as O


def get_kwargs(target, kwargs):
    "Prefix-routed kwargs (prior_*, output_*, ensemble_*). Reference l:8-14."
    n = len(target) + 1
    return {k[n:]: v for k, v in kwargs.items() if k.startswith(target)}


def glm_generative(N, alpha, ensemble_type, prior_type, output_type,
                   key=None, **kwargs):
    "Generative GLM: prior @ x @ linear @ z @ output @ y. Reference l:17-35."
    M = int(alpha * N)
    ensemble_kwargs = get_kwargs("ensemble", kwargs)
    ensemble = get_ensemble(ensemble_type, M=M, N=N, **ensemble_kwargs)
    F = ensemble.generate(key if key is not None else jax.random.PRNGKey(0))
    prior_kwargs = get_kwargs("prior", kwargs)
    size = (2, N) if output_type == "modulus" else N
    prior = get_prior(size=size, prior_type=prior_type, **prior_kwargs)
    linear_type = "complex_linear" if output_type == "modulus" else "linear"
    linear = get_channel(linear_type, W=F, name="F")
    output_kwargs = get_kwargs("output", kwargs)
    output = get_channel(channel_type=output_type, **output_kwargs)
    model = (
        prior @ V(id="x") @ linear @ V(id="z") @ output @ O(id="y")
    ).to_model()
    return model


def glm_state_evolution(alpha, prior_type, output_type, **kwargs):
    "SE-only GLM with Marchenko-Pastur linear channel. Reference l:38-55."
    prior_kwargs = get_kwargs("prior", kwargs)
    prior = get_prior(size=1, prior_type=prior_type, **prior_kwargs)
    linear = get_channel("marchenko", alpha=alpha, name="F")
    output_kwargs = get_kwargs("output", kwargs)
    output = get_likelihood(
        y=None, y_name="y", likelihood_type=output_type, **output_kwargs)
    model = (prior @ V(id="x") @ linear @ V(id="z") @ output).to_model()
    return model
