"""High-dimensional concentration checks: finite-N instance averages must
concentrate onto the ensemble (state evolution) averages.
Reference tramp/checks/check_high_dim.py:9-60."""
import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp


def check_prior_concentration(prior_builder, N_values=(100, 1000, 10000),
                              ax=1.2, seed=0):
    """For increasing N, the instance average of the prior's scalar forward
    variance over b ~ beliefs_measure must approach compute_forward_error."""
    records = []
    for N in N_values:
        prior = prior_builder(N)
        ensemble_v = float(prior.compute_forward_error(ax))
        # instance: sample x0 ~ prior, b = ax*x0 + sqrt(ax)*xi
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        x0 = prior.sample(k1)
        b = ax * x0 + jnp.sqrt(ax) * jax.random.normal(k2, x0.shape)
        inst_v = float(jnp.mean(prior.scalar_forward_variance(ax, b)))
        records.append(dict(N=N, ensemble_v=ensemble_v, instance_v=inst_v,
                            err=abs(ensemble_v - inst_v)))
    return pd.DataFrame(records)
