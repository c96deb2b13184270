"""Marchenko-Pastur analytic spectral ensemble.
Reference tramp/ensembles/marchenko_pastur_ensemble.py:6-52."""
import numpy as np
import jax
import jax.numpy as jnp


class MarchenkoPasturEnsemble:

    def __init__(self, alpha):
        self.alpha = alpha
        self.z_max = (1 + np.sqrt(alpha)) ** 2
        self.z_min = (1 - np.sqrt(alpha)) ** 2
        self.mean_spectrum = self.measure(lambda z: z)

    def __repr__(self):
        return f"MarchenkoPasturEnsemble(alpha={self.alpha})"

    def generate(self, key=None, N=1000):
        key = jax.random.PRNGKey(0) if key is None else key
        M = int(self.alpha * N)
        return jax.random.normal(key, (M, N)) / jnp.sqrt(N)

    def bulk_density(self, z):
        return jnp.sqrt((z - self.z_min) * (self.z_max - z)) / (2 * jnp.pi * z)

    def measure(self, f, n_nodes=400):
        "Atomic part + bulk integral (composite midpoint over the bulk)."
        from ..utils.integration import composite_gauss_legendre
        atomic = max(0.0, 1.0 - self.alpha) * f(0.0)
        x, w = composite_gauss_legendre(
            float(self.z_min), float(self.z_max), 20, 20)
        x = jnp.asarray(x)
        w = jnp.asarray(w)
        bulk = jnp.sum(w * f(x) * self.bulk_density(x))
        return atomic + bulk

    def compute_F(self, gamma):
        return (jnp.sqrt(gamma * self.z_max + 1)
                - jnp.sqrt(gamma * self.z_min + 1)) ** 2

    def eta_transform(self, gamma):
        F = self.compute_F(gamma)
        return 1 - F / (4 * jnp.maximum(gamma, 1e-30))

    def shannon_transform(self, gamma):
        F = self.compute_F(gamma)
        return (jnp.log(1 + self.alpha * gamma - F / 4)
                + self.alpha * jnp.log(1 + gamma - F / 4)
                - F / (4 * gamma))
