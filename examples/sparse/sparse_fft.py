"""Sparse FFT: recover a signal sparse in Fourier space from noisy samples.

Reference analog: examples/sparse/plot_sparse_fft.py:21-116.

Teacher: x(t) = cos(t) + sin(2t) sampled on N points, y = x + noise.
Student: Gaussian prior on x feeding BOTH a Gaussian likelihood on y and a
DFT channel whose output z carries a Gauss-Bernoulli (sparse) prior —
a SIMO variable x and a MI leaf z, exactly the reference's tree.
"""
import argparse
import os

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tramp_tpu.variables import (
    SISOVariable as V, SILeafVariable as O, SIMOVariable, MILeafVariable)
from tramp_tpu.channels import DFTChannel, GaussianChannel
from tramp_tpu.priors import GaussBernoulliPrior, GaussianPrior
from tramp_tpu.algos import EarlyStoppingEP
from tramp_tpu.experiments import TeacherStudentScenario


class SparseFFTTeacher:
    "Deterministic signal + Gaussian observation noise (reference l:21-42)."

    def __init__(self, N, noise_var):
        self.t = np.linspace(-2 * np.pi, 2 * np.pi, N, endpoint=False)
        self.noise_var = noise_var
        self.N = N

    def sample(self, key=None):
        "Accepts a jax PRNGKey or an int seed (scenario passes a key)."
        x = np.cos(self.t) + np.sin(2 * self.t)
        z = np.asarray(DFTChannel(real=True).sample(None, jnp.asarray(x)))
        if key is None:
            key = jax.random.PRNGKey(0)
        elif isinstance(key, int):
            key = jax.random.PRNGKey(key)
        noise = np.asarray(jax.random.normal(key, (self.N,)))
        y = x + np.sqrt(self.noise_var) * noise
        return {"x": x, "z": z, "y": y}


def build_student(N, prior_var, rho, fft_var, noise_var):
    return (
        GaussianPrior(size=(N,), var=prior_var) @
        SIMOVariable(id="x", n_next=2) @ (
            GaussianChannel(var=noise_var) @ O("y") + (
                DFTChannel(real=True) +
                GaussBernoulliPrior(size=(2, N), var=fft_var, rho=rho)
            ) @
            MILeafVariable(id="z", n_prev=2)
        )
    ).to_model()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--plot", action="store_true")
    args = p.parse_args()
    # reference parameters (plot_sparse_fft.py:97-98)
    N, rho, noise_var, seed = 100, 0.02, 0.1, 1
    prior_var, fft_var = 1.0, 18.75

    teacher = SparseFFTTeacher(N, noise_var)
    student = build_student(N, prior_var, rho, fft_var, noise_var)
    scenario = TeacherStudentScenario(teacher, student, x_ids=["x", "z"])
    scenario.setup(seed=seed)
    scenario.run_ep(max_iter=1000, damping=0.1,
                    callback=EarlyStoppingEP(tol=1e-2))
    mse_x = float(np.mean((scenario.x_pred["x"] - scenario.x_true["x"]) ** 2))
    mse_z = float(np.mean((scenario.x_pred["z"] - scenario.x_true["z"]) ** 2))
    noise_floor = noise_var
    print(f"mse(x)={mse_x:.4f} mse(z)={mse_z:.4f} "
          f"(noise var {noise_floor}; EP should beat the noise floor on x)")
    assert mse_x < noise_floor, "sparse-FFT denoising should beat raw noise"

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        out = os.path.join(os.path.dirname(__file__), "output")
        os.makedirs(out, exist_ok=True)
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        axes[0].plot(scenario.observations["y"], "C2x", label="y")
        axes[1].plot(scenario.x_true["x"], label="x*")
        axes[1].plot(scenario.x_pred["x"], label="x hat")
        axes[2].stem(scenario.x_true["z"][1], markerfmt="C0o", linefmt="C0-")
        axes[2].stem(scenario.x_pred["z"][1], markerfmt="C1x", linefmt="C1:")
        axes[2].set_xlim(0, 25)
        for ax in axes[:2]:
            ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(out, "sparse_fft.png"), dpi=120)
        print(f"wrote {out}/sparse_fft.png")


if __name__ == "__main__":
    main()
