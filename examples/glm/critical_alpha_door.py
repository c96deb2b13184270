"""Phase boundary of the symmetric-door GLM via SE bisection.

Reference analog: tramp/experiments/critical_alpha.py used by the door
scripts in examples/tmp/. Finds the critical measurement ratio above which
SE (seeded with an informed initialization) reaches perfect recovery.
"""
import jax
jax.config.update("jax_enable_x64", True)  # SE sweeps need f64 quadrature accuracy
from tramp_tpu import glm_state_evolution
from tramp_tpu.experiments import find_critical_alpha


def main():
    alpha_c = find_critical_alpha(
        id="x", a0=1e3, mse_criterion="perfect",
        alpha_min=0.5, alpha_max=3.0, alpha_tol=1e-3,
        model_builder=glm_state_evolution,
        prior_type="binary", output_type="door", output_width=1.5)
    print(f"critical alpha (door, width=1.5, binary prior): {alpha_c:.4f}")


if __name__ == "__main__":
    main()
