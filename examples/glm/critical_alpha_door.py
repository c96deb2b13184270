"""Phase boundaries of the symmetric-door GLM via SE bisection.

Reference analog: tramp/experiments/critical_alpha.py driven by
examples/glm/data/door_critical_lines.py (a0=0.1, p_pos=0.51, width grid).
Finds, for the width-1.5 door, the alpha above which the weakly-informed
SE leaves the random (uninformative) fixed point ("random" criterion,
reference value 0.4621) and the alpha where it reaches perfect recovery
("perfect" criterion, reference value 2.2428) — then a whole critical
line over the prior bias p_pos with the batched search (one vmapped SE
solve per bisection level).
"""
import jax
jax.config.update("jax_enable_x64", True)  # SE sweeps need f64 quadrature accuracy
from tramp_tpu import glm_state_evolution
from tramp_tpu.experiments import (
    find_critical_alpha, find_critical_alpha_batched)


def main():
    for criterion, ref in (("random", 0.46214599609375),
                           ("perfect", 2.24278564453125)):
        alpha_c = find_critical_alpha(
            id="x", a0=0.1, mse_criterion=criterion,
            alpha_min=0.1, alpha_max=3.0, alpha_tol=1e-3,
            model_builder=glm_state_evolution,
            prior_type="binary", output_type="door", output_width=1.5,
            prior_p_pos=0.51)
        print(f"critical alpha (door width=1.5, {criterion}): "
              f"{alpha_c:.4f}  (reference CSV: {ref:.4f})")

    # a whole critical line over the prior bias, batched: p_pos is a traced
    # leaf of BinaryPrior, so every bisection level is ONE vmapped SE solve
    p_pos = [0.51, 0.6, 0.7, 0.8]
    line = find_critical_alpha_batched(
        id="x", a0=0.1, mse_criterion="perfect",
        alpha_min=0.1, alpha_max=3.0, alpha_tol=1e-3,
        model_builder=glm_state_evolution,
        grid_kwargs={"prior_p_pos": p_pos},
        prior_type="binary", output_type="door", output_width=1.5)
    for p, a in zip(p_pos, line):
        print(f"  p_pos={p:.2f}: alpha_c={a:.4f}")


if __name__ == "__main__":
    main()
