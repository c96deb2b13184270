"""Phase-boundary search. Reference tramp/experiments/critical_alpha.py."""
import logging

import numpy as np

from ..algos import StateEvolution, CustomInit

logger = logging.getLogger(__name__)


def binary_search(f, xmin, xmax, xtol):
    "Binary search on boolean f, assuming f(xmin)=0 and f(xmax)=1. Ref l:7-28."
    ymin, ymax = f(xmin), f(xmax)
    if not (ymin == 0 and ymax == 1):
        raise ValueError(f"Bad bounds: ymin={ymin} and ymax={ymax}")
    max_iter = int(np.log2((xmax - xmin) / xtol)) + 2
    xmid = 0.5 * (xmin + xmax)
    for n_iter in range(1, max_iter + 1):
        xmid = 0.5 * (xmin + xmax)
        ymid = f(xmid)
        xerr = xmax - xmin
        logger.info(f"binary search {n_iter}/{max_iter} xerr={xerr}")
        if xerr < xtol:
            break
        if ymid == 0:
            xmin, ymin = xmid, ymid
        else:
            xmax, ymax = xmid, ymid
    assert ymin == 0 and ymax == 1
    assert xerr < xtol
    return dict(xmid=xmid, xmin=xmin, xmax=xmax, xerr=xerr, n_iter=n_iter)


def find_state_evolution_mse(id, a0, alpha, model_builder, **model_kwargs):
    "SE mse of variable `id` with informed init a0. Reference l:31-57."
    model = model_builder(alpha=alpha, **model_kwargs)
    initializer = CustomInit(a_init=[(id, "bwd", a0)])
    se = StateEvolution(model)
    se.iterate(max_iter=200, initializer=initializer)
    return float(np.mean(se.get_variable_data(id=id)["v"]))


def find_critical_alpha(id, a0, mse_criterion, alpha_min, alpha_max,
                        model_builder, alpha_tol=1e-6, vtol=1e-3,
                        **model_kwargs):
    "Binary search for the critical measurement density. Reference l:60-109."
    if mse_criterion == "perfect":
        def mse_criterion(v):
            return abs(v) < vtol
    elif mse_criterion == "random":
        model = model_builder(alpha=0.5, **model_kwargs)
        tau_x = float(model.get_second_moments()[id])

        def mse_criterion(v):
            return abs(v - tau_x) > vtol

    def f(alpha):
        v = find_state_evolution_mse(
            id, a0, alpha, model_builder, **model_kwargs)
        return mse_criterion(v)

    search = binary_search(f, alpha_min, alpha_max, alpha_tol)
    return search["xmid"]
