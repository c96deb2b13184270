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


def find_critical_alpha_batched(id, a0, mse_criterion, alpha_min, alpha_max,
                                model_builder, alpha_tol=1e-6, vtol=1e-3,
                                grid_kwargs=None, max_iter=200,
                                **model_kwargs):
    """Vectorized phase-boundary search: a whole family of critical lines
    in one batched bisection.

    The reference computes each grid line with an independent sequential
    binary search (tramp/experiments/critical_alpha.py:60-109 driven by the
    save_experiments for-loop); here every bisection *level* is ONE vmapped
    SE solve over all lines simultaneously — alpha is a traced pytree leaf
    of MarchenkoPasturChannel, so the stacked models compile to a single
    fused while_loop.

    Parameters
    ----------
    grid_kwargs : dict of per-line lists (all the same length L), e.g.
        ``{"prior_rho": np.linspace(0.05, 0.95, 19)}``. Each kwarg must be
        a traced (data-leaf) constructor argument of its factor, so the L
        models stack into one pytree. Static kwargs (e.g. ``output_width``)
        go in ``model_kwargs`` and are shared by all lines.
    mse_criterion : "perfect" | "random" | callable v -> bool array.

    Returns an np.ndarray of L critical alphas, identical to running the
    sequential ``find_critical_alpha`` per line (same bisection schedule:
    the midpoint of the first bracket narrower than ``alpha_tol``).
    """
    import jax.numpy as jnp
    from ..parallel.solver import SESolver, stack_pytrees

    grid_kwargs = dict(grid_kwargs or {})
    L = len(next(iter(grid_kwargs.values()))) if grid_kwargs else 1

    def kwargs_for(line):
        kw = dict(model_kwargs)
        kw.update({k: v[line] for k, v in grid_kwargs.items()})
        return kw

    def build(alphas):
        models = [model_builder(alpha=float(alphas[l]), **kwargs_for(l))
                  for l in range(L)]
        return stack_pytrees(models)

    rep = model_builder(alpha=0.5 * (alpha_min + alpha_max), **kwargs_for(0))
    solver = SESolver(rep, max_iter=max_iter, tol=1e-6)
    initializer = CustomInit(a_init=[(id, "bwd", a0)])

    if mse_criterion == "perfect":
        def mse_criterion(v):
            return np.abs(v) < vtol
    elif mse_criterion == "random":
        tau_x = np.array([
            float(model_builder(alpha=0.5, **kwargs_for(l))
                  .get_second_moments()[id]) for l in range(L)])

        def mse_criterion(v):
            return np.abs(v - tau_x) > vtol

    def f(alphas):
        "One vmapped SE solve over all L lines; returns bool array (L,)."
        post, _ = solver.solve_batch(build(alphas), initializer=initializer)
        v = np.asarray(jnp.reshape(post[id]["v"], (L, -1)).mean(axis=-1))
        return np.asarray(mse_criterion(v), dtype=bool)

    lo = np.full(L, float(alpha_min))
    hi = np.full(L, float(alpha_max))
    y_lo, y_hi = f(lo), f(hi)
    if y_lo.any() or not y_hi.all():
        bad = np.nonzero(y_lo | ~y_hi)[0]
        raise ValueError(
            f"Bad bounds on lines {bad.tolist()}: ymin={y_lo[bad].tolist()} "
            f"ymax={y_hi[bad].tolist()}")
    max_levels = int(np.log2((alpha_max - alpha_min) / alpha_tol)) + 2
    for level in range(1, max_levels + 1):
        if (hi - lo).max() < alpha_tol:
            break
        mid = 0.5 * (lo + hi)
        y = f(mid)
        logger.info(f"batched bisection {level}/{max_levels} "
                    f"xerr={(hi - lo).max()}")
        lo = np.where(y, lo, mid)
        hi = np.where(y, mid, hi)
    assert (hi - lo).max() < alpha_tol
    return 0.5 * (lo + hi)
