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


def check_prior_grad_BO(prior, mx_hat_values=None, tx0_hat=1.0):
    """BO potential gradient: mx = 2 dA_BO/dm_hat with
    A_BO(m_hat) = potential_BO(ax=m_hat+t0_hat).
    Reference check_gradients.py:165-196."""
    mx_hat_values = (mx_hat_values if mx_hat_values is not None
                     else np.linspace(1.0, 3.0, 10))
    records = []
    for mx_hat in mx_hat_values:
        mx_hat = float(mx_hat)

        def A(m_hat):
            return prior.compute_potential_BO(ax=m_hat + tx0_hat,
                                              tx0_hat=tx0_hat)

        dm = float(jax.grad(A)(mx_hat))
        vx = float(prior.compute_forward_v_BO(mx_hat + tx0_hat, tx0_hat))
        tx = float(prior.forward_second_moment_FG(tx0_hat))
        mx = tx - vx
        records.append(dict(mx_hat=mx_hat, mx=mx, vx=vx, tx=tx,
                            two_dA_dmhat=2 * dm, m_err=abs(mx - 2 * dm)))
    return pd.DataFrame(records)


def check_prior_grad_BO_BN(prior, ax_values=None):
    """Bayesian-network limit: mx = 2 dA/dax, vx = 2 dI/dax.
    Reference check_gradients.py:199-229."""
    ax_values = ax_values if ax_values is not None else np.linspace(1, 3, 10)
    records = []
    for ax in ax_values:
        ax = float(ax)
        dA = float(jax.grad(lambda a: prior.compute_free_energy(a))(ax))
        dI = float(jax.grad(
            lambda a: prior.compute_mutual_information(a))(ax))
        mx = float(prior.compute_forward_overlap(ax))
        vx = float(prior.compute_forward_error(ax))
        records.append(dict(ax=ax, mx=mx, vx=vx, two_dA_dax=2 * dA,
                            two_dI_dax=2 * dI, m_err=abs(mx - 2 * dA),
                            v_err=abs(vx - 2 * dI)))
    return pd.DataFrame(records)


def check_prior_grad_FG(prior, tx_hat_values=None):
    """Factor-graph potential: tau_x = -2 dA_FG/dt_hat.
    Reference check_gradients.py:232-258."""
    tx_hat_values = (tx_hat_values if tx_hat_values is not None
                     else np.linspace(1, 3, 10))
    records = []
    for tx_hat in tx_hat_values:
        tx_hat = float(tx_hat)
        dA = float(jax.grad(lambda t: prior.prior_log_partition_FG(t))(
            tx_hat))
        tx = float(prior.forward_second_moment_FG(tx_hat))
        records.append(dict(tx_hat=tx_hat, tx=tx, minus2_dA=-2 * dA,
                            t_err=abs(tx + 2 * dA)))
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


def check_likelihood_grad_BO(likelihood, mz_hat_values=None, tz0_hat=1.0):
    """BO potential gradient for a likelihood: mz = 2 dA_BO/dm_hat.
    Reference check_gradients.py:408-435."""
    mz_hat_values = (mz_hat_values if mz_hat_values is not None
                     else np.linspace(1.0, 3.0, 10))
    records = []
    for mz_hat in mz_hat_values:
        mz_hat = float(mz_hat)

        def A(m_hat):
            return likelihood.compute_potential_BO(az=m_hat + tz0_hat,
                                                   tz0_hat=tz0_hat)

        dm = float(jax.grad(A)(mz_hat))
        vz = float(likelihood.compute_backward_v_BO(mz_hat + tz0_hat,
                                                    tz0_hat))
        tz = float(likelihood.backward_second_moment_FG(tz0_hat))
        mz = tz - vz
        records.append(dict(mz_hat=mz_hat, mz=mz, vz=vz, tz=tz,
                            two_dA_dmhat=2 * dm, m_err=abs(mz - 2 * dm)))
    return pd.DataFrame(records)


def check_likelihood_grad_BO_BN(likelihood, az_values=None, tau_z=1.0):
    """Bayesian-network limit for a likelihood: mz = 2 dA/daz.
    Reference check_gradients.py:438-470."""
    az_values = (az_values if az_values is not None
                 else np.linspace(1.1, 3.0, 10))
    records = []
    for az in az_values:
        az = float(az)
        dA = float(jax.grad(
            lambda a: likelihood.compute_free_energy(a, tau_z))(az))
        mz = float(likelihood.compute_backward_overlap(az, tau_z))
        records.append(dict(az=az, mz=mz, two_dA_daz=2 * dA,
                            m_err=abs(mz - 2 * dA)))
    return pd.DataFrame(records)


def check_likelihood_grad_RS(teacher, student, mz_hat=1.2, qz_hat=0.8,
                             tz0_hat=1.0):
    """RS gradients for a likelihood: m = dA/dm_hat, q = -2 dA/dq_hat.
    Reference check_gradients.py:366-405."""
    def A(m_hat, q_hat):
        az = q_hat
        return student.compute_potential_RS(az, m_hat, q_hat, teacher,
                                            tz0_hat)

    dm = float(jax.grad(A, argnums=0)(mz_hat, qz_hat))
    dq = float(jax.grad(A, argnums=1)(mz_hat, qz_hat))
    vz, mz, qz = student.compute_backward_vmq_RS(
        qz_hat, mz_hat, qz_hat, teacher, tz0_hat)
    return pd.DataFrame([dict(
        m=float(mz), dA_dmhat=dm, q=float(qz), minus2_dA_dqhat=-2 * dq,
        m_err=abs(float(mz) - dm), q_err=abs(float(qz) + 2 * dq))])


# -- plot twins (reference check_gradients.py plot_* functions) -----------

def _plot_pairs(df, x, pairs, title):
    import matplotlib.pyplot as plt
    fig, axs = plt.subplots(1, len(pairs), figsize=(4 * len(pairs), 4),
                            squeeze=False)
    for ax_, (solid, dashed, label) in zip(axs[0], pairs):
        ax_.plot(df[x], df[solid], "-", label=solid)
        ax_.plot(df[x], df[dashed], "--", label=label)
        ax_.set(xlabel=x)
        ax_.legend()
    fig.suptitle(title)
    fig.tight_layout(rect=[0, 0.03, 1, 0.92])
    return fig


def plot_prior_grad_EP(prior, **kw):
    df = check_prior_grad_EP(prior, **kw)
    return _plot_pairs(df, "bx", [("r", "A1", r"$\partial_b A$"),
                                  ("v", "A2", r"$\partial_b^2 A$")],
                       repr(prior))


def plot_prior_grad_BO(prior, **kw):
    df = check_prior_grad_BO(prior, **kw)
    return _plot_pairs(
        df, "mx_hat",
        [("mx", "two_dA_dmhat", r"$2\partial_{\hat m} A$")], repr(prior))


def plot_prior_grad_BO_BN(prior, **kw):
    df = check_prior_grad_BO_BN(prior, **kw)
    return _plot_pairs(
        df, "ax", [("mx", "two_dA_dax", r"$2\partial_{a} A$"),
                   ("vx", "two_dI_dax", r"$2\partial_{a} I$")], repr(prior))


def plot_prior_grad_FG(prior, **kw):
    df = check_prior_grad_FG(prior, **kw)
    return _plot_pairs(
        df, "tx_hat",
        [("tx", "minus2_dA", r"$-2\partial_{\hat\tau} A$")], repr(prior))


def plot_likelihood_grad_EP(likelihood, **kw):
    df = check_likelihood_grad_EP(likelihood, **kw)
    return _plot_pairs(df, "bz", [("r", "A1", r"$\partial_b A$"),
                                  ("v", "A2", r"$\partial_b^2 A$")],
                       repr(likelihood))


def plot_likelihood_grad_BO(likelihood, **kw):
    df = check_likelihood_grad_BO(likelihood, **kw)
    return _plot_pairs(
        df, "mz_hat",
        [("mz", "two_dA_dmhat", r"$2\partial_{\hat m} A$")],
        repr(likelihood))


def plot_likelihood_grad_BO_BN(likelihood, **kw):
    df = check_likelihood_grad_BO_BN(likelihood, **kw)
    return _plot_pairs(
        df, "az", [("mz", "two_dA_daz", r"$2\partial_{a} A$")],
        repr(likelihood))


def check_likelihood_grad_FG(likelihood, tz_hat_values=None):
    """Factor-graph potential of a likelihood: tau_z = -2 dA_FG/dt_hat.
    Reference check_gradients.py (likelihood FG section)."""
    tz_hat_values = (tz_hat_values if tz_hat_values is not None
                     else np.linspace(1, 3, 10))
    records = []
    for tz_hat in tz_hat_values:
        tz_hat = float(tz_hat)
        dA = float(jax.grad(
            lambda t: likelihood.prior_log_partition_FG(t))(tz_hat))
        tz = float(likelihood.backward_second_moment_FG(tz_hat))
        records.append(dict(tz_hat=tz_hat, tz=tz, minus2_dA=-2 * dA,
                            t_err=abs(tz + 2 * dA)))
    return pd.DataFrame(records)


def plot_likelihood_grad_FG(likelihood, **kw):
    df = check_likelihood_grad_FG(likelihood, **kw)
    return _plot_pairs(
        df, "tz_hat",
        [("tz", "minus2_dA", r"$-2\partial_{\hat\tau} A$")],
        repr(likelihood))


def plot_prior_grad_RS(teacher, student, **kw):
    import matplotlib.pyplot as plt
    df = check_prior_grad_RS(teacher, student, **kw)
    fig, ax_ = plt.subplots(figsize=(4, 4))
    ax_.bar(["m_err", "q_err"], [df["m_err"].iloc[0], df["q_err"].iloc[0]])
    ax_.set(title="RS gradient identity errors")
    return fig


def plot_likelihood_grad_RS(teacher, student, **kw):
    import matplotlib.pyplot as plt
    df = check_likelihood_grad_RS(teacher, student, **kw)
    fig, ax_ = plt.subplots(figsize=(4, 4))
    ax_.bar(["m_err", "q_err"], [df["m_err"].iloc[0], df["q_err"].iloc[0]])
    ax_.set(title="RS gradient identity errors")
    return fig


# the reference distinguishes scalar and diagonal (vectorized) EP checks
# (check_gradients.py:279-365); the jnp kernels ARE the vectorized path, so
# both names exercise the same identities here.
check_prior_grad_EP_scalar = check_prior_grad_EP
check_prior_grad_EP_diagonal = check_prior_grad_EP
plot_prior_grad_EP_scalar = plot_prior_grad_EP
plot_prior_grad_EP_diagonal = plot_prior_grad_EP
check_likelihood_grad_EP_scalar = check_likelihood_grad_EP
check_likelihood_grad_EP_diagonal = check_likelihood_grad_EP
plot_likelihood_grad_EP_scalar = plot_likelihood_grad_EP
plot_likelihood_grad_EP_diagonal = plot_likelihood_grad_EP
