"""High-dimensional concentration checks: finite-N instance averages must
concentrate onto the ensemble (state evolution) averages.
Reference tramp/checks/check_high_dim.py:9-260."""
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


def check_prior_BO_BN_high_dim(prior, n_samples=10, ax_values=None, seed=0):
    """Instance averages (posterior variance/overlap/mse/logZ on sampled
    BO-BN observations) vs ensemble averages.
    Reference check_high_dim.py:9-48."""
    ax_values = ax_values if ax_values is not None else np.linspace(1, 3, 10)
    key = jax.random.PRNGKey(seed)
    records = []
    for ax in ax_values:
        ax = float(ax)
        inst = []
        for s in range(n_samples):
            key, k1, k2 = jax.random.split(key, 3)
            x0 = prior.sample(k1)
            bx = ax * x0 + jnp.sqrt(ax) * jax.random.normal(k2, x0.shape)
            rx, vx = prior.compute_forward_posterior(ax, bx)
            inst.append(dict(
                vx=float(jnp.mean(vx)),
                mx=float(jnp.mean(x0 * rx)),
                qx=float(jnp.mean(rx**2)),
                mse_x=float(jnp.mean((x0 - rx) ** 2)),
                A=float(prior.compute_log_partition(ax, bx)
                        / np.prod(np.shape(x0))),
            ))
        inst = pd.DataFrame(inst).mean()
        vx_avg = float(prior.compute_forward_error(ax))
        A_avg = float(prior.compute_free_energy(ax))
        mx_avg = float(prior.second_moment()) - vx_avg
        records.append(dict(
            ax=ax, vx=inst["vx"], mx=inst["mx"], qx=inst["qx"],
            mse_x=inst["mse_x"], A=inst["A"],
            vx_avg=vx_avg, mx_avg=mx_avg, A_avg=A_avg))
    return pd.DataFrame(records)


def check_likelihood_BO_BN_high_dim(likelihood, n_samples=10, az_values=None,
                                    tau_z=1.0, seed=0):
    """Instance averages for a likelihood (z0 ~ N(0, tau_z), y = sample(z0),
    bz the BO message) vs ensemble averages.
    Reference check_high_dim.py:155-218."""
    az_values = (az_values if az_values is not None
                 else np.linspace(1.1, 3.0, 10))
    y_shape = jnp.shape(likelihood.y)
    key = jax.random.PRNGKey(seed)
    records = []
    for az in az_values:
        az = float(az)
        inst = []
        for s in range(n_samples):
            key, k1, k2, k3 = jax.random.split(key, 4)
            z0 = jnp.sqrt(tau_z) * jax.random.normal(k1, y_shape)
            y = likelihood.sample(k2, z0)
            bz = az * z0 + jnp.sqrt(az) * jax.random.normal(k3, y_shape)
            rz, vz = likelihood.compute_backward_posterior(az, bz, y)
            inst.append(dict(
                vz=float(jnp.mean(vz)),
                mz=float(jnp.mean(z0 * rz)),
                mse_z=float(jnp.mean((z0 - rz) ** 2)),
            ))
        inst = pd.DataFrame(inst).mean()
        vz_avg = float(likelihood.compute_backward_error(az, tau_z))
        mz_avg = tau_z - vz_avg
        records.append(dict(az=az, vz=inst["vz"], mz=inst["mz"],
                            mse_z=inst["mse_z"], vz_avg=vz_avg,
                            mz_avg=mz_avg))
    return pd.DataFrame(records)


def _plot_high_dim(df, x, pairs, title):
    import matplotlib.pyplot as plt
    fig, axs = plt.subplots(1, len(pairs), figsize=(4 * len(pairs), 4),
                            squeeze=False)
    for ax_, (inst, avg) in zip(axs[0], pairs):
        ax_.plot(df[x], df[inst], "x", label=f"{inst} (instance)")
        ax_.plot(df[x], df[avg], "-", label=f"{avg} (ensemble)")
        ax_.set(xlabel=x)
        ax_.legend()
    fig.suptitle(title)
    fig.tight_layout(rect=[0, 0.03, 1, 0.92])
    return fig


def plot_prior_BO_BN_high_dim(prior, n_samples=10, **kw):
    df = check_prior_BO_BN_high_dim(prior, n_samples, **kw)
    return _plot_high_dim(df, "ax", [("vx", "vx_avg"), ("mx", "mx_avg"),
                                     ("A", "A_avg")], repr(prior))


def plot_likelihood_BO_BN_high_dim(likelihood, n_samples=10, **kw):
    df = check_likelihood_BO_BN_high_dim(likelihood, n_samples, **kw)
    return _plot_high_dim(df, "az", [("vz", "vz_avg"), ("mz", "mz_avg")],
                          repr(likelihood))


def check_prior_RS_BN_high_dim(teacher, student, n_samples=10,
                               mx_hat_values=None, qx_hat=1.0, tx_hat=1.0,
                               seed=0):
    """RS instance-vs-ensemble: student posterior on teacher samples, with
    ax = qx_hat + tx_hat and tx0_hat -> 0 ensemble averages.
    Reference check_high_dim.py:72-122."""
    mx_hat_values = (mx_hat_values if mx_hat_values is not None
                     else np.linspace(1.0, 3.0, 8))
    key = jax.random.PRNGKey(seed)
    records = []
    for mx_hat in mx_hat_values:
        mx_hat = float(mx_hat)
        ax = qx_hat + tx_hat
        inst = []
        for s in range(n_samples):
            key, k1, k2 = jax.random.split(key, 3)
            x0 = teacher.sample(k1)
            bx = mx_hat * x0 + jnp.sqrt(qx_hat) * jax.random.normal(
                k2, x0.shape)
            rx, vx = student.compute_forward_posterior(ax, bx)
            inst.append(dict(vx=float(jnp.mean(vx)),
                             mx=float(jnp.mean(x0 * rx)),
                             qx=float(jnp.mean(rx**2))))
        inst = pd.DataFrame(inst).mean()
        vx_avg, mx_avg, qx_avg = student.compute_forward_vmq_RS(
            ax, mx_hat, qx_hat, teacher, 1e-9)
        records.append(dict(
            mx_hat=mx_hat, vx=inst["vx"], mx=inst["mx"], qx=inst["qx"],
            vx_avg=float(vx_avg), mx_avg=float(mx_avg),
            qx_avg=float(qx_avg)))
    return pd.DataFrame(records)


def plot_prior_RS_BN_high_dim(teacher, student, n_samples=10, **kw):
    df = check_prior_RS_BN_high_dim(teacher, student, n_samples, **kw)
    return _plot_high_dim(
        df, "mx_hat", [("vx", "vx_avg"), ("mx", "mx_avg"), ("qx", "qx_avg")],
        f"teacher={teacher}\nstudent={student}")


def check_likelihood_RS_BN_high_dim(teacher, student, n_samples=10,
                                    mz_hat_values=None, qz_hat=1.0,
                                    tz0_hat=1.0, seed=0):
    """RS instance-vs-ensemble on the likelihood side.
    Reference check_high_dim.py:222-260."""
    mz_hat_values = (mz_hat_values if mz_hat_values is not None
                     else np.linspace(1.0, 3.0, 8))
    y_shape = jnp.shape(student.y)
    tau_z = 1.0 / tz0_hat
    key = jax.random.PRNGKey(seed)
    records = []
    for mz_hat in mz_hat_values:
        mz_hat = float(mz_hat)
        az = qz_hat
        inst = []
        for s in range(n_samples):
            key, k1, k2, k3 = jax.random.split(key, 4)
            z0 = jnp.sqrt(tau_z) * jax.random.normal(k1, y_shape)
            y = teacher.sample(k2, z0)
            bz = mz_hat * z0 + jnp.sqrt(qz_hat) * jax.random.normal(
                k3, y_shape)
            rz, vz = student.compute_backward_posterior(az, bz, y)
            inst.append(dict(vz=float(jnp.mean(vz)),
                             mz=float(jnp.mean(z0 * rz)),
                             qz=float(jnp.mean(rz**2))))
        inst = pd.DataFrame(inst).mean()
        vz_avg, mz_avg, qz_avg = student.compute_backward_vmq_RS(
            az, mz_hat, qz_hat, teacher, tz0_hat)
        records.append(dict(
            mz_hat=mz_hat, vz=inst["vz"], mz=inst["mz"], qz=inst["qz"],
            vz_avg=float(vz_avg), mz_avg=float(mz_avg),
            qz_avg=float(qz_avg)))
    return pd.DataFrame(records)


def plot_likelihood_RS_BN_high_dim(teacher, student, n_samples=10, **kw):
    df = check_likelihood_RS_BN_high_dim(teacher, student, n_samples, **kw)
    return _plot_high_dim(
        df, "mz_hat", [("vz", "vz_avg"), ("mz", "mz_avg"), ("qz", "qz_avg")],
        f"teacher={teacher}\nstudent={student}")
