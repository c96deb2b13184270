"""Limit-consistency checks: the Bayes-optimal limit of the RS potential
must reproduce the BO potential. Reference tramp/checks/check_limits.py:9-80."""
import numpy as np
import pandas as pd


def check_prior_BO_limit(prior, ax_values=None, tx0_hat=0.3):
    """At the Nishimori point (m_hat = q_hat = ax - tx0_hat, teacher ==
    student) the RS potential equals the BO potential."""
    ax_values = ax_values if ax_values is not None else np.linspace(
        0.5, 2.5, 6)
    records = []
    for ax in ax_values:
        ax = float(ax)
        m_hat = ax - tx0_hat
        A_BO = float(prior.compute_potential_BO(ax, tx0_hat))
        A_RS = float(prior.compute_potential_RS(
            ax, m_hat, m_hat, prior, tx0_hat))
        records.append(dict(ax=ax, A_BO=A_BO, A_RS=A_RS,
                            err=abs(A_BO - A_RS)))
    return pd.DataFrame(records)


def check_likelihood_BO_limit(likelihood, az_values=None, tz0_hat=0.3):
    az_values = az_values if az_values is not None else np.linspace(
        0.5, 2.5, 6)
    records = []
    for az in az_values:
        az = float(az)
        m_hat = az - tz0_hat
        A_BO = float(likelihood.compute_potential_BO(az, tz0_hat))
        A_RS = float(likelihood.compute_potential_RS(
            az, m_hat, m_hat, likelihood, tz0_hat))
        records.append(dict(az=az, A_BO=A_BO, A_RS=A_RS,
                            err=abs(A_BO - A_RS)))
    return pd.DataFrame(records)
