"""Low-rank channels delegating to the embedded VAMP solver.
Reference tramp/channels/low_rank/low_rank_gram_channel.py:7-65 and
low_rank_factorization.py:7-78."""
import jax
import jax.numpy as jnp

from ..base_channel import Channel, MatrixFactorization
from .vamp_solver import (vamp_matrix_factorization,
                          forward_posterior_from_marginals,
                          se_matrix_factorization,
                          se_matrix_factorization_kk)  # noqa: F401


class LowRankGramChannel(Channel):
    """x = z z^T / sqrt(N) with z of shape (N, K).
    Reference low_rank_gram_channel.py:7-65."""

    _data_fields = ()
    _meta_fields = ("N", "K")

    def __init__(self, N, K):
        self.N = N
        self.K = K

    def sample(self, key, Z):
        return Z @ Z.T / jnp.sqrt(self.N)

    def math(self):
        return r"$zz^T$"

    def second_moment(self, tau_z):
        # ignore O(1/N^2) terms (reference l:31-34)
        return self.K * tau_z * tau_z / self.N

    def compute_forward_posterior(self, az, bz, ax, bx):
        # real moment-matched posterior where the reference stubs one
        # (low_rank_gram_channel.py:36-41 'Using placeholders'): run the
        # embedded VAMP and match its marginals into x = z z^T / sqrt(N).
        # NOTE the forward direction runs its own embedded solve (its bx
        # differs from the backward pass's within a sweep); when x is a
        # terminal observed leaf behind a Gaussian likelihood the forward
        # message cannot move the z fixed point — the cost buys correct
        # x readouts and non-terminal-x support.
        *_, (Z_hat, C_Z, _, _) = vamp_matrix_factorization(
            au=az, av=az, bu=bz, bv=bz, ax=ax, bx=bx, model="XX",
            return_marginals=True)
        rx, vx = forward_posterior_from_marginals(
            Z_hat, C_Z, Z_hat, C_Z, self.N)
        # diagonal of the Gram case is a SAME-row product:
        # E[x_ii] = (|z_i|^2 + tr(C_i)) / sqrt(N) — the row-independence
        # formula drops the tr(C_i) term. (The i=j variance correction is
        # O(N) of N^2 entries = O(1/N) on the isotropic vx and is ignored,
        # like the reference's O(1/N^2) terms in second_moment l:31-34.)
        tr = jnp.trace(C_Z, axis1=1, axis2=2)
        rx = rx + jnp.diag(tr) / jnp.sqrt(1.0 * self.N)
        return rx, vx

    def compute_backward_posterior(self, az, bz, ax, bx):
        rz_u, vz_u, rz_v, vz_v = vamp_matrix_factorization(
            au=az, av=az, bu=bz, bv=bz, ax=ax, bx=bx, model="XX")
        return rz_v, vz_v

    def compute_backward_error(self, az, ax, tau_z):
        # channel contract is isotropic zero-mean (scalar az), where the
        # KxK overlap recursion is diagonal and its fixed point equals the
        # scalar recursion's (tested); the scalar form is used because the
        # reference's KxK formulas diverge at high SNR (Delta <~ 0.1) even
        # damped — se_matrix_factorization_kk carries the full matrix
        # protocol (mean terms, anisotropy) with reference parity tests
        return se_matrix_factorization(
            au=az, av=az, ax=ax, model="XX", K=self.K, N=self.N, M=self.N)


class LowRankFactorization(MatrixFactorization):
    """x = u v^T / sqrt(N) with u (M, K), v (N, K).
    Reference low_rank_factorization.py:7-78."""

    _data_fields = ()
    _meta_fields = ("M", "N", "K")

    def __init__(self, M, N, K):
        self.M = M
        self.N = N
        self.K = K

    def sample(self, key, U, V):
        return U @ V.T / jnp.sqrt(self.N)

    def math(self):
        return r"$uv^T$"

    def second_moment(self, tau_u, tau_v):
        return self.K * tau_u * tau_v / self.N

    def compute_forward_posterior(self, az, bz, ax, bx):
        # real moment-matched posterior where the reference stubs one
        # (low_rank_factorization.py:43-46 'FIXME ... Using placeholders'):
        # run the embedded VAMP and match its (U, V) marginals into
        # x = u v^T / sqrt(N). When x is a terminal observed leaf behind a
        # Gaussian likelihood this does not move the (u, v) fixed point
        # (the likelihood's backward message is a model constant); it does
        # give correct x-posterior readouts and supports non-terminal x.
        au, av = az
        bu, bv = bz
        *_, (U_hat, C_U, V_hat, C_V) = vamp_matrix_factorization(
            au=au, av=av, bu=bu, bv=bv, ax=ax, bx=bx, model="UV",
            return_marginals=True)
        return forward_posterior_from_marginals(
            U_hat, C_U, V_hat, C_V, self.N)

    def compute_backward_posterior(self, az, bz, ax, bx):
        au, av = az
        bu, bv = bz
        rz_u, vz_u, rz_v, vz_v = vamp_matrix_factorization(
            au=au, av=av, bu=bu, bv=bv, ax=ax, bx=bx, model="UV")
        return [rz_u, rz_v], [vz_u, vz_v]

    def compute_backward_error(self, az, ax, tau_z):
        # scalar recursion for robustness; same fixed point as the KxK
        # protocol in this isotropic zero-mean contract (see LowRankGram)
        au, av = az
        vz_u, vz_v = se_matrix_factorization(
            au=au, av=av, ax=ax, model="UV", K=self.K, N=self.N, M=self.M)
        return [vz_u, vz_v]
