"""Low-rank matrix factorization x = u v^T / sqrt(N): recover the planted
factors from a noisy matrix observation with the embedded scanned VAMP
solver, and compare the empirical (gauge-invariant) x-space error against
the Bayes-optimal KxK state-evolution prediction across a noise sweep.

Reference analog: the standalone training loop of
tramp/channels/low_rank/AMP_matrix_factorization.py:464-491 and the SE
fixed point of SE_matrix_factorization.py:85-141 (the reference ships no
example for this family; this sweep is the missing gallery entry).
"""
import argparse
import os

import numpy as np
import jax
# f64 like the reference's numpy solver: at f32 the small-N high-SNR end
# (Delta ~ 0.1) of the sweep can diverge (bench.py runs the same family
# at M=N=512 f32 with "highest" matmul precision instead)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from tramp_tpu.channels.low_rank import (  # noqa: E402
    vamp_matrix_factorization, se_matrix_factorization_kk)


def planted_instance(M, N, K, Delta, rng):
    u0 = rng.randn(M, K)
    v0 = rng.randn(N, K)
    X0 = u0 @ v0.T / np.sqrt(N)
    Y = X0 + np.sqrt(Delta) * rng.randn(M, N)
    return X0, Y


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true")
    p.add_argument("--seeds", type=int, default=4)
    args = p.parse_args()
    M = N = 512 if args.big else 128
    K = 2
    # the Delta=0.1 (high-SNR) point needs N >= ~512 to concentrate: at
    # small N a seed-level gauge drift inflates the empirical error well
    # above the (asymptotic) SE prediction
    deltas = ([0.1] if args.big else []) + [0.2, 0.4, 0.7, 1.0]

    solve = jax.jit(jax.vmap(
        lambda bx, ax: vamp_matrix_factorization(
            au=1.0, av=1.0, bu=jnp.zeros((M, K)), bv=jnp.zeros((N, K)),
            ax=ax, bx=bx, model="UV"),
        in_axes=(0, None)))

    rows = []
    for Delta in deltas:
        rng = np.random.RandomState(7)
        X0s, Ys = zip(*[planted_instance(M, N, K, Delta, rng)
                        for _ in range(args.seeds)])
        ru, vu, rv, vv = solve(jnp.asarray(np.stack(Ys)) / Delta,
                               jnp.asarray(1.0 / Delta))
        Xh = np.einsum("smk,snk->smn", np.asarray(ru),
                       np.asarray(rv)) / np.sqrt(N)
        mse_x = float(np.mean((Xh - np.stack(X0s)) ** 2))
        # Bayes-optimal prediction from the KxK overlap recursion:
        # mse_x = (K - tr(q_u q_v)) / N with q = Sigma - mse (Nishimori)
        mse_u, mse_v = se_matrix_factorization_kk(
            au=1.0, av=1.0, ax=1.0 / Delta, model="UV", K=K,
            alpha=M / N, damping=0.5)
        q_u = np.eye(K) - np.asarray(mse_u)
        q_v = np.eye(K) - np.asarray(mse_v)
        pred = float((K - np.trace(q_u @ q_v)) / N)
        rows.append((Delta, mse_x, pred, float(np.mean(np.asarray(vu)))))
        print(f"Delta={Delta:4.2f}  mse_x={mse_x:.3e}  "
              f"SE pred={pred:.3e}  ratio={mse_x / pred:5.2f}")

    out = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(out, exist_ok=True)
    np.savetxt(os.path.join(out, "matrix_factorization_ep_vs_se.csv"),
               np.asarray(rows), delimiter=",",
               header="delta,mse_x_emp,mse_x_se,vz_u")
    print(f"wrote {out}/matrix_factorization_ep_vs_se.csv")


if __name__ == "__main__":
    main()
