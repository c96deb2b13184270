"""Fused piecewise-linear posterior kernel.

One Pallas kernel evaluates, for every element and every static linear
region ``x = x0 + slope * z`` with ``z in [zmin, zmax]``:

- the tilted truncated-normal moments (mean/variance, erfcx-heavy G1/G2),
- the per-region log-partitions,
- the softmax merge over regions for BOTH the backward (z) and forward (x)
  posteriors, and the total log-partition (logsumexp),

in a single VMEM pass: 2 input streams (bz, bx), 5 output streams, zero HBM
intermediates. The plain-XLA path materializes the (K, N) stacked region
moments between the moment computation and the merge; at EP batch sizes the
PL denoiser is HBM-bound, so the fusion is the win.

The math is the *same code* as the jnp path (tramp_tpu.utils.truncated_normal
is branchless jnp and traces fine inside a Pallas kernel body), so kernel
and fallback cannot drift apart.

Reference behavior: tramp/channels/activation/piecewise_linear_channel.py:27-58
and tramp/utils/linear_region.py:13-65.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import special
from ..utils.truncated_normal import (
    truncated_normal_mean, truncated_normal_var, truncated_normal_logZ,
)

#: rows per grid step (x 128 lanes = 32k elements per block)
_BLOCK_ROWS = 256
_LANES = 128


def pl_posterior_reference(az, bz, ax, bx, specs):
    """Elementwise fused PL posterior, pure jnp (runs anywhere).

    Returns (rz, vz, rx, vx, logZ), all with the shape of ``bz``; no
    isotropic reduction is applied. ``specs`` is a static tuple of
    (zmin, zmax, x0, slope) region parameters.
    """
    rzs, vzs, rxs, vxs, As = [], [], [], [], []
    for (zmin, zmax, x0, slope) in specs:
        a = az + slope**2 * ax
        b = bz + slope * (bx - ax * x0)
        r0, v0 = b / a, 1.0 / a
        rz_k = truncated_normal_mean(r0, v0, zmin, zmax)
        vz_k = truncated_normal_var(r0, v0, zmin, zmax)
        rzs.append(rz_k)
        vzs.append(vz_k)
        # slope/x0 are static floats: no captured constant arrays, which
        # Pallas kernel bodies disallow
        rxs.append(slope * rz_k + x0)
        vxs.append(slope**2 * vz_k)
        As.append(truncated_normal_logZ(r0, v0, zmin, zmax)
                  - 0.5 * ax * x0**2 + bx * x0)

    A_max = As[0]
    for A_k in As[1:]:
        A_max = jnp.maximum(A_max, A_k)
    ws = [jnp.exp(A_k - A_max) for A_k in As]
    Z = sum(ws)
    ps = [w / Z for w in ws]
    logZ = A_max + jnp.log(Z)

    def merge(r_ks, v_ks):
        r = sum(p * r_k for p, r_k in zip(ps, r_ks))
        Dr = sum(p * r_k**2 for p, r_k in zip(ps, r_ks)) - r**2
        return r, sum(p * v_k for p, v_k in zip(ps, v_ks)) + Dr

    rz, vz = merge(rzs, vzs)
    rx, vx = merge(rxs, vxs)
    return rz, vz, rx, vx, logZ


def _kernel(specs, az_ref, ax_ref, bz_ref, bx_ref,
            rz_ref, vz_ref, rx_ref, vx_ref, A_ref):
    az = az_ref[0, 0]
    ax = ax_ref[0, 0]
    # kernel_mode: Pallas TPU cannot lower the erf/erfc/ndtr primitives, so
    # the special functions switch to self-contained Chebyshev evaluations
    with special.kernel_mode():
        rz, vz, rx, vx, logZ = pl_posterior_reference(
            az, bz_ref[:], ax, bx_ref[:], specs)
    rz_ref[:] = rz
    vz_ref[:] = vz
    rx_ref[:] = rx
    vx_ref[:] = vx
    A_ref[:] = logZ


@functools.partial(
    jax.jit, static_argnames=("specs", "interpret"))
def _fused_call(az, bz, ax, bx, specs, interpret=False):
    dtype = bz.dtype
    n = bz.size
    rows = -(-n // _LANES)
    rows = -(-rows // 8) * 8
    padded = rows * _LANES
    bz2 = jnp.zeros((padded,), dtype).at[:n].set(bz.ravel())
    bx2 = jnp.zeros((padded,), dtype).at[:n].set(bx.ravel())
    bz2 = bz2.reshape(rows, _LANES)
    bx2 = bx2.reshape(rows, _LANES)
    az2 = jnp.reshape(jnp.asarray(az, dtype), (1, 1))
    ax2 = jnp.reshape(jnp.asarray(ax, dtype), (1, 1))

    block_rows = min(_BLOCK_ROWS, rows)
    grid = (-(-rows // block_rows),)
    vec_spec = pl.BlockSpec(
        (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(
        (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((rows, _LANES), dtype)

    outs = pl.pallas_call(
        functools.partial(_kernel, specs),
        grid=grid,
        in_specs=[smem_spec, smem_spec, vec_spec, vec_spec],
        out_specs=tuple([vec_spec] * 5),
        out_shape=tuple([out_shape] * 5),
        interpret=interpret,
    )(az2, ax2, bz2, bx2)
    return tuple(o.ravel()[:n].reshape(bz.shape) for o in outs)


def fused_pl_posterior(az, bz, ax, bx, specs, interpret=False):
    """Fused PL posterior via Pallas.

    az/ax must be scalars (EP messages are isotropic on this path); bz/bx
    are arrays of identical shape. Returns (rz, vz, rx, vx, logZ)
    elementwise. Set ``interpret=True`` to run the kernel in interpreter
    mode (CPU testing).
    """
    bz = jnp.asarray(bz)
    bx = jnp.asarray(bx)
    return _fused_call(az, bz, ax, bx, tuple(specs), interpret)
