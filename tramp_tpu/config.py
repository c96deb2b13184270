"""Global configuration for tramp_tpu.

The reference (sphinxteam/tramp) is float64 numpy throughout. On TPU we
default to float32 (fast VPU/MXU path) and allow float64 on CPU for
bitwise-tolerant parity testing (enable via ``jax.config.jax_enable_x64``).
"""
import jax
import jax.numpy as jnp

#: Precision clipping bounds for message precisions.
#: Mirrors reference tramp/base.py:238-239 (AMIN=1e-11, AMAX=1e11).
AMIN = 1e-11
AMAX = 1e11

#: Floor for the numerically safe inverse, reference tramp/base.py:44-46.
VMIN = 1e-20

#: Default number of Gauss-Hermite nodes used to replace the reference's
#: adaptive scipy.integrate.quad over [-10, 10] (tramp/utils/integration.py:27).
GH_NODES = 127

#: Default number of Gauss-Legendre nodes for truncated-interval measures.
GL_NODES = 65


#: Fused Pallas kernels: None = auto, True/False = force. Auto currently
#: resolves to False: the piecewise-linear posterior is VPU-compute-bound
#: (transcendental-heavy truncated-normal moments, ~0.9 ns/element on v5e
#: = ~4% of HBM peak bandwidth), so the fused kernel measures ~1.0x vs
#: plain XLA at the
#: kernel level (8M-element microbench, see docs/performance.md) while
#: adding compile time. Round-5 autotuning sweep: block_rows in
#: {64, 128, 256, 512, 1024} all measure 0.98-1.00x vs plain XLA — the
#: neutrality is not a tiling artifact; the kernel is compute-bound at
#: every block shape. The kernel stays available (USE_PALLAS=True) and
#: tested; flip the auto default if a future memory-bound path (bf16, more
#: regions, fused multi-factor sweeps) changes the balance.
USE_PALLAS = None
PALLAS_MIN_SIZE = 2048

#: bfloat16 weight streaming for the dense SVD-basis matvecs of
#: LinearChannel: None = auto (True on TPU when x64 is disabled), True /
#: False = force. Casting the loop-invariant U/V factors to bf16 *before*
#: the GEMM halves their HBM traffic (the sweep is HBM-bound,
#: docs/performance.md); XLA's while-loop LICM hoists the casts out of the
#: sweep loop, and accumulation stays float32 (preferred_element_type).
#: The operand rounding matches a single-pass bf16 MXU pass, but the
#: measured fixed-point error vs the exact-f32 CPU control grows from
#: ~2e-5 to ~7.6e-4 (docs/performance.md) — set False for exact
#: default-precision parity.
MATVEC_BF16 = None


def matvec_bf16():
    "Resolve the MATVEC_BF16 gate at trace time."
    if MATVEC_BF16 is not None:
        return bool(MATVEC_BF16)
    return (jax.default_backend() == "tpu"
            and not jax.config.jax_enable_x64)


#: bfloat16 storage for the b-message arrays of the EP state (the message
#: state is ~78% of the sweep's HBM traffic, docs/performance.md): b slots
#: are stored bf16 in the while_loop carry and upcast to float32 at every
#: read (cavity sums, factor math, metrics), so all COMPUTE stays f32 and
#: only the carried state is compressed. None = auto (currently False:
#: throughput-mode opt-in), True/False = force.
#:
#: CAVEAT: bf16 resolution (~0.4% relative) floors the achievable
#: fixed-point accuracy AND the relative-r convergence delta — solves
#: gated on tol <= 1e-4 will typically run to max_iter. Intended for the
#: fixed-sweep-count throughput path; accuracy impact is measured in
#: bench.py / docs/performance.md.
STATE_BF16 = None


def state_bf16():
    "Resolve the STATE_BF16 gate at trace time."
    if STATE_BF16 is not None:
        return bool(STATE_BF16)
    return False


#: Pin model-constant factor messages (Gaussian likelihood/prior fast
#: paths): pinned slots are recomputed from model leaves at the top of
#: every sweep (loop-invariant, so XLA hoists their consumer GEMMs — e.g.
#: U^T (y/var), 9.1% of the flagship sweep's FLOPs, verified in the
#: compiled cost analysis) and are never damped (d*c + (1-d)*c = c at the
#: fixed point; transient differs, fixed points identical — tested).
#: DEFAULT OFF: despite the FLOP reduction, the measured flagship
#: throughput on the v5e remote runtime REGRESSES (206k -> 91k iter/s f32
#: state, 234k -> 94k bf16) — the hoisted loop-invariant (batch x M)
#: buffer appears to force a far worse while-loop schedule. A measured
#: negative; flip on only after re-profiling on a direct-attached TPU.
PIN_CONSTANT_MESSAGES = None


def pin_constant_messages():
    "Resolve the PIN_CONSTANT_MESSAGES gate (None = auto: False)."
    if PIN_CONSTANT_MESSAGES is not None:
        return bool(PIN_CONSTANT_MESSAGES)
    return False


#: Spectral-image carry for dense LinearChannels in the generic tree
#: engine: the backward pass's U^T bx is kept in the message state and
#: reused by the next forward pass (bx cannot change in between — the
#: forward pass writes only fwd slots), saving one thin (Nx, k) GEMM per
#: linear factor per sweep: 2 Nz k + 3 Nx k -> 2 Nz k + 2 Nx k MACs.
#: This generalizes the chain-only ML-VAMP carry discipline
#: (parallel/ml_vamp.py:16-47) to linear factors at ANY tree position
#: (TV, committee, sparse-gradient models). The carried image is a
#: length-k vector (tiny next to the (N,) slots), unlike the round-3
#: constant-message-pinning negative which parked a (batch x M) buffer in
#: the carry. The cached value is recomputed by the same _mm on the same
#: stored operand, so trajectories are BIT-IDENTICAL to the uncached
#: engine. None = auto (True), True/False = force.
SPECTRAL_CARRY = None


def spectral_carry():
    "Resolve the SPECTRAL_CARRY gate (None = auto: True)."
    if SPECTRAL_CARRY is not None:
        return bool(SPECTRAL_CARRY)
    return True


#: FFT implementation for the conv/gradient/DFT channels: None = auto
#: (probe whether the backend executes XLA's FFT custom call; some TPU
#: runtimes return UNIMPLEMENTED), "xla" = force jnp.fft, "matmul" = force
#: the dense-DFT matmul path (MXU-friendly O(n^2) per axis, exact parity
#: with jnp.fft to dtype accuracy — see ops/dft.py).
FFT_MODE = None


def use_pallas(x):
    """Decide (at trace time) whether to use the fused Pallas path for
    array ``x``."""
    import numpy as np
    if USE_PALLAS is not None:
        if not USE_PALLAS:
            return False
        if x.dtype not in (jnp.float32, jnp.bfloat16):
            return False
        if np.prod(x.shape, dtype=int) < PALLAS_MIN_SIZE:
            return False
        return jax.default_backend() == "tpu"
    return False


def default_dtype():
    """Default floating dtype: float64 when x64 is enabled, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
