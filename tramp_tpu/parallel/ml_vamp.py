"""ML-VAMP: the spectral fast path for ARBITRARY SISO chains.

Generalizes `SpectralVAMPSolver` (vamp_glm.py, exact 3-factor GLM chains)
to any single-input/single-output factor chain

    prior @ V @ F_1 @ V @ ... @ F_{L-1} @ V @ likelihood

covering the relu-net and VAE-decoder gallery chains (multi-layer VAMP:
Fletcher, Rangan, Schniter, "Inference in Deep Networks in High
Dimensions", 2018 — the same moment-matching fixed point as EP on a
chain). The reference has no fast path for any of these (its embedded
VAMP serves only the low-rank factorization channels,
tramp/channels/low_rank/AMP_matrix_factorization.py:6).

How it beats the generic tree engine on the SAME schedule
---------------------------------------------------------
The engine's per-sweep cost on a dense `LinearChannel` (x = W z,
W = U S V^T, thin factors U (Nx,k) / V (Nz,k)) was 5 thin GEMMs =
2 Nz k + 3 Nx k MACs: the backward pass re-transforms
the x-side cavity (U^T bx) that the forward pass already transformed,
because the generic slot machinery materializes every message in real
space (XLA's CSE removes the duplicate V^T bz but cannot remove U^T bx —
its operand changed between the passes). ML-VAMP carries each linear
factor's spectral images across passes instead (since round 5 the
generic engine applies the same carry at any tree position —
config.SPECTRAL_CARRY, algos/expectation_propagation.py — so the
remaining ML-VAMP edge on chains is the pinned terminal and the
skipped terminal forward message below):

- forward pass: V^T bz (fresh) is computed, used, and kept for the
  backward pass (bz cannot change in between — the backward pass only
  writes backward slots);
- backward pass: U^T bx (fresh) is computed, used, and CARRIED to the
  next sweep's forward pass (bx next changes in the next backward pass).

Per sweep that is 4 thin GEMMs (2 Nz k + 2 Nx k MACs) — with an
identical iterate-by-iterate trajectory to the engine (same serial
forward/backward schedule, same moment matching, same clipping, same
damping).

A terminal `GaussianLikelihood` is additionally PINNED: its message is a
model constant (a = 1/var, b = y/var — reference
gaussian_likelihood.py:68-71), so its slot is fixed from iteration 0
(instead of being damped toward the constant) and, when the preceding
factor is a dense `LinearChannel`, its spectral image S U^T y / var is a
loop invariant and the linear factor's forward message need not be
materialized at all inside the loop. For the 3-factor GLM chain this
recovers exactly `SpectralVAMPSolver`'s 2 Nz k MACs per iteration.
Pinning changes the transient (not the fixed point): parity tests
compare fixed points, like tests/test_vamp_glm.py.

Supported factors: any SISO channel/prior/likelihood that implements the
standard message contract (compute_forward_message /
compute_backward_message); `LinearChannel` (exactly — subclasses with
different representations fall back to their generic messages) gets the
spectral treatment. Multi-edge topologies (SIMO/MISO variables) are NOT
chains — use `EPSolver`. `dispatch_solver` picks automatically.
"""
import jax
import jax.numpy as jnp

from .. import config
from ..base import compute_ab_new
from ..channels import LinearChannel
from ..likelihoods import GaussianLikelihood


def chain_factors(model):
    """The model's factors as a SISO chain [prior, F_1, ..., likelihood],
    or None if the model is not such a chain."""
    factors = list(model.factors)
    if len(factors) < 2:
        return None
    if not (factors[0].n_prev == 0 and factors[0].n_next == 1):
        return None
    if not (factors[-1].n_next == 0 and factors[-1].n_prev == 1
            and getattr(factors[-1], "y", None) is not None):
        return None
    for f in factors[1:-1]:
        if not (f.n_prev == 1 and f.n_next == 1):
            return None
    # interfaces must be plain SISO variables (one in-edge, one out-edge):
    # a SIMO/MISO variable means the DAG is a tree, not a chain
    for i, n in enumerate(model.nodes):
        if n in model.variables:
            if len(model.in_edges[i]) != 1 or len(model.out_edges[i]) != 1:
                return None
    return factors


def _is_spectral(f):
    "Dense LinearChannel exactly (not packed-complex/conv subclasses)."
    return type(f) is LinearChannel


class MLVAMPSolver:
    """Spectral chain solver; same call surface as EPSolver/
    SpectralVAMPSolver: ``solve(model) -> ({id: {r, v}}, n_iter)``.

    ``damping`` mirrors the engine's float damping (applied to every
    factor-emitted message except pinned constants). The stopping rule is
    the engine's relative-r criterion over all chain interfaces."""

    def __init__(self, model, damping=None, tol=1e-6, max_iter=200,
                 pin_terminal=True):
        factors = chain_factors(model)
        if factors is None:
            raise ValueError(
                f"MLVAMPSolver needs a SISO factor chain, got {model}")
        self.tol = tol
        self.max_iter = max_iter
        self.damping = 0.0 if damping is None else float(damping)
        self.L = L = len(factors) - 1          # interfaces 0..L-1
        self.var_ids = list(model.variable_ids)
        assert len(self.var_ids) == L
        self._linear = [_is_spectral(f) for f in factors]
        # terminal pin: constant likelihood message (Gaussian).
        # pin_terminal=False keeps the generic damped update instead, which
        # makes the iterate-by-iterate trajectory EXACTLY the engine's
        # (useful for snapshot parity on models without a fixed point,
        # e.g. the VAE chain); the fixed point is the same either way.
        fn = getattr(factors[-1], "constant_backward_message", None)
        self._pin_terminal = (pin_terminal and fn is not None
                              and fn() is not None)
        # GLM tail: pinned Gaussian likelihood directly after a dense
        # linear factor -> the linear forward message is never consumed
        # inside the loop (the likelihood ignores it) and S U^T y / var is
        # loop-invariant
        self._skip_fwd_terminal = bool(
            L >= 2 and self._pin_terminal and self._linear[-2])
        # interface shapes for the zero init
        shapes = model.init_shapes()
        vshapes = []
        for i, n in enumerate(model.nodes):
            if n in model.variables:
                vshapes.append(shapes[i])
        self._shapes = vshapes
        damp = self.damping

        def fresh(model):
            return list(model.factors)

        def pin_msg(model):
            """Terminal constant message: b broadcast to the interface
            shape (downstream matvecs need an array), a kept scalar — the
            isotropic chain carries scalar precisions (the engine's
            harmonized slots do the same)."""
            lik = fresh(model)[-1]
            c = lik.constant_backward_message()
            shape = self._shapes[L - 1]
            return {"a": jnp.asarray(c["a"]),
                    "b": jnp.broadcast_to(jnp.asarray(c["b"]), shape)}

        def _damped(a_old, b_old, a_new, b_new):
            "Engine slot damping: d*old + (1-d)*new, after clipping."
            if not damp:
                return a_new, b_new
            return (damp * a_old + (1.0 - damp) * a_new,
                    damp * b_old + (1.0 - damp) * b_new)

        def _lin_fwd(lin, az, bz, ax, bx, tx):
            """Linear forward posterior using the carried spectral image
            tx = U^T bx; returns (rx, vx, tz) with tz = V^T bz (k-length)
            for the backward pass. Mirrors LinearChannel._mean_svd (thin
            factors; only the k signal modes reach x-space)."""
            tz = lin._mm(lin.V, bz, transpose=True)        # (k,)
            resolvent = 1.0 / (az + ax * lin.s**2)
            m = resolvent * (tz + lin.s * tx)
            rx = lin._mm(lin.U, lin.s * m)
            vx = lin.compute_forward_variance(az, ax)
            return rx, vx, tz

        def _lin_bwd(lin, az, bz, ax, bx, tz):
            "Linear backward posterior; returns (rz, vz, tx) fresh."
            tx = lin._mm(lin.U, bx, transpose=True)        # (k,)
            resolvent = 1.0 / (az + ax * lin.s**2)
            m = resolvent * (tz + lin.s * tx)
            if lin.k == lin.Nz:
                rz = lin._mm(lin.V, m)
            else:
                # complement modes (s=0, resolvent 1/az):
                # V_perp V_perp^T bz / az = (bz - V_k tz) / az
                rz = bz / az + lin._mm(lin.V, m - tz / az)
            vz = lin.compute_backward_variance(az, ax)
            return rz, vz, tx

        def step(model, carry):
            """One engine-identical sweep: forward pass then backward pass.
            carry = (msgs, txs); msgs[i] = {fa, fb, ba, bb} at interface i,
            txs[l] = U^T (backward b at factor l's x side) for linear l.

            A pinned terminal's (ba, bb) are NOT part of the carry: they
            are reconstituted from the model here, so XLA sees them as
            loop invariants computed outside the while_loop. Carrying the
            constant through the loop state instead measurably wrecks the
            backend's loop schedule (the round-3 constant-message-pinning
            negative, docs/performance.md — 206k -> 91k iter/s)."""
            factors = fresh(model)
            msgs, txs = list(carry[0]), dict(carry[1])
            if self._pin_terminal:
                pin = pin_msg(model)
                m = dict(msgs[L - 1])
                m["ba"], m["bb"] = pin["a"], pin["b"]
                msgs[L - 1] = m
            tzs = {}
            # ---- forward pass ----
            for l, f in enumerate(factors):
                if l == L:
                    break
                m_out = dict(msgs[l])
                ax, bx = m_out["ba"], m_out["bb"]
                if l == 0:
                    a_new, b_new = f.compute_forward_message(ax, bx)
                else:
                    m_in = msgs[l - 1]
                    az, bz = m_in["fa"], m_in["fb"]
                    if self._linear[l]:
                        if l == L - 1 and self._skip_fwd_terminal:
                            # the pinned likelihood never reads this
                            # message; only cache tz for the backward pass
                            tzs[l] = f._mm(f.V, bz, transpose=True)
                            continue
                        rx, vx, tzs[l] = _lin_fwd(
                            f, az, bz, ax, bx, txs[str(l)])
                        a_new, b_new = compute_ab_new(rx, vx, ax, bx)
                    else:
                        a_new, b_new = f.compute_forward_message(
                            az, bz, ax, bx)
                m_out["fa"], m_out["fb"] = _damped(
                    m_out["fa"], m_out["fb"], a_new, b_new)
                msgs[l] = m_out
            # ---- backward pass ----
            for l in range(L, -1, -1):
                f = factors[l]
                if l == 0:
                    break
                m_out = dict(msgs[l - 1])
                az, bz = m_out["fa"], m_out["fb"]
                if l == L:
                    if self._pin_terminal:
                        continue  # already pinned above
                    a_new, b_new = f.compute_backward_message(az, bz)
                else:
                    m_in = msgs[l]
                    ax, bx = m_in["ba"], m_in["bb"]
                    if self._linear[l]:
                        rz, vz, tx = _lin_bwd(f, az, bz, ax, bx, tzs[l])
                        if not (l == L - 1 and self._skip_fwd_terminal):
                            txs[str(l)] = tx
                        # (skip case: tx = U^T (y/var) is loop-invariant —
                        # XLA hoists it out of the while_loop; no carry)
                        a_new, b_new = compute_ab_new(rz, vz, az, bz)
                    else:
                        a_new, b_new = f.compute_backward_message(
                            az, bz, ax, bx)
                m_out["ba"], m_out["bb"] = _damped(
                    m_out["ba"], m_out["bb"], a_new, b_new)
                msgs[l - 1] = m_out
            if self._pin_terminal:
                # keep the pinned constants OUT of the loop carry
                m = dict(msgs[L - 1])
                m.pop("ba"), m.pop("bb")
                msgs[L - 1] = m
            return (tuple(msgs), txs)

        def posterior_r(model, carry):
            "Per-interface posterior means (the engine's 'r' stop metric)."
            msgs, _ = carry
            pin = pin_msg(model) if self._pin_terminal else None
            out = []
            for i, m in enumerate(msgs):
                if i == L - 1 and self._skip_fwd_terminal:
                    continue  # fwd slot not updated inside the loop
                if pin is not None and i == L - 1:
                    a = m["fa"] + pin["a"]
                    b = m["fb"] + pin["b"]
                else:
                    a = m["fa"] + m["ba"]
                    b = m["fb"] + m["bb"]
                tiny = jnp.finfo(jnp.result_type(a)).tiny
                out.append(b / jnp.maximum(a, tiny))
            return tuple(out)

        def init(model):
            dtype = jnp.result_type(fresh(model)[-1].y)
            msgs = []
            for i, shape in enumerate(self._shapes):
                z = jnp.zeros(shape, dtype)
                m = {"fa": jnp.asarray(0.0, dtype), "fb": z,
                     "ba": jnp.asarray(0.0, dtype), "bb": z}
                if self._pin_terminal and i == L - 1:
                    # pinned slots live outside the carry (see step)
                    m.pop("ba"), m.pop("bb")
                msgs.append(m)
            txs = {}
            for l, f in enumerate(fresh(model)):
                if self._linear[l] and not (
                        l == L - 1 and self._skip_fwd_terminal):
                    txs[str(l)] = jnp.zeros(f.k, dtype)
            carry = (tuple(msgs), txs)
            # harmonize: broadcast the scalar a-inits to the fixed-point
            # shapes the sweep emits (shape-stable while_loop carry)
            out = jax.eval_shape(lambda c: step(model, step(model, c)),
                                 carry)
            msgs_h = []
            for m, o in zip(carry[0], out[0]):
                msgs_h.append({k: jnp.broadcast_to(
                    jnp.asarray(m[k], o[k].dtype), o[k].shape) for k in m})
            return (tuple(msgs_h), carry[1])

        def run(model, max_iter, tol):
            def cond(state):
                carry, old_r, i, done, conv = state
                return (~done) & (i < max_iter)

            def body(state):
                carry, old_r, i, done, conv = state
                new_carry = step(model, carry)
                flat = jax.tree.leaves(new_carry)
                ok = jnp.stack(
                    [jnp.all(jnp.isfinite(x)) for x in flat]).all()
                new_carry = jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), new_carry, carry)
                new_r = posterior_r(model, new_carry)

                def norm(x):
                    return jnp.sqrt(jnp.mean(x**2))

                deltas = jnp.stack([
                    norm(n - o) / jnp.maximum(norm(n),
                                              jnp.finfo(n.dtype).tiny)
                    for n, o in zip(new_r, old_r)])
                delta = deltas.max()
                converged = (i > 0) & (delta < tol)
                conv = conv | (~done & converged)
                done = done | converged | (~ok)
                return (new_carry, new_r, i + 1, done, conv)

            carry0 = init(model)
            r0 = posterior_r(model, carry0)
            carry, _, i, done, conv = jax.lax.while_loop(
                cond, body, (carry0, r0, jnp.asarray(0),
                             jnp.asarray(False), jnp.asarray(False)))
            return self._readout(model, carry), i, conv

        self._step = step
        self._init = init
        self._run = run
        self._pin_msg = pin_msg
        self._jit_single = jax.jit(run)
        self._jit_batch = jax.jit(jax.vmap(run, in_axes=(0, None, None)))

    def _readout(self, model, carry):
        "Posterior {id: {r, v}} at every interface from the final state."
        msgs, txs = carry
        factors = list(model.factors)
        L = self.L
        msgs = list(msgs)
        if self._pin_terminal:
            # reconstitute the pinned slots (kept out of the loop carry)
            pin = self._pin_msg(model)
            m = dict(msgs[L - 1])
            m["ba"], m["bb"] = pin["a"], pin["b"]
            msgs[L - 1] = m
        if self._skip_fwd_terminal:
            # materialize the one message the loop never needed: the
            # linear factor's forward posterior at the terminal interface
            lin = factors[L - 1]
            m_in = msgs[L - 2]
            m_out = dict(msgs[L - 1])
            az, bz = m_in["fa"], m_in["fb"]
            ax, bx = m_out["ba"], m_out["bb"]
            tz = lin._mm(lin.V, bz, transpose=True)        # (k,)
            tx = lin._mm(lin.U, bx, transpose=True)        # (k,)
            resolvent = 1.0 / (az + ax * lin.s**2)
            m = resolvent * (tz + lin.s * tx)
            rx = lin._mm(lin.U, lin.s * m)
            vx = lin.compute_forward_variance(az, ax)
            a_new, b_new = compute_ab_new(rx, vx, ax, bx)
            m_out["fa"], m_out["fb"] = a_new, b_new
            msgs[L - 1] = m_out
        post = {}
        for vid, m in zip(self.var_ids, msgs):
            a = m["fa"] + m["ba"]
            b = m["fb"] + m["bb"]
            post[vid] = {"r": b / a, "v": 1.0 / a}
        return post

    def solve(self, model):
        post, n_iter, conv = self._jit_single(
            model, jnp.asarray(self.max_iter), jnp.asarray(self.tol))
        return post, n_iter

    def solve_info(self, model):
        return self._jit_single(
            model, jnp.asarray(self.max_iter), jnp.asarray(self.tol))

    def solve_batch(self, stacked_model):
        post, n_iter, conv = self._jit_batch(
            stacked_model, jnp.asarray(self.max_iter),
            jnp.asarray(self.tol))
        return post, n_iter


def dispatch_solver(model, damping=None, tol=1e-6, max_iter=200, **kw):
    """The production front door (VERDICT r3 item 2a): route a model to
    the fastest solver that provably reaches the same fixed point.

    - exact 3-factor GLM chain (prior @ LinearChannel @ GaussianLikelihood)
      -> SpectralVAMPSolver (2 Nz k MACs/iter on the thin factors);
    - any other supported SISO chain -> MLVAMPSolver (spectral-cached
      linear factors, pinned Gaussian likelihood);
    - anything else (trees, SIMO/MISO, multi-edge) -> the generic EPSolver.

    Returns the solver instance; all three share the
    ``solve(model) -> (post, n_iter)`` surface. Extra ``**kw`` are
    forwarded to whichever solver is selected — a kwarg the selected
    solver does not accept raises TypeError (loud beats silently
    dropping e.g. ``pin_terminal`` or ``rollback_increase`` when the
    dispatch routes elsewhere than expected).
    """
    from .vamp_glm import SpectralVAMPSolver
    from .solver import EPSolver

    factors = chain_factors(model)
    if (factors is not None and len(factors) == 3
            and _is_spectral(factors[1])
            and isinstance(factors[2], GaussianLikelihood)):
        return SpectralVAMPSolver(model, damping=damping, tol=tol,
                                  max_iter=max_iter, **kw)
    if factors is not None:
        return MLVAMPSolver(model, damping=damping, tol=tol,
                            max_iter=max_iter, **kw)
    return EPSolver(model, damping=0.1 if damping is None else damping,
                    tol=tol, max_iter=max_iter, **kw)
