"""Batched EP/SE solvers: thousands of problem instances as one stacked
Model pytree, vmapped and (optionally) sharded over a device mesh.

This is the TPU-native replacement for the reference's sequential
experiment loop (tramp/experiments/multiple_experiments.py:30-49): the
per-instance EP sweep is a pure function, so instances batch with vmap and
distribute with jax.sharding — convergence is a batched mask inside one
fused while_loop (iteration stops when every instance has converged)."""
import jax
import jax.numpy as jnp

from ..algos import ExpectationPropagation, StateEvolution


# Probe the weak-type re-tagging primitive ONCE at import (VERDICT r4
# weak #7 / ADVICE r4): jax has no public API for building a weak-typed
# ARRAY from host data, so the fast path binds the convert_element_type
# primitive with weak_type=True through this private symbol. The probe is
# import-time and the except is narrow, so a jax upgrade that moves the
# symbol is caught HERE (and by tests/test_parallel.py::
# test_weak_stack_fast_path, which fails loudly instead of letting the
# ~45x-slower per-scalar dispatch path silently return).
try:
    from jax._src.lax.lax import _convert_element_type as _weak_retag
except ImportError:  # pragma: no cover - exercised only on jax API drift
    _weak_retag = None


def _stack_weak(col):
    """One weak-typed device array from a python-scalar column. Exact
    semantics: stacked protocol constants (e.g. likelihood var) must keep
    promoting like the unstacked model's python float, or an f32 sweep
    would come out f64 under x64 (breaking e.g. the gated-bf16 carry)."""
    import numpy as np

    if all(type(x) is type(col[0]) and x == col[0] for x in col):
        # constant SAME-TYPE column (the typical case for protocol
        # constants): broadcast_to PRESERVES the python scalar's weak
        # type — a fully public, single-dispatch path. The type check
        # matters: an equal-valued mixed int/float column (1 == 1.0)
        # must take the stack path below so it keeps numpy's promoted
        # float dtype like the previous implementation
        return jnp.broadcast_to(jnp.asarray(col[0]), (len(col),))
    arr = jnp.asarray(np.stack(col))
    if _weak_retag is not None:
        try:
            return _weak_retag(arr, arr.dtype, weak_type=True)
        except (TypeError, AttributeError):  # pragma: no cover - API drift
            pass
    # exact fallback: jnp.stack of weak scalars is weak, but dispatches
    # one device op per element (~45x slower at 1000-point grid scale)
    return jnp.stack(col)


def stack_pytrees(trees):
    """Stack same-structure pytrees along a new leading axis.

    Host-resident leaves (numpy arrays / python scalars — the common case
    for SE phase-grid models, whose traced leaves are grid scalars) are
    stacked in numpy and shipped to device as ONE array per leaf;
    device-resident leaves go through jnp.stack unchanged. The numpy fast
    path matters at grid scale: jnp.stack of 1000 host scalars dispatches
    1000 tiny device ops per leaf (~0.9 s for a 1020-point grid vs ~0.02 s
    in numpy)."""
    import numpy as np

    leaves0, treedef = jax.tree.flatten(trees[0])
    all_leaves = [jax.tree.flatten(t)[0] for t in trees]
    stacked = []
    for i in range(len(leaves0)):
        col = [ls[i] for ls in all_leaves]
        if all(type(x) in (float, int, bool, complex) for x in col):
            stacked.append(_stack_weak(col))
        elif all(isinstance(x, (np.ndarray, np.generic)) for x in col):
            stacked.append(jnp.asarray(np.stack(col)))
        else:
            stacked.append(jnp.stack(col))
    return jax.tree.unflatten(treedef, stacked)


class _Solver:
    engine_cls = None

    def __init__(self, model, damping=None, tol=1e-6, max_iter=200,
                 wait_increase=None, rollback_increase=None,
                 stop_kind=None):
        """`model` provides the static structure (one representative
        instance). Solve calls accept any pytree with the same structure.

        wait_increase / rollback_increase tune the divergence rollback
        (reference EarlyStopping(wait_increase, max_increase) semantics,
        callbacks.py:195-243); default to the engine's values. Models with
        a long symmetry-breaking transient (e.g. phase retrieval) need a
        larger wait_increase, as in the reference's figure scripts
        (sparse_phase_retrieval.py:57). rollback_increase=jnp.inf disables
        rollback.

        ``stop_kind`` overrides the engine's stopping metric: "r" (max
        relative posterior-mean change, reference EarlyStoppingEP — the
        EP default) or "v" (|delta| of the per-variable MEAN posterior
        variance, reference EarlyStopping). The "v" form is a SIGNED
        scalar summary, so per-element bf16 GEMM rounding noise cancels
        in the mean — on TPU it keeps tol-gating live at default matmul
        precision in broadcast-W batched layouts where the "r" metric
        limit-cycles at the rounding floor (docs/performance.md)."""
        self.engine = self.engine_cls(model)
        self.damp = self.engine._damping_per_slot(
            float(damping) if damping else None)
        self.tol = tol
        self.max_iter = max_iter
        eng = self.engine
        damp = self.damp
        wait_increase = (eng.wait_increase if wait_increase is None
                         else wait_increase)
        rollback_increase = (eng.rollback_increase if rollback_increase is None
                             else rollback_increase)

        kind = stop_kind or eng.default_stop_kind
        self.stop_kind = kind

        def run(model, state, max_iter, tol):
            if eng.spectral_factors:
                # the shared init-state template's carried spectral images
                # are re-derived from THIS lane's operators (bit-preserving
                # — the same matvec the first uncached forward pass does)
                state = eng._refresh_spectral_cache(state, model)

            def cond(carry):
                state, old_m, i, n_iter, done, conv = carry
                return (~done) & (i < max_iter)

            def body(carry):
                state, old_m, i, n_iter, done, conv = carry
                swept = eng._sweep(model, state, damp)
                ok = eng._all_finite(swept)
                swept = jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), swept, state)
                new_m = eng._metric(model, swept, kind)
                delta, inc = eng._delta_increase(kind, new_m, old_m)
                converged = (i > 0) & (delta < tol)
                # divergence rollback (reference EarlyStopping semantics)
                rb = (i > wait_increase) & (inc > rollback_increase)
                swept = jax.tree.map(
                    lambda n, o: jnp.where(rb, o, n), swept, state)
                # freeze already-converged lanes: under vmap the while_loop
                # keeps sweeping until the slowest lane converges; done lanes
                # must keep their fixed point (and their n_iter) untouched so
                # batched results match the sequential run exactly
                new_state = jax.tree.map(
                    lambda n, o: jnp.where(done, o, n), swept, state)
                new_m = jax.tree.map(
                    lambda n, o: jnp.where(done, o, n), new_m, old_m)
                n_iter = jnp.where(done, n_iter, i + 1)
                # conv records *actual* convergence (delta < tol), distinct
                # from done (which also latches on divergence rollback and
                # non-finite sweeps) — so n_iter < max_iter is never used as
                # a convergence proxy
                conv = conv | (~done & converged)
                done = done | converged | rb | (~ok)
                return (new_state, new_m, i + 1, n_iter, done, conv)

            m0 = eng._metric(model, state, kind)
            state, _, _, n_iter, _, conv = jax.lax.while_loop(
                cond, body, (state, m0, jnp.asarray(0), jnp.asarray(0),
                             jnp.asarray(False), jnp.asarray(False)))
            post = {
                eng.nodes[vi].id: self._post(vi, state)
                for vi in eng.variable_indices
            }
            return post, state, n_iter, conv

        self._run = run
        self._jit_single = jax.jit(run)
        self._jit_batch = jax.jit(jax.vmap(run, in_axes=(0, None, None, None)))
        # variant with a per-instance initial state (stacked leading axis),
        # e.g. informed-vs-uninformed SE inits varying along the batch
        self._jit_batch_state = jax.jit(
            jax.vmap(run, in_axes=(0, 0, None, None)))

    def init_state(self, initializer=None):
        return self.engine.init_state(initializer)

    # -- convergence-gated throughput mode (bf16 state + f32 polish) ------
    #: phase-1 stopping delta for kind "r": safely above the
    #: bf16-resolution floor where the bf16-state trajectory limit-cycles
    #: (~3e-3 measured, docs/performance.md) so the coarse gate always
    #: fires
    BF16_COARSE_TOL = 5e-3
    #: phase-1 delta for kind "v": the signed scalar-mean metric cancels
    #: the per-element bf16 quantization noise, so it stays live far
    #: below the elementwise floor (fires at 1e-5 with bf16 state,
    #: measured batch 768 N=1e4 on v5e)
    BF16_COARSE_TOL_V = 1e-5

    def _coarse_default(self):
        return (self.BF16_COARSE_TOL_V if self.stop_kind == "v"
                else self.BF16_COARSE_TOL)

    def _ensure_bf16_runs(self):
        """Jitted variants whose sweeps STORE the message state bfloat16,
        plus f32-forced twins for the polish phase. The engine's
        _store/_load consult config.state_bf16() at trace time; tracing
        happens at the first call, which solve_*_gated_bf16 always make
        inside the matching config override — so each executable bakes in
        its storage mode regardless of the ambient config afterwards.
        (The polish must NOT reuse _jit_single/_jit_batch_state: those
        bake the AMBIENT mode, so with a global STATE_BF16 = True opt-in
        the 'f32 polish' would silently sweep in bf16 and the true tol
        would never fire.)"""
        if getattr(self, "_jit_bf16_single", None) is None:
            self._jit_bf16_single = jax.jit(self._run)
            self._jit_bf16_batch = jax.jit(
                jax.vmap(self._run, in_axes=(0, None, None, None)))
            self._jit_f32_single = jax.jit(self._run)
            self._jit_f32_batch_state = jax.jit(
                jax.vmap(self._run, in_axes=(0, 0, None, None)))

    @staticmethod
    def _upcast_state(state):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
            state)

    def solve_gated_bf16(self, model, initializer=None, coarse_tol=None):
        """Convergence-GATED solve in throughput mode (VERDICT r3 item 3).

        bf16 message storage floors the relative-r stopping delta at bf16
        resolution, so a tol<=1e-4 gate never fires on the bf16 trajectory
        (the fixed point itself wanders at bf16 amplitude — error-feedback
        storage cannot fix that without f32-equivalent HBM traffic, which
        forfeits the entire bandwidth win). Instead: phase 1 runs bf16
        sweeps until the delta reaches ``coarse_tol`` (above the bf16
        floor, so it always fires), phase 2 upcasts the state once and
        polishes to the TRUE ``self.tol`` with warm-started f32 sweeps.
        Most iterations run at bf16-state throughput; the last few pay
        f32 traffic. Returns (post, n_iter_total, conv, info).

        The floor statement above is for the default kind "r" metric.
        With ``stop_kind="v"`` (mean-posterior-variance delta, reference
        EarlyStopping) the coarse gate defaults to 1e-5 — the signed
        scalar mean cancels the bf16 quantization noise; measured, the
        single-phase f32 v-gated solve then beats this two-phase split
        outright at default GEMM precision (docs/performance.md)."""
        from .. import config
        coarse = self._coarse_default() if coarse_tol is None else coarse_tol
        self._ensure_bf16_runs()
        prev = config.STATE_BF16
        config.STATE_BF16 = True
        try:
            state0 = self.init_state(initializer)
            _, state1, n1, conv1 = self._jit_bf16_single(
                model, state0, jnp.asarray(self.max_iter),
                jnp.asarray(coarse))
        finally:
            config.STATE_BF16 = prev
        state1 = self._upcast_state(state1)
        config.STATE_BF16 = False
        try:
            post, _, n2, conv2 = self._jit_f32_single(
                model, state1, jnp.asarray(self.max_iter),
                jnp.asarray(self.tol))
        finally:
            config.STATE_BF16 = prev
        return (post, int(n1) + int(n2), conv2,
                dict(n_iter_bf16=int(n1), n_iter_f32=int(n2),
                     coarse_fired=bool(conv1)))

    def solve_batch_gated_bf16(self, stacked_model, initializer=None,
                               coarse_tol=None):
        """Batched two-phase gated solve; every lane converges on the true
        tol in the f32 polish. Returns (post, n_iter_total, conv).

        NOTE (TPU, broadcast-W batched layouts): bf16-rounded GEMMs
        (default matmul precision) limit-cycle the relative-r delta at
        ~1e-3 in layouts where many lanes share one weight matrix
        (docs/performance.md — measured at N=1000 round 3 and N=1e4
        batch 768 round 4), so a tight tol never fires EVEN WITH f32
        state. For such solves run this method (it traces on first call)
        under ``jax.default_matmul_precision("highest")`` with
        ``config.MATVEC_BF16 = False``, stack per-lane weights, or —
        usually best — construct the solver with ``stop_kind="v"``: that
        criterion's scalar-mean metric cancels the rounding noise and
        gates at default precision (measured 4.8x faster,
        docs/performance.md). The kind-aware coarse phase-1 gate fires
        regardless."""
        from .. import config
        coarse = self._coarse_default() if coarse_tol is None else coarse_tol
        self._ensure_bf16_runs()
        prev = config.STATE_BF16
        config.STATE_BF16 = True
        try:
            state0 = self.init_state(initializer)
            _, state1, n1, _ = self._jit_bf16_batch(
                stacked_model, state0, jnp.asarray(self.max_iter),
                jnp.asarray(coarse))
        finally:
            config.STATE_BF16 = prev
        state1 = self._upcast_state(state1)
        config.STATE_BF16 = False
        try:
            post, _, n2, conv = self._jit_f32_batch_state(
                stacked_model, state1, jnp.asarray(self.max_iter),
                jnp.asarray(self.tol))
        finally:
            config.STATE_BF16 = prev
        return post, n1 + n2, conv

    def solve(self, model, initializer=None):
        "Solve one instance; returns dict id -> posterior data, and n_iter."
        post, n_iter, _ = self.solve_info(model, initializer)
        return post, n_iter

    def solve_info(self, model, initializer=None):
        """Like solve but also returns the converged flag (True iff the
        delta < tol criterion fired — False for divergence-rollback,
        non-finite and max_iter stops)."""
        state = self.init_state(initializer)
        post, _, n_iter, conv = self._jit_single(
            model, state, jnp.asarray(self.max_iter), jnp.asarray(self.tol))
        return post, n_iter, conv

    def solve_batch(self, stacked_model, initializer=None, state=None):
        """Solve a batch of instances (stacked leading axis on every model
        leaf). `initializer` may be a single InitialConditions (initial
        state broadcast across the batch) or a list of them, one per
        instance (e.g. per-instance informed CustomInit); the fused loop
        runs until every instance converges. Passing `state` (a batched
        state, e.g. restored from a checkpoint) resumes from it."""
        post, _, n_iter, _ = self._solve_batch(stacked_model, initializer,
                                               state)
        return post, n_iter

    def solve_batch_with_state(self, stacked_model, initializer=None,
                               state=None):
        """Like solve_batch but also returns the final batched message
        state, for checkpointing (see parallel.checkpoint) or warm
        restarts."""
        post, state, n_iter, _ = self._solve_batch(
            stacked_model, initializer, state)
        return post, state, n_iter

    def _solve_batch(self, stacked_model, initializer, state):
        if state is not None:
            return self._jit_batch_state(
                stacked_model, state,
                jnp.asarray(self.max_iter), jnp.asarray(self.tol))
        if isinstance(initializer, (list, tuple)):
            state = stack_pytrees([self.init_state(iz) for iz in initializer])
            return self._jit_batch_state(
                stacked_model, state,
                jnp.asarray(self.max_iter), jnp.asarray(self.tol))
        state = self.init_state(initializer)
        return self._jit_batch(
            stacked_model, state,
            jnp.asarray(self.max_iter), jnp.asarray(self.tol))


def solve_batch_shard_map(solver, stacked_model, mesh, data_axis="data",
                          initializer=None):
    """Explicit-collectives batch solve (SURVEY.md §5.8): `jax.shard_map`
    splits the instance batch over the mesh's `data_axis`; each device runs
    the fused convergence while_loop on its LOCAL shard only (vmap inside
    shard_map), so a device whose lanes have all converged stops sweeping
    instead of synchronizing with the globally slowest lane every iteration
    (the GSPMD `solve_batch` path compiles to one global loop). The only
    cross-device communication is explicit and final: `lax.all_gather` of
    the per-shard posteriors / iteration counts and a `lax.psum` of the
    converged-lane count, riding ICI.

    Per-lane results are bit-identical to `solve_batch` (converged lanes
    are frozen inside the loop either way). Returns
    ``(post, n_iter, n_converged)``, fully replicated on every device.
    ``n_converged`` counts lanes whose stopping criterion was actually met
    (delta < tol), excluding divergence-rollback and non-finite lanes.

    ``initializer`` must be a single InitialConditions (broadcast across
    the batch); per-instance initializer lists are only supported by
    ``solve_batch``.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if isinstance(initializer, (list, tuple)):
        raise ValueError(
            "solve_batch_shard_map broadcasts one initial state across the "
            "batch; per-instance initializer lists are only supported by "
            "solve_batch")
    n_dev = mesh.shape[data_axis]
    batch = jax.tree.leaves(stacked_model)[0].shape[0]
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by "
                         f"{data_axis}={n_dev}")
    state0 = solver.init_state(initializer)
    max_iter = jnp.asarray(solver.max_iter)
    tol = jnp.asarray(solver.tol)

    # cache the jitted shard_map per (mesh, data_axis): a fresh closure per
    # call would key the jit cache on a new function object and re-trace /
    # re-compile the fused while_loop graph every invocation
    cache = getattr(solver, "_shard_map_cache", None)
    if cache is None:
        cache = solver._shard_map_cache = {}
    # the in_specs bake the model/state pytree STRUCTURES into the compiled
    # fn: a structurally different stacked model (or initializer-derived
    # state) must recompile, not hit the cached executable with a confusing
    # spec/tree mismatch
    key = (mesh, data_axis, jax.tree.structure(stacked_model),
           jax.tree.structure(state0))
    if key not in cache:
        def local(model_shard, state0, max_iter, tol):
            run = jax.vmap(solver._run, in_axes=(0, None, None, None))
            post, _, n_iter, conv = run(model_shard, state0, max_iter, tol)
            n_conv = jax.lax.psum(jnp.sum(conv), data_axis)
            post = jax.tree.map(
                lambda x: jax.lax.all_gather(x, data_axis, axis=0,
                                             tiled=True),
                post)
            n_iter = jax.lax.all_gather(n_iter, data_axis, axis=0,
                                        tiled=True)
            return post, n_iter, n_conv

        in_model_specs = jax.tree.map(lambda _: P(data_axis), stacked_model)
        rep = jax.tree.map(lambda _: P(), (state0, max_iter, tol))
        # the while_loop carry inits (zeros state, i=0, done=False) are
        # replicated while the loop makes them device-varying; VMA/rep
        # inference rejects that promotion, so opt out of the check (the
        # kwarg is check_vma on current jax, check_rep on older releases)
        kwargs = dict(mesh=mesh, in_specs=(in_model_specs,) + rep,
                      out_specs=(P(), P(), P()))
        try:
            fn = shard_map(local, check_vma=False, **kwargs)
        except TypeError:
            fn = shard_map(local, check_rep=False, **kwargs)
        cache[key] = jax.jit(fn)
    return cache[key](stacked_model, state0, max_iter, tol)


class EPSolver(_Solver):
    engine_cls = ExpectationPropagation

    def _post(self, vi, state):
        p = self.engine._posterior(vi, state)
        return dict(r=p["b"] / p["a"], v=1.0 / p["a"])


class SESolver(_Solver):
    engine_cls = StateEvolution

    def _post(self, vi, state):
        p = self.engine._posterior(vi, state)
        return dict(v=1.0 / p["a"])
