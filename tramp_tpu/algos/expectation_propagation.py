"""Expectation Propagation engine.
Reference tramp/algos/expectation_propagation.py."""
import jax.numpy as jnp

from ..base import Variable, compute_ab_new
from .message_passing import MessagePassing, slot, FWD, BWD


def _unwrap(msgs, n):
    a = [m["a"] for m in msgs]
    b = [m["b"] for m in msgs]
    if n == 1:
        return a[0], b[0]
    return a, b


class ExpectationPropagation(MessagePassing):

    # reference default EP callback EarlyStoppingEP (callbacks.py:250-286):
    # stop on relative-r change < tol; rollback + stop when the relative
    # change jumps above 0.2 after 5 iterations (catches the reset cycle
    # after perfect recovery, where precisions hit AMAX).
    default_stop_kind = "r"
    rollback_increase = 0.2
    wait_increase = 5

    def __init__(self, model):
        model.init_shapes()
        super().__init__(model, message_keys=["a", "b"])

    # -- pinned constant messages (message_passing.py pinned machinery) ----
    def _constant_factor_message(self, node):
        if node.n_next == 0:
            fn = getattr(node, "constant_backward_message", None)
            return fn is not None and fn() is not None
        if node.n_prev == 0:
            return getattr(node, "constant_forward_message", None) is not None
        return False

    def _factor_constant_message(self, model, i):
        node = model.nodes[i]
        if node.n_next == 0:
            return node.constant_backward_message()
        return node.constant_forward_message()

    # -- spectral-image carry (config.SPECTRAL_CARRY) ----------------------
    # Dense LinearChannels at ANY tree position carry U^T bx across sweeps
    # (the message state's trailing cache dict): the forward pass reads the
    # image the previous backward pass computed — bx (the bwd slot of the
    # factor's out edge) cannot change in between because the forward pass
    # writes only fwd slots. Per linear factor per sweep this saves one thin
    # (Nx, k) GEMM: 2 Nz k + 3 Nx k -> 2 Nz k + 2 Nx k MACs (V^T bz is
    # already CSE'd by XLA within a sweep; U^T bx is the cross-sweep
    # duplicate only a carry can remove). Generalizes the chain-only ML-VAMP
    # carry discipline (parallel/ml_vamp.py:16-47); the two matvecs being
    # cached are the reference's linear_channel.py:69-83. Trajectories are
    # bit-identical to the uncached engine (same _mm, same stored operand).
    def _init_spectral_factors(self):
        from .. import config
        if not config.spectral_carry():
            return ()
        if not self.harmonize:
            # explain/latex wrappers print per-slot updates eagerly and
            # cannot host the ("spec", key) update channel
            return ()
        from ..channels import LinearChannel
        out = []
        for i, node in enumerate(self.nodes):
            if type(node) is not LinearChannel:
                continue
            e_out = self.model.out_edges[i][0]
            if slot(e_out, BWD) in self.pinned:
                # bx is a model constant: U^T bx is loop-invariant and XLA
                # LICM hoists it already; carrying it would only add state
                continue
            out.append(i)
        return out

    def _spectral_forward(self, i, node, state):
        """Forward message with the carried u = U^T bx (no fresh U^T GEMM).
        The math lives in LinearChannel.spectral_forward_posterior — the
        same code the uncached path routes through — so the two paths
        cannot drift apart."""
        e_in = self.model.in_edges[i][0]
        e_out = self.model.out_edges[i][0]
        m_in = self._load_msg(state[slot(e_in, FWD)])
        m_out = self._load_msg(state[slot(e_out, BWD)])
        az, bz = m_in["a"], m_in["b"]
        ax, bx = m_out["a"], m_out["b"]
        u = state[self.n_slots][str(i)]
        rx, vx = node.spectral_forward_posterior(az, bz, ax, u)
        a_new, b_new = compute_ab_new(rx, vx, ax, bx)
        return {slot(e_out, FWD): {"a": a_new, "b": b_new}}

    def _spectral_backward(self, i, node, state):
        "Backward message; the fresh U^T bx becomes the carried image."
        e_in = self.model.in_edges[i][0]
        e_out = self.model.out_edges[i][0]
        m_in = self._load_msg(state[slot(e_in, FWD)])
        m_out = self._load_msg(state[slot(e_out, BWD)])
        az, bz = m_in["a"], m_in["b"]
        ax, bx = m_out["a"], m_out["b"]
        rz, vz, u = node.spectral_backward_posterior(az, bz, ax, bx)
        a_new, b_new = compute_ab_new(rz, vz, az, bz)
        return {slot(e_in, BWD): {"a": a_new, "b": b_new},
                ("spec", str(i)): u}

    # -- factor ops -------------------------------------------------------
    def _factor_forward(self, i, node, state, aux):
        if i in self._spectral:
            return self._spectral_forward(i, node, state)
        prev_msgs, next_msgs = self._gather_factor_inputs(i, state)
        ax, bx = _unwrap(next_msgs, node.n_next)
        if node.n_prev == 0:
            a_new, b_new = node.compute_forward_message(ax, bx)
        else:
            az, bz = _unwrap(prev_msgs, node.n_prev)
            a_new, b_new = node.compute_forward_message(az, bz, ax, bx)
        out_edges = self.model.out_edges[i]
        if node.n_next == 1:
            return {slot(out_edges[0], FWD): {"a": a_new, "b": b_new}}
        return {slot(e, FWD): {"a": a, "b": b}
                for e, a, b in zip(out_edges, a_new, b_new)}

    def _factor_backward(self, i, node, state, aux):
        if i in self._spectral:
            return self._spectral_backward(i, node, state)
        prev_msgs, next_msgs = self._gather_factor_inputs(i, state)
        az, bz = _unwrap(prev_msgs, node.n_prev)
        if node.n_next == 0:
            a_new, b_new = node.compute_backward_message(az, bz)
        else:
            ax, bx = _unwrap(next_msgs, node.n_next)
            a_new, b_new = node.compute_backward_message(az, bz, ax, bx)
        in_edges = self.model.in_edges[i]
        if node.n_prev == 1:
            return {slot(in_edges[0], BWD): {"a": a_new, "b": b_new}}
        return {slot(e, BWD): {"a": a, "b": b}
                for e, a, b in zip(in_edges, a_new, b_new)}

    # -- posterior update (reference expectation_propagation.py:17-19) ----
    def update(self, variable, post):
        a_hat, b_hat = post["a"], post["b"]
        return dict(r=b_hat / a_hat, v=1.0 / a_hat)

    # -- objective ---------------------------------------------------------
    def variable_objective(self, var, v_idx, post):
        "Variable log partition. Reference base.py:146-150."
        ax, bx = post["a"], post["b"]
        logZ = 0.5 * jnp.sum(
            bx**2 / ax + jnp.log(2 * jnp.pi / ax) * jnp.ones_like(bx))
        return jnp.where(jnp.all(ax > 0), logZ, jnp.inf)

    def node_objective_at(self, i, state):
        node = self.nodes[i]
        if isinstance(node, Variable):
            return self.variable_objective(node, i, self._posterior(i, state))
        prev_msgs, next_msgs = self._gather_factor_inputs(i, state)
        if node.n_prev == 0:
            ax, bx = _unwrap(next_msgs, node.n_next)
            return node.compute_log_partition(ax, bx)
        if node.n_next == 0:
            az, bz = _unwrap(prev_msgs, node.n_prev)
            return node.compute_log_partition(az, bz, node.y)
        az, bz = _unwrap(prev_msgs, node.n_prev)
        ax, bx = _unwrap(next_msgs, node.n_next)
        return node.compute_log_partition(az, bz, ax, bx)

    def log_evidence(self, update=True):
        if update:
            self.update_objective()
        return self.A_model

    def surprisal(self, update=True):
        return -self.log_evidence(update)
