"""State evolution engine: scalar-precision messages, ensemble-averaged
errors. Reference tramp/algos/state_evolution.py.

The entire SE state is a handful of scalars per edge, so thousands of
(alpha, rho) grid points can be vmapped/sharded as one stacked model."""
import jax.numpy as jnp

from ..base import Variable
from .message_passing import MessagePassing, slot, FWD, BWD


def _unwrap_a(msgs, n):
    a = [m["a"] for m in msgs]
    return a[0] if n == 1 else a


class StateEvolution(MessagePassing):

    # reference default SE callback: EarlyStopping(max_increase=0.2,
    # wait_increase=5) with rollback (callbacks.py:195-243)
    default_stop_kind = "v"
    rollback_increase = 0.2
    wait_increase = 5

    needs_shapes = False

    def __init__(self, model):
        super().__init__(model, message_keys=["a"])

    def _prepare(self, model):
        "tau per variable node index, traced from the model arrays."
        return model.init_second_moments()

    def _tau_prev(self, i, aux):
        taus = [aux[self.model.edges[e][0]] for e in self.model.in_edges[i]]
        node = self.model.nodes[i]
        return taus[0] if node.n_prev == 1 else taus

    def _factor_forward(self, i, node, state, aux):
        prev_msgs = [state[slot(e, FWD)] for e in self.model.in_edges[i]]
        next_msgs = [state[slot(e, BWD)] for e in self.model.out_edges[i]]
        ax = _unwrap_a(next_msgs, node.n_next)
        if node.n_prev == 0:
            a_new = node.compute_forward_state_evolution(ax)
        else:
            az = _unwrap_a(prev_msgs, node.n_prev)
            tau_z = self._tau_prev(i, aux)
            a_new = node.compute_forward_state_evolution(az, ax, tau_z)
        out_edges = self.model.out_edges[i]
        if node.n_next == 1:
            return {slot(out_edges[0], FWD): {"a": a_new}}
        return {slot(e, FWD): {"a": a} for e, a in zip(out_edges, a_new)}

    def _factor_backward(self, i, node, state, aux):
        prev_msgs = [state[slot(e, FWD)] for e in self.model.in_edges[i]]
        next_msgs = [state[slot(e, BWD)] for e in self.model.out_edges[i]]
        az = _unwrap_a(prev_msgs, node.n_prev)
        tau_z = self._tau_prev(i, aux)
        if node.n_next == 0:
            a_new = node.compute_backward_state_evolution(az, tau_z)
        else:
            ax = _unwrap_a(next_msgs, node.n_next)
            a_new = node.compute_backward_state_evolution(az, ax, tau_z)
        in_edges = self.model.in_edges[i]
        if node.n_prev == 1:
            return {slot(in_edges[0], BWD): {"a": a_new}}
        return {slot(e, BWD): {"a": a} for e, a in zip(in_edges, a_new)}

    # -- posterior update (reference state_evolution.py:17-19) ------------
    def update(self, variable, post):
        return dict(v=1.0 / post["a"])

    # -- objective ---------------------------------------------------------
    def variable_objective(self, var, v_idx, post):
        "Variable free energy. Reference base.py:133-136."
        ax = post["a"]
        taus = self.model.init_second_moments()
        tau_x = taus[v_idx]
        I = 0.5 * jnp.log(ax * tau_x)
        return 0.5 * ax * tau_x - I + 0.5 * jnp.log(2 * jnp.pi * tau_x / jnp.e)

    def node_objective_at(self, i, state):
        node = self.nodes[i]
        aux = self.model.init_second_moments()
        if isinstance(node, Variable):
            return self.variable_objective(node, i, self._posterior(i, state))
        prev_msgs = [state[slot(e, FWD)] for e in self.model.in_edges[i]]
        next_msgs = [state[slot(e, BWD)] for e in self.model.out_edges[i]]
        if node.n_prev == 0:
            ax = _unwrap_a(next_msgs, node.n_next)
            return node.compute_free_energy(ax)
        tau_z = self._tau_prev(i, aux)
        az = _unwrap_a(prev_msgs, node.n_prev)
        if node.n_next == 0:
            return node.compute_free_energy(az, tau_z)
        ax = _unwrap_a(next_msgs, node.n_next)
        return node.compute_free_energy(az, ax, tau_z)

    def entropy(self, update=True):
        if update:
            self.update_objective()
        return -self.A_model
