"""Load the upstream reference (sphinxteam/tramp at /root/reference) as a
numerical oracle for parity tests.

The reference requires networkx<2; this module monkeypatches the handful of
1.x API behaviors it relies on (list-returning predecessors/successors/
in_edges/out_edges, ``dag.node``, list-returning topological_sort) onto
networkx 3.x before importing it.

Only used as a test oracle — no reference code is copied into tramp_tpu.
"""
import os
import sys

REFERENCE_PATH = "/root/reference"

_tramp = None


def _install_nx1_shim():
    import networkx as nx

    if getattr(nx, "_nx1_shim", False):
        return
    _DG = nx.DiGraph

    class DiGraph1x(_DG):
        @property
        def node(self):
            return self.nodes

        def predecessors(self, n):
            return list(_DG.predecessors(self, n))

        def successors(self, n):
            return list(_DG.successors(self, n))

        def in_edges(self, *a, **k):
            return list(_DG.in_edges.func(self)(*a, **k))

        def out_edges(self, *a, **k):
            return list(_DG.out_edges.func(self)(*a, **k))

    nx.DiGraph = DiGraph1x
    _ts = nx.topological_sort
    nx.topological_sort = lambda g: list(_ts(g))
    nx._nx1_shim = True


def _install_numpy_shim():
    "Restore numpy aliases the reference uses that numpy 2 removed."
    import numpy as np

    if not hasattr(np, "product"):
        np.product = np.prod
    if not hasattr(np, "float_"):
        np.float_ = np.float64


def reference_available():
    return os.path.isdir(os.path.join(REFERENCE_PATH, "tramp"))


def load_reference():
    "Returns the reference `tramp` package (imports it on first call)."
    global _tramp
    if _tramp is not None:
        return _tramp
    _install_nx1_shim()
    _install_numpy_shim()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import tramp as _t
    _tramp = _t
    return _tramp
