from .solver import EPSolver, SESolver, stack_pytrees
from .mesh import make_mesh, shard_batched_model, shard_batched_state

__all__ = [
    "EPSolver", "SESolver", "stack_pytrees", "make_mesh",
    "shard_batched_model", "shard_batched_state",
]
