"""Device-mesh utilities: instance (data) parallelism over stacked models
and model parallelism over the N-dimensional belief arrays / sensing
matrices. Collectives are inserted by XLA from sharding annotations (the
contraction dimensions of the SVD-basis matvecs are the only cross-shard
communication)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, axis_names=("data", "model")):
    """Build a Mesh over all available devices. `shape` defaults to
    (n_devices, 1)."""
    devices = np.array(jax.devices())
    n = devices.size
    if shape is None:
        shape = (n, 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    return Mesh(devices.reshape(shape), axis_names)


def _leaf_spec(x, batched, data_axis, model_axis, model_dims):
    ndim = jnp.ndim(x)
    spec = [None] * ndim
    if batched and ndim >= 1:
        spec[0] = data_axis
    # shard the largest trailing dim over the model axis when divisible
    if model_axis is not None and ndim >= (2 if batched else 1):
        last = ndim - 1
        if x.shape[last] % model_dims == 0 and x.shape[last] >= model_dims:
            spec[last] = model_axis
    return P(*spec)


def shard_batched_model(stacked_model, mesh, data_axis="data",
                        model_axis="model"):
    """Place a stacked Model pytree on the mesh: leading (instance) axis over
    `data_axis`, largest trailing dims over `model_axis` when divisible."""
    model_dims = mesh.shape[model_axis] if model_axis in mesh.shape else 1

    def place(x):
        spec = _leaf_spec(x, True, data_axis,
                          model_axis if model_dims > 1 else None, model_dims)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, stacked_model)


def shard_batched_state(state, mesh, data_axis="data", model_axis="model"):
    model_dims = mesh.shape[model_axis] if model_axis in mesh.shape else 1

    def place(x):
        spec = _leaf_spec(x, True, data_axis,
                          model_axis if model_dims > 1 else None, model_dims)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, state)
