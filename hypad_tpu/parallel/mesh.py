"""Device-mesh construction (layer: parallelism; SURVEY.md §2.3/§5).

The reference is single-GPU (bare .cuda(), no torch.distributed anywhere);
data parallelism over the batch axis is the one strategy required for
capability parity and is free headroom. The trainer expresses it as a
1-D ``dp`` mesh: parameters replicated, batches sharded, XLA inserts the
gradient all-reduces over ICI. TP/PP/SP/EP are explicit non-goals for this
model family (~100k params, window 100, no attention) but the mesh helper
accepts arbitrary axis layouts so larger meshes compose later.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(devices="all", axis_name="dp", shape=None, axis_names=None):
    """Build a device mesh. Default: 1-D data-parallel over ``axis_name``.

    devices: 'all' | int | explicit device list. Returns None for a single
    device (the trainer then skips sharding constraints entirely).

    ``shape``/``axis_names``: optional n-D layout, e.g.
    ``make_mesh(shape=(4, 2), axis_names=("dp", "mp"))`` — the HypAD model
    family only exercises the ``dp`` axis (TP/PP/SP/EP are documented
    non-goals, SURVEY §2.3), but the trainer's and scorer's PartitionSpecs
    name axes explicitly, so they run unchanged on any mesh that carries a
    ``dp`` axis (parameters/batches replicated over the extra axes);
    tests/test_trainer.py asserts dp-on-2D-mesh == single-device.
    """
    if devices == "all":
        devs = jax.devices()
    elif isinstance(devices, int):
        devs = jax.devices()[:devices]
    else:
        devs = list(devices)
    if shape is not None:
        n = int(np.prod(shape))
        if len(devs) < n:
            raise ValueError(f"mesh shape {shape} needs {n} devices, "
                             f"have {len(devs)}")
        names = axis_names or ("dp", "mp")[: len(shape)]
        return Mesh(np.array(devs[:n]).reshape(shape), names)
    if len(devs) <= 1:
        return None
    return Mesh(np.array(devs), (axis_name,))


def shard_leading(mesh, axis_name="dp"):
    """Returns f(tree) constraining the LEADING axis of every leaf over the
    given mesh axis (identity when mesh is None). Used by the fleet trainer
    and fleet detector: the signal axis is embarrassingly parallel, so each
    device owns its shard of the fleet with zero collectives."""
    if mesh is None:
        return lambda tree: tree
    from jax.sharding import NamedSharding, PartitionSpec as P

    def constrain(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(axis_name))), tree)

    return constrain


def batch_multiple(batch_size, mesh):
    """Largest batch size <= batch_size divisible by the dp axis (XLA shards
    evenly; the reference's drop_last already trims the dataset)."""
    if mesh is None:
        return batch_size
    n = mesh.devices.size
    return max((batch_size // n) * n, n)
