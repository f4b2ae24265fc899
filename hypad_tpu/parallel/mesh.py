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


def make_mesh(devices="all", axis_name="dp"):
    """Build a 1-D data-parallel mesh.

    devices: 'all' | int | explicit device list. Returns None for a single
    device (the trainer then skips sharding constraints entirely).
    """
    if devices == "all":
        devs = jax.devices()
    elif isinstance(devices, int):
        devs = jax.devices()[:devices]
    else:
        devs = list(devices)
    if len(devs) <= 1:
        return None
    return Mesh(np.array(devs), (axis_name,))


def batch_multiple(batch_size, mesh):
    """Largest batch size <= batch_size divisible by the dp axis (XLA shards
    evenly; the reference's drop_last already trims the dataset)."""
    if mesh is None:
        return batch_size
    n = mesh.devices.size
    return max((batch_size // n) * n, n)
