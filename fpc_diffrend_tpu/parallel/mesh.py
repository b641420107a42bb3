"""Device mesh construction and sharding rules.

The reference is strictly single-GPU/serial (SURVEY.md §2c: no
torch.distributed, no NCCL, one (camera, frame) sample per step). Scaling
here is designed TPU-first with jax.sharding:

  axes:
    "frame" — data parallelism over video-frame samples (DCN-friendly:
              per-frame pose params live with their shard)
    "view"  — parallelism over cameras within a sample batch (ICI)
    "tile"  — spatial parallelism over image rows within one render (ICI;
              halo exchange of one row for the antialias seam)

Parameters are replicated; gradients of shared parameters (texture, rig,
per-camera pose) are combined by XLA-inserted all-reduces when the batch
is sharded (the pjit path), or explicit psums in the shard_map path.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names=("frame", "view"), shape=None,
              devices=None) -> Mesh:
    """Create a Mesh over the available devices.

    :param shape: per-axis sizes; default packs all devices on the first
        axis. Product must equal the device count used.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (B, ...) batch across every mesh axis (flattened order)."""
    return NamedSharding(mesh, P(mesh.axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a batch pytree with its leading axis split over all mesh axes."""
    return jax.device_put(tree, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
