"""Device mesh + sharding helpers: the TPU-native distribution layer.

Replaces the reference's NCCL/DDP story (SURVEY §2.7/§5.8:
PL ``strategy="ddp"``, torch.distributed barrier/broadcast) with one
``jax.sharding.Mesh``: the data-parallel axis is declared once, batches are
sharded on it, params replicated, and gradient reduction becomes an XLA psum
inside the jitted train step riding ICI.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Shard dim 0 of every leaf over the data axis.

    Leaves whose dim 0 is not divisible by the axis size (e.g. prompt-level
    tensors when views are sharded) are replicated instead — XLA inserts the
    broadcasts/collectives where the two batch levels meet.
    """
    n = mesh.shape[axis]

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)
