"""Device-mesh + sharding helpers (the TPU replacement for DataParallel).

The reference scales with torch.nn.DataParallel (single-process
replicate/gather, executor/executor.py:53-55). TPU-native scaling is a
jax.sharding.Mesh: the batch (point) axis is sharded over the 'data' axis,
params replicated; XLA inserts the gradient all-reduce (psum over ICI)
automatically under jit. The same code spans hosts (DCN) after
jax.distributed.initialize — no separate "distributed executor" is needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Optional[Mesh]):
    """Annotate a batched array as sharded over 'data' (inside jit)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, data_sharding(mesh))
