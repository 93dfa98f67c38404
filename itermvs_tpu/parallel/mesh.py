"""Device-mesh helpers: data parallelism over ICI.

The reference's only parallelism is single-node `nn.DataParallel`
(train.py:95). The TPU-native equivalent: a 1-D `jax.sharding.Mesh`
over all local devices with the batch axis sharded; jit/GSPMD inserts
the gradient all-reduce over ICI automatically. Multi-host extends the
same mesh across DCN via `jax.distributed.initialize` (see
initialize_distributed).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def initialize_distributed():
    """Multi-host init (no-op when single-process)."""
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process run
