"""Device mesh + sharding helpers (the distributed backend of this framework).

The reference is single-GPU with no collectives (/root/reference/config.py:68;
see SURVEY.md §2).  Here data parallelism is first-class: a 1-D ``data`` mesh
over all local devices (ICI within a slice), batches sharded along it,
parameters replicated, and the gradient all-reduce inserted by XLA when the
jitted train step consumes sharded batches with replicated params.  Multi-host
extends this by calling ``jax.distributed.initialize()`` before ``make_mesh``
(jax.devices() then spans the full pod and DCN is used across slices).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Initialize multi-host JAX when launched under a cluster scheduler.

    After this, jax.devices() spans every chip in the pod/slice set and
    make_mesh() builds the global data mesh (collectives ride ICI inside a
    slice, DCN across slices).  No-op on a single host.
    """
    import os

    import jax

    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int = 4, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch so its leading axis is split across devices."""
    return jax.device_put(batch, batch_sharding(mesh, np.ndim(batch), axis_name))
