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

    from jax._src import distributed as _distributed

    if _distributed.global_state.client is not None:
        return True  # already initialized (idempotent across main() calls)
    addr = os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        # Explicit wiring (also how the multi-process CI drives this path);
        # num_processes/process_id fall back to jax's cluster autodetection
        # when unset.
        kwargs = {"coordinator_address": addr}
        if os.environ.get("NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["NUM_PROCESSES"])
        if os.environ.get("PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["PROCESS_ID"])
        jax.distributed.initialize(**kwargs)
        return True
    if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
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


def broadcast_string(s: str, max_len: int = 4096) -> str:
    """Every process returns process 0's string (no-op on a single host).

    Used by the trainers' ``--resume auto`` elastic restart: the checkpoint
    path must be resolved ONCE (the lead host writes the checkpoints) and
    agreed on by everyone — per-process resolution can silently diverge on
    pods without a shared filesystem (fresh epoch-0 state on some hosts while
    others resume at epoch N deadlocks the collectives).
    """
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    raw = s.encode()[:max_len]
    buf = np.zeros((max_len,), np.uint8)
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out).rstrip(b"\x00").decode()


def broadcast_pytree(tree):
    """Every process returns process 0's pytree (same structure required on
    all processes; no-op on a single host).  Lets the lead host load a
    checkpoint from local disk and hand bit-identical state to the pod."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
