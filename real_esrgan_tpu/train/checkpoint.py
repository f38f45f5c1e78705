"""Checkpointing: Orbax trees with the reference's logical payload.

The reference saves ``{epoch, best_niqe, state_dict, ema_state_dict,
optimizer, scheduler}`` per epoch plus ``g_best``/``g_last`` copies
(/root/reference/train_realesrnet.py:117-129).  We keep the same payload
fields (params / ema_params / opt_state / epoch / best_niqe) in an Orbax
checkpoint directory, maintain best/last via directory copies, and can also
ingest the reference's ``.pth.tar`` files through models/convert.py.
"""

from __future__ import annotations

import os
import shutil
import threading
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp

from real_esrgan_tpu.models.convert import convert_generator, load_torch_checkpoint


def _checkpointer() -> ocp.Checkpointer:
    """Orbax checkpointer scoped to THIS process.

    Trainer IO is lead-host-only (state reaches the pod via
    parallel.broadcast_pytree), but Orbax's default save/restore runs
    cross-process barriers that deadlock/mismatch when only one host calls
    it — scope its multiprocessing to the calling process instead.
    """
    if jax.process_count() > 1:
        me = jax.process_index()
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me, active_processes={me},
                barrier_sync_key_prefix=f"proc{me}"))
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """Save a pytree payload to an Orbax checkpoint directory."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    with _checkpointer() as ckptr:
        ckptr.save(path, jax.device_get(payload))


def load_checkpoint(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    with _checkpointer() as ckptr:
        return ckptr.restore(path)


def copy_checkpoint(src: str, dst: str) -> None:
    """Crash-safe copy: build next to ``dst``, then swap via renames.

    ``dst`` may be the run's only ``results/<exp>/g_last`` — the GAN stage's
    default warm start — and the copy runs on the AsyncSaver thread, so the
    process can die at ANY point.  rmtree-then-copytree would leave a window
    with ``dst`` missing or partial; the rename swap keeps a complete tree at
    ``dst`` at all times (worst case a stale ``.old``/``.tmp`` sibling that
    the next copy clears)."""
    src, dst = os.path.abspath(src), os.path.abspath(dst)
    tmp, old = dst + ".tmp", dst + ".old"
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    shutil.copytree(src, tmp)
    if os.path.exists(dst):
        os.rename(dst, old)
    os.rename(tmp, dst)
    if os.path.exists(old):
        shutil.rmtree(old)


class AsyncSaver:
    """Overlap checkpoint IO with training compute.

    On a relayed/remote TPU an epoch save costs ~1 min of blocked wall clock
    (device→host fetch of ~200 MB of state + Orbax serialization) while the
    chip sits idle.  ``save()`` snapshots the device arrays on-device
    (cheap HBM copies — mandatory, because the jitted train step DONATES the
    state buffers, so by the next step the originals are gone) and hands the
    fetch + Orbax write + best/last copies to a background thread; the next
    epoch's steps dispatch immediately.

    At most one save is in flight: a new ``save()`` first joins the previous
    one (so checkpoints land in order), and ``wait()`` must be called once
    after the epoch loop so the final checkpoint is durable before exit.
    Failures surface on the NEXT save/wait rather than being swallowed.
    """

    def __init__(self) -> None:
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, path: str, payload: Dict[str, Any],
             copies: Sequence[str] = ()) -> None:
        self.save_many([(path, payload, copies)])

    def save_many(self, items: Sequence[tuple]) -> None:
        """``items``: (path, payload, copies) triples saved as one unit —
        the GAN stage writes g_* and d_* per epoch (reference
        train_realesrgan.py:155-177) and both must overlap training."""
        self.wait()
        import jax.numpy as jnp

        snapped = [(path,
                    jax.tree_util.tree_map(
                        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
                        payload),
                    tuple(copies)) for path, payload, copies in items]

        def work() -> None:
            try:
                for path, snap, copies in snapped:
                    save_checkpoint(path, snap)
                    for dst in copies:
                        copy_checkpoint(path, dst)
            except BaseException as exc:  # re-raised on next save()/wait()
                self._error = exc

        self._thread = threading.Thread(target=work, name="ckpt-save",
                                        daemon=False)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            error, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from error


def save_params_npz(path: str, params: Dict[str, Any],
                    dtype=np.float16) -> None:
    """Snapshot a generator param tree as one compressed ``.npz`` file.

    Keys are ``/``-joined tree paths; values default to f16 (~2 bytes/param,
    within bf16-compute round-off of the f32 originals).  This is the
    small-single-file archival format for trained weights — Orbax dirs stay
    the training format, ``.pth.tar`` the torch-interop format.
    """
    flat = {"/".join(str(getattr(k, "key", k)) for k in kp): np.asarray(v, dtype)
            for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez_compressed(path, **flat)


def _load_params_npz(path: str) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    with np.load(path) as data:
        for key in data.files:
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            arr = data[key]
            node[parts[-1]] = arr.astype(np.float32) \
                if arr.dtype == np.float16 else arr
    return tree


def load_generator_params(path: str, prefer_ema: bool = True) -> Dict[str, Any]:
    """Load generator params from any of the three weight formats:

    * reference ``.pth.tar``: uses ``ema_state_dict`` (with ``model.`` prefix
      strip) when present and preferred, else ``state_dict``
      (/root/reference/test.py:33-37, inference.py:27-34);
    * compact ``.npz`` snapshots written by ``save_params_npz``;
    * this framework's Orbax checkpoint dirs: ``ema_params`` or ``params``.
    """
    if path.endswith(".npz"):
        return _load_params_npz(path)
    if path.endswith((".pth.tar", ".pth", ".tar")):
        ckpt = load_torch_checkpoint(path)
        if isinstance(ckpt, dict) and ("state_dict" in ckpt or "ema_state_dict" in ckpt):
            key = "ema_state_dict" if (prefer_ema and "ema_state_dict" in ckpt) \
                else "state_dict"
            return convert_generator(ckpt[key])
        return convert_generator(ckpt)

    tree = load_checkpoint(path)
    if "ema_params" in tree and prefer_ema and tree["ema_params"] is not None:
        return tree["ema_params"]
    if "params" in tree:
        return tree["params"]
    return tree


def find_latest_checkpoint(samples_dir: str, prefix: str = "g_epoch_") -> str:
    """Newest ``<prefix>N`` checkpoint dir under ``samples_dir`` ('' if none).

    Backs the trainers' ``--resume auto`` elastic-restart mode: a preempted
    job relaunches with the same command and picks up where it stopped
    (the reference requires hand-editing config.py, README.md:53-58)."""
    if not os.path.isdir(samples_dir):
        return ""
    best, best_n = "", -1
    for name in os.listdir(samples_dir):
        if name.startswith(prefix):
            try:
                n = int(name[len(prefix):])
            except ValueError:
                continue
            if n > best_n and os.path.isdir(os.path.join(samples_dir, name)):
                best, best_n = os.path.join(samples_dir, name), n
    return best


def restore_like(template: Any, restored: Any, what: str = "state",
                 on_mismatch: str = "raise") -> Any:
    """Rebuild ``restored`` with ``template``'s tree structure.

    Orbax serializes pytrees structurally (optax opt_states — tuples of
    NamedTuples — come back as lists of dicts), which breaks tree_map against
    the live state.  Leaf ORDER is preserved by both flattenings (NamedTuple
    fields serialize as sorted dict keys, and optax's field names are already
    alphabetical), so unflattening into the template structure recovers the
    exact state.

    On structure/shape mismatch (e.g. the model or optimizer config changed
    between runs): raises by default — silently training from a fresh state
    while claiming to have resumed would be worse — or, with
    ``on_mismatch="template"``, warns loudly and returns the template.
    """
    t_leaves, t_def = jax.tree_util.tree_flatten(template)
    r_leaves = jax.tree_util.tree_leaves(restored)
    mismatch = None
    if len(t_leaves) != len(r_leaves):
        mismatch = f"{len(r_leaves)} leaves in checkpoint vs {len(t_leaves)} live"
    else:
        for a, b in zip(t_leaves, r_leaves):
            if np.shape(a) != np.shape(b):
                mismatch = f"shape {np.shape(b)} in checkpoint vs {np.shape(a)} live"
                break
    if mismatch:
        msg = f"Checkpoint {what} does not match the live structure ({mismatch})."
        if on_mismatch == "raise":
            raise ValueError(msg)
        print(f"WARNING: {msg} Keeping freshly-initialized {what}.")
        return template
    return jax.tree_util.tree_unflatten(t_def, r_leaves)


def merge_matching(params: Dict[str, Any], loaded: Dict[str, Any]) -> Dict[str, Any]:
    """Filtered merge: only leaves whose path+shape match are overwritten —
    the reference's partial/migration loading semantics
    (/root/reference/train_realesrnet.py:68-72)."""

    def merge(dst, src):
        if not isinstance(dst, dict):
            if src is not None and np.shape(dst) == np.shape(src):
                return src
            return dst
        out = {}
        for k, v in dst.items():
            out[k] = merge(v, src.get(k)) if isinstance(src, dict) else v
        return out

    return merge(params, loaded)
