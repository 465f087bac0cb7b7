"""Checkpointing: save / resume / warm-start.

Same three modes as the reference (/root/reference/train.py:84-118):
- fresh start;
- resume: restores params, optimizer state, step, and learning rate;
- warm start: loads weights only, dropping subtrees named in
  ``ignore_layers`` (default: the embedding — used when transferring to a
  new symbol set, README.md:36-41).

Format: one ``.npz`` per checkpoint holding the flattened state (keys are
``/``-joined tree paths) + a JSON sidecar with scalar metadata. Writing
happens on a background thread (async, like Orbax's async checkpointing)
and only on process 0 — replicated state is identical across hosts.
"""

from __future__ import annotations

import json
import os
import re
import threading
from typing import Any, Dict, List, Optional

import numpy as np

import jax

from tacotron2_tpu.training.state import TrainState

_CKPT_RE = re.compile(r"^checkpoint_(\d+)\.npz$")


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = "/".join(_path_token(p) for p in path)
        flat[key] = np.asarray(jax.device_get(leaf))
    return flat


def _path_token(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def _unflatten(tree_like: Any, flat: Dict[str, np.ndarray]) -> Any:
    paths_leaves = jax.tree_util.tree_leaves_with_path(tree_like)
    leaves = []
    for path, like in paths_leaves:
        key = "/".join(_path_token(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        value = flat[key]
        if tuple(value.shape) != tuple(like.shape):
            raise ValueError(f"shape mismatch at {key}: checkpoint "
                             f"{value.shape} vs model {like.shape}")
        leaves.append(value.astype(np.asarray(like).dtype
                                   if hasattr(like, "dtype") else value.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(tree_like), leaves)


class Checkpointer:
    """Directory of ``checkpoint_<step>.npz`` files with async writes."""

    def __init__(self, directory: str, keep: int = 5):
        self.directory = directory
        self.keep = keep
        self._pending: Optional[threading.Thread] = None
        if jax.process_index() == 0:
            os.makedirs(directory, exist_ok=True)

    # ---------------- save ----------------

    def save(self, state: TrainState, wait: bool = False) -> Optional[str]:
        """Snapshot and write asynchronously. Returns the path (process 0)."""
        if jax.process_index() != 0:
            return None
        self.wait()  # one write in flight at a time
        step = int(state.step)
        path = os.path.join(self.directory, f"checkpoint_{step}.npz")
        flat = _flatten(state)  # device->host snapshot happens NOW

        def write():
            tmp = path + ".tmp"
            np.savez(tmp, **flat)
            os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                       path)
            # learning_rate exists on the acoustic TrainState only; vocoder
            # states (flow NLL, HiFi-GAN) carry their schedule in opt_state
            meta = {"step": step}
            if "learning_rate" in flat:
                meta["learning_rate"] = float(flat["learning_rate"])
            with open(path + ".json", "w") as f:
                json.dump(meta, f)
            self._gc()

        self._pending = threading.Thread(target=write, daemon=True)
        self._pending.start()
        if wait:
            self.wait()
        return path

    def wait(self) -> None:
        if self._pending is not None:
            self._pending.join()
            self._pending = None

    def _gc(self) -> None:
        ckpts = self.all_checkpoints()
        for path in ckpts[:-self.keep] if self.keep else []:
            for suffix in ("", ".json"):
                try:
                    os.remove(path + suffix)
                except OSError:
                    pass

    # ---------------- restore ----------------

    def all_checkpoints(self) -> List[str]:
        if not os.path.isdir(self.directory):
            return []
        found = []
        for name in os.listdir(self.directory):
            match = _CKPT_RE.match(name)
            if match:
                found.append((int(match.group(1)),
                              os.path.join(self.directory, name)))
        return [p for _, p in sorted(found)]

    def latest(self) -> Optional[str]:
        ckpts = self.all_checkpoints()
        return ckpts[-1] if ckpts else None

    def restore(self, state_like: TrainState,
                path: Optional[str] = None) -> TrainState:
        """Full resume: params + optimizer + step + learning rate
        (reference load_checkpoint, train.py:99-109)."""
        path = path or self.latest()
        if path is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        with np.load(path) as archive:
            flat = {k: archive[k] for k in archive.files}
        return _unflatten(state_like, flat)


def warm_start(fresh_params: Any, loaded_params: Any,
               ignore_layers: List[str]) -> Any:
    """Merge loaded weights into fresh params, skipping any leaf whose tree
    path contains a name in ``ignore_layers`` (reference warm_start_model,
    train.py:84-96; default ignore: the embedding)."""
    ignore = set(ignore_layers)

    fresh_flat = jax.tree_util.tree_leaves_with_path(fresh_params)
    loaded_flat = dict(
        ("/".join(_path_token(p) for p in path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(loaded_params))

    merged = []
    for path, fresh_leaf in fresh_flat:
        key = "/".join(_path_token(p) for p in path)
        tokens = set(key.split("/"))
        if tokens & ignore or key not in loaded_flat:
            merged.append(fresh_leaf)
        else:
            merged.append(loaded_flat[key])
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(fresh_params), merged)
