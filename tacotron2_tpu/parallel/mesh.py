"""Device mesh construction.

Replaces the reference's process-per-GPU NCCL world
(/root/reference/multiproc.py, distributed.py, train.py:27-39) with a
``jax.sharding.Mesh``: axis ``dp`` shards the utterance batch, axis ``mp``
optionally shards wide weight matrices (tensor parallelism — the reference
has none; 28M params don't need it, but the axis keeps the design honest
for scaling). XLA emits the gradient psum/all-gathers over ICI from the
shardings; there is no hand-written collective code in the training path.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "mp"


def create_mesh(shape: Optional[Tuple[int, int]] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, mp) mesh. shape=None (or (1,1), the config default) means
    "all devices on the dp axis"; an explicit shape may use a leading subset
    of the devices."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None or tuple(shape) == (1, 1) and len(devices) > 1:
        shape = (len(devices), 1)
    dp, mp = shape
    if dp * mp > len(devices):
        raise ValueError(f"mesh shape {shape} needs {dp * mp} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices[:dp * mp]).reshape(dp, mp)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def initialize_distributed() -> None:
    """Multi-host runtime bring-up (equivalent of the reference's
    ``init_distributed``/NCCL rendezvous, train.py:27-39). On TPU pods the
    coordinator address and process indices come from the environment."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process environment (tests, single-host dev) — fine.
        pass


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every batch leaf over dp."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
