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

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "mp"

# Environment variables that indicate a multi-process run whose coordinator
# must be contacted BEFORE the local XLA backend is initialized.
_COORDINATOR_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",   # explicit jax.distributed configuration
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",  # multi-slice runtime
)


def _multiprocess_env() -> bool:
    if any(os.environ.get(v) for v in _COORDINATOR_ENV_VARS):
        return True
    # Cloud TPU pod slice metadata: multi-process only with >1 worker —
    # a single-entry list is a plain single-host VM.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hostnames.split(",") if h.strip()]) > 1


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


def initialize_distributed(
        coordinator_address: Optional[str] = None,
        num_processes: Optional[int] = None,
        process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up (equivalent of the reference's
    ``init_distributed``/NCCL rendezvous, train.py:27-39).

    Must run BEFORE anything touches the XLA backend (``jax.devices()``,
    ``jax.process_count()``, any jit): JAX requires distributed init to
    precede backend initialization, and querying the backend first would
    silently degrade a pod run into N independent single-process runs.
    Therefore the multi-process decision is made purely from the explicit
    arguments / environment, never from backend queries.

    Explicit arguments (used by the 2-process localhost test,
    tests/test_distributed.py) or a coordinator environment variable make
    rendezvous mandatory — failures propagate loudly. With neither, this is
    a single-process run and a no-op.
    """
    if jax.distributed.is_initialized():
        return
    explicit = coordinator_address is not None
    if not (explicit or _multiprocess_env()):
        return  # single-process environment (tests, single-host dev)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every batch leaf over dp."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
