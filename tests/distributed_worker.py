"""Worker process for the 2-process ``jax.distributed`` localhost test.

Spawned by tests/test_distributed.py. Covers the process-boundary behavior
the reference exercises only on a real multi-GPU node
(/root/reference/multiproc.py:1-23, train.py:27-39): coordinator
rendezvous, cross-process collectives, per-host dataset sharding
(the DistributedSampler equivalent, data/pipeline.py), and host-0-only
checkpoint I/O.

Usage: python distributed_worker.py <coordinator_addr> <num_procs> <pid> <outdir>
"""

import collections
import json
import os
import sys


def main() -> None:
    addr, num, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    # Rendezvous MUST precede any backend touch (jax.devices(), jit, ...).
    from tacotron2_tpu.parallel.mesh import create_mesh, initialize_distributed

    initialize_distributed(coordinator_address=addr, num_processes=num,
                           process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == num, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())

    # 1. Cross-process collective: global sum over a dp-sharded array whose
    # shards live on different processes (the gradient-psum path in miniature).
    mesh = create_mesh()
    sharding = NamedSharding(mesh, P("dp"))
    local = np.full((n_local, 8), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        sharding, local, (n_global, 8))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    total = float(jax.device_get(total))

    # 2. Per-host dataset sharding: DataPipeline takes a strided slice by
    # process index (pipeline.py), like the reference's DistributedSampler
    # (train.py:49).
    from tacotron2_tpu.config import Tacotron2Config
    from tacotron2_tpu.data.pipeline import DataPipeline

    class _StubDataset:
        entries = [None] * 10

        def __len__(self) -> int:
            return 10

    pipe = DataPipeline(_StubDataset(), Tacotron2Config())
    indices = list(pipe.indices)

    # 3. Host-0-only checkpoint I/O (reference: rank-0 save, train.py:249-253).
    from tacotron2_tpu.training.checkpoint import Checkpointer

    Fake = collections.namedtuple("Fake", ["step", "learning_rate", "params"])
    state = Fake(np.int32(7), np.float32(1e-3),
                 {"w": np.ones((2, 2), np.float32)})
    ckpt = Checkpointer(os.path.join(outdir, "ckpt"))
    path = ckpt.save(state, wait=True)

    result = {
        "pid": pid,
        "process_count": jax.process_count(),
        "n_local": n_local,
        "n_global": n_global,
        "total": total,
        "indices": indices,
        "ckpt_path": path,
    }
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
