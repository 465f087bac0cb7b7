"""Parallelism: device mesh, sharding rules, pjit step builders."""

from tacotron2_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, batch_sharding, create_mesh,
    initialize_distributed, replicated,
)
from tacotron2_tpu.parallel.sharding import (
    shard_tree, tree_pspecs, tree_shardings,
)
from tacotron2_tpu.parallel.step import (
    create_sharded_state, make_eval_step, make_train_step,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "create_mesh", "initialize_distributed",
    "batch_sharding", "replicated", "tree_pspecs", "tree_shardings",
    "shard_tree", "create_sharded_state", "make_train_step", "make_eval_step",
]
