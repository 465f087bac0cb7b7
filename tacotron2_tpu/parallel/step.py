"""Sharded train/eval step builders.

One ``jax.jit`` with explicit in/out shardings over the mesh: batch leaves
sharded on ``dp``, state sharded per the shape rules (replicated at mp=1).
The gradient all-reduce the reference implements by hand
(/root/reference/distributed.py:126-173) falls out of GSPMD here.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.parallel.mesh import DATA_AXIS
from tacotron2_tpu.parallel.sharding import tree_shardings
from tacotron2_tpu.training.state import (
    TrainState, create_train_state, eval_step, train_step,
)


def create_sharded_state(rng: jax.Array, cfg: Tacotron2Config,
                         mesh: Mesh) -> TrainState:
    """Initialize the TrainState directly in its sharded layout (the
    equivalent of the reference's rank-0 param broadcast at init,
    distributed.py:132-135, done by construction)."""
    abstract = jax.eval_shape(lambda k: create_train_state(k, cfg), rng)
    shardings = tree_shardings(abstract, mesh)
    init_fn = jax.jit(functools.partial(create_train_state, cfg=cfg),
                      out_shardings=shardings)
    return init_fn(rng)


def make_train_step(cfg: Tacotron2Config, mesh: Mesh,
                    state_like: TrainState) -> Callable:
    """Jitted sharded train step: (state, batch, rng) -> (state, metrics)."""
    state_shardings = tree_shardings(state_like, mesh)
    batch_shardings = NamedSharding(mesh, P(DATA_AXIS))  # broadcast to leaves
    replicated = NamedSharding(mesh, P())

    if cfg.grad_accum_steps > 1:
        from tacotron2_tpu.training.accumulate import accum_train_step

        def step(state, batch, rng):
            return accum_train_step(state, batch, rng, cfg,
                                    cfg.grad_accum_steps)
    else:
        def step(state, batch, rng):
            new_state, metrics, _ = train_step(state, batch, rng, cfg)
            return new_state, metrics

    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_shardings, replicated),
        out_shardings=(state_shardings, replicated),
        donate_argnums=(0,),
    )


def make_eval_step(cfg: Tacotron2Config, mesh: Mesh,
                   state_like: TrainState) -> Callable:
    state_shardings = tree_shardings(state_like, mesh)
    batch_shardings = NamedSharding(mesh, P(DATA_AXIS))
    replicated = NamedSharding(mesh, P())

    def step(state, batch, rng):
        breakdown, output = eval_step(state, batch, cfg, rng)
        return breakdown, output

    jitted = jax.jit(
        step,
        in_shardings=(state_shardings, batch_shardings, replicated),
        out_shardings=(replicated, batch_shardings),
    )

    def call(state, batch, rng=None):
        return jitted(state, batch, rng)

    return call
