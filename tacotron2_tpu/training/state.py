"""Train state and step functions.

The reference's training runtime (/root/reference/train.py:149-255): Adam
with L2 weight decay, global-norm gradient clipping at 1.0, constant
(caller-injectable) learning rate. Here the whole update is one jitted pure
function over a ``TrainState`` pytree; under a data-parallel jit sharding,
XLA inserts the gradient psum automatically (replacing the reference's
hand-rolled bucketed allreduce, distributed.py:126-173).

Note on batchnorm: under GSPMD the batch statistics are computed over the
global (logical) batch, i.e. synced across data-parallel shards — unlike
the reference, which keeps per-GPU stats and never syncs them. Synced
stats are the more correct behavior and the difference only affects
running-stat estimates, not gradients.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models import tacotron2 as model
from tacotron2_tpu.training.loss import LossBreakdown, tacotron2_loss


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    params: Any                # model parameters
    stats: Any                 # batchnorm running statistics
    opt_state: Any             # optax state
    learning_rate: jnp.ndarray  # scalar f32, injectable per step


class Batch(NamedTuple):
    """One padded training batch (collate output, data layout §data)."""
    text: jnp.ndarray            # (B, T_in) int32
    text_lengths: jnp.ndarray    # (B,) int32
    mel: jnp.ndarray             # (B, T_out, n_mels) f32
    gate_target: jnp.ndarray     # (B, T_out) f32 — 1.0 from last real frame
    mel_lengths: jnp.ndarray     # (B,) int32


def make_optimizer(cfg: Tacotron2Config) -> optax.GradientTransformation:
    """clip(1.0) -> L2 decay -> Adam, matching torch Adam(weight_decay=...)
    applied after clipping (reference train.py:170,228-236). The learning
    rate is injected at apply time via the state's ``learning_rate``."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_thresh),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-1.0),  # descent; the live learning rate scales updates
    )


def create_train_state(rng: jax.Array, cfg: Tacotron2Config) -> TrainState:
    params, stats = model.init_params(rng, cfg)
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        stats=stats,
        opt_state=tx.init(params),
        learning_rate=jnp.asarray(cfg.learning_rate, jnp.float32),
    )


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    mel_loss: jnp.ndarray
    postnet_loss: jnp.ndarray
    gate_loss: jnp.ndarray
    grad_norm: jnp.ndarray


def _compute_dtype(cfg: Tacotron2Config):
    return {"float32": None, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]


def train_step(state: TrainState, batch: Batch, rng: jax.Array,
               cfg: Tacotron2Config,
               ) -> Tuple[TrainState, StepMetrics, model.ForwardOutput]:
    """One optimization step. Pure; jit/pjit at the call site."""
    step_rng = jax.random.fold_in(rng, state.step)
    compute_dtype = _compute_dtype(cfg)

    def loss_fn(params):
        output, new_stats = model.forward(
            params, state.stats, batch.text, batch.text_lengths, batch.mel,
            batch.mel_lengths, cfg, training=True, rng=step_rng,
            compute_dtype=compute_dtype)
        breakdown = tacotron2_loss(output, batch.mel, batch.gate_target)
        return breakdown.total, (breakdown, new_stats, output)

    grads, (breakdown, new_stats, output) = jax.grad(
        loss_fn, has_aux=True)(state.params)

    grad_norm = optax.global_norm(grads)
    tx = make_optimizer(cfg)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree.map(lambda u: u * state.learning_rate, updates)
    new_params = optax.apply_updates(state.params, updates)

    new_state = TrainState(state.step + 1, new_params, new_stats,
                           new_opt_state, state.learning_rate)
    metrics = StepMetrics(breakdown.total, breakdown.mel,
                          breakdown.mel_postnet, breakdown.gate, grad_norm)
    return new_state, metrics, output


def eval_step(state: TrainState, batch: Batch, cfg: Tacotron2Config,
              ) -> Tuple[LossBreakdown, model.ForwardOutput]:
    """Validation loss on one batch (reference validate, train.py:121-146):
    eval-mode batchnorm, no dropout — except the prenet, whose dropout is
    always active; for a deterministic eval signal we run it deterministically
    here (rng=None)."""
    output, _ = model.forward(
        state.params, state.stats, batch.text, batch.text_lengths, batch.mel,
        batch.mel_lengths, cfg, training=False, rng=None,
        compute_dtype=_compute_dtype(cfg))
    return tacotron2_loss(output, batch.mel, batch.gate_target), output
