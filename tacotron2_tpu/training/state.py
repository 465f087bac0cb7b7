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

from typing import Any, NamedTuple, Optional, Tuple

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
    # (B,) f32 validity mask: 0.0 marks rows that are cycled duplicates
    # padding a partial batch to the static shape (data/pipeline.py). The
    # validation loss weights rows by it; None (the default, and the train
    # path with drop_last) means all rows are real.
    row_valid: Optional[jnp.ndarray] = None


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
    # 1.0 when the update was applied, 0.0 when a non-finite loss/grad
    # caused the step to be skipped on-device (see _guarded_update).
    applied: jnp.ndarray


def _compute_dtype(cfg: Tacotron2Config):
    return {"float32": None, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]


def guarded_update(state: TrainState, grads, new_stats, loss: jnp.ndarray,
                   cfg: Tacotron2Config,
                   ) -> Tuple[TrainState, jnp.ndarray, jnp.ndarray]:
    """Apply the optimizer update, skipping it ON-DEVICE when the loss or
    gradient is non-finite — params, optimizer state and batchnorm stats
    keep their previous values and only ``step`` advances. This is the
    bf16-world analog of the reference's fp16 overflow skip
    (train.py:228-249, Apex AMP), done without a host sync: the trainer
    never has to pull the loss to decide, so it can log at a cadence while
    the device runs ahead. Returns (new_state, grad_norm, applied)."""
    grad_norm = optax.global_norm(grads)
    finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
    tx = make_optimizer(cfg)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree.map(lambda u: u * state.learning_rate, updates)
    new_params = optax.apply_updates(state.params, updates)

    keep = lambda new, old: jax.tree.map(
        lambda n, o: jnp.where(finite, n, o), new, old)
    new_state = TrainState(state.step + 1,
                           keep(new_params, state.params),
                           keep(new_stats, state.stats),
                           keep(new_opt_state, state.opt_state),
                           state.learning_rate)
    return new_state, grad_norm, finite.astype(jnp.float32)


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

    new_state, grad_norm, applied = guarded_update(
        state, grads, new_stats, breakdown.total, cfg)
    metrics = StepMetrics(breakdown.total, breakdown.mel,
                          breakdown.mel_postnet, breakdown.gate, grad_norm,
                          applied)
    return new_state, metrics, output


def eval_step(state: TrainState, batch: Batch, cfg: Tacotron2Config,
              rng: Optional[jax.Array] = None,
              ) -> Tuple[LossBreakdown, model.ForwardOutput]:
    """Validation loss on one batch (reference validate, train.py:121-146):
    eval-mode batchnorm, no dropout — except the prenet, whose dropout the
    reference keeps active even at validation (model.py:99 + train.py:121).
    Pass an rng for those reference semantics (the Trainer does when
    ``cfg.eval_prenet_dropout``, the default — needed for val-loss parity
    against a reference run); rng=None runs the prenet deterministically.

    Rows cycled to pad a partial batch (``batch.row_valid`` == 0) are
    weighted out of the loss, so the result matches the reference's exact
    mean over real rows regardless of batch partitioning."""
    output, _ = model.forward(
        state.params, state.stats, batch.text, batch.text_lengths, batch.mel,
        batch.mel_lengths, cfg, training=False, rng=rng,
        compute_dtype=_compute_dtype(cfg))
    return tacotron2_loss(output, batch.mel, batch.gate_target,
                          row_weights=batch.row_valid), output
