"""Gradient accumulation: large effective batches on small-memory chips.

No reference equivalent (it trains whatever fits). Splits a batch into
micro-batches along the batch axis inside one jitted step: a ``lax.scan``
accumulates gradients, then a single optimizer update applies their mean —
the effective batch is the full batch while peak activation memory is that
of one micro-batch.

Caveat: batchnorm uses per-micro-batch statistics during the forward (the
same behavior as running the micro-batches as separate steps); the
returned running stats are the micro-batch average.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models import tacotron2 as model
from tacotron2_tpu.training.loss import tacotron2_loss
from tacotron2_tpu.training.state import (
    Batch, StepMetrics, TrainState, _compute_dtype, guarded_update,
)


def accum_train_step(state: TrainState, batch: Batch, rng: jax.Array,
                     cfg: Tacotron2Config, n_micro: int,
                     ) -> Tuple[TrainState, StepMetrics]:
    """One optimization step over ``n_micro`` micro-batches.

    batch: leaves with leading dim B where B % n_micro == 0. Pure;
    jit/pjit at the call site.
    """
    B = batch.text.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible into {n_micro} micro")
    micro = jax.tree.map(
        lambda x: x.reshape(n_micro, B // n_micro, *x.shape[1:]), batch)
    step_rng = jax.random.fold_in(rng, state.step)
    compute_dtype = _compute_dtype(cfg)

    def loss_fn(params, mb, mb_rng):
        output, new_stats = model.forward(
            params, state.stats, mb.text, mb.text_lengths, mb.mel,
            mb.mel_lengths, cfg, training=True, rng=mb_rng,
            compute_dtype=compute_dtype)
        breakdown = tacotron2_loss(output, mb.mel, mb.gate_target)
        return breakdown.total, (breakdown, new_stats)

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def micro_step(carry, xs):
        grad_sum, stats_sum, loss_sum = carry
        index, mb = xs
        grads, (breakdown, new_stats) = grad_fn(
            state.params, mb, jax.random.fold_in(step_rng, index))
        return (jax.tree.map(jnp.add, grad_sum, grads),
                jax.tree.map(jnp.add, stats_sum, new_stats),
                loss_sum + breakdown.total), breakdown

    zero_grads = jax.tree.map(jnp.zeros_like, state.params)
    zero_stats = jax.tree.map(jnp.zeros_like, state.stats)
    (grad_sum, stats_sum, loss_sum), breakdowns = jax.lax.scan(
        micro_step, (zero_grads, zero_stats, jnp.zeros(())),
        (jnp.arange(n_micro), micro))

    grads = jax.tree.map(lambda g: g / n_micro, grad_sum)
    new_stats = jax.tree.map(lambda s: s / n_micro, stats_sum)

    loss = loss_sum / n_micro
    new_state, grad_norm, applied = guarded_update(
        state, grads, new_stats, loss, cfg)
    mean = lambda x: jnp.mean(x)
    metrics = StepMetrics(loss, mean(breakdowns.mel),
                          mean(breakdowns.mel_postnet),
                          mean(breakdowns.gate), grad_norm, applied)
    return new_state, metrics
