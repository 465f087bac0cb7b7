"""Tacotron 2 training loss.

Reference semantics (/root/reference/loss_function.py:8-19) reproduced
exactly: MSE(mel, target) + MSE(mel_postnet, target) + BCE-with-logits(gate,
gate_target), each a mean over the FULL padded tensor. Padded positions
contribute zero numerator (outputs are force-masked: mel->0 where targets
are 0-padded; gate->1e3 where target is 1) but still count in the
denominator — that's the reference's normalization and we keep it for
parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.models.tacotron2 import ForwardOutput


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    mel: jnp.ndarray
    mel_postnet: jnp.ndarray
    gate: jnp.ndarray


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross-entropy on energies
    (torch BCEWithLogitsLoss): max(x,0) - x*y + log(1 + exp(-|x|))."""
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def tacotron2_loss(output: ForwardOutput, mel_target: jnp.ndarray,
                   gate_target: jnp.ndarray,
                   row_weights: jnp.ndarray | None = None) -> LossBreakdown:
    """output: model ForwardOutput; mel_target: (B, T, n_mels);
    gate_target: (B, T) with 1.0 from each row's last real frame on
    (reference data_utils.py:107).

    row_weights: optional (B,) per-row weights. Static-shape batches pad
    partial (validation) batches by cycling rows (data/pipeline.py); with
    row_weights = the validity mask, duplicated rows drop out of the mean
    and the result equals the reference's exact mean over real rows
    (train.py:121-146). None = plain full-tensor mean (identical when all
    rows are real, since every row has the same padded element count).
    """
    mel_target = jax.lax.stop_gradient(mel_target)
    gate_target = jax.lax.stop_gradient(gate_target)

    mel_sq = jnp.square(output.mel - mel_target)
    postnet_sq = jnp.square(output.mel_postnet - mel_target)
    gate_bce = bce_with_logits(output.gate_energies, gate_target)

    if row_weights is None:
        mel_loss = jnp.mean(mel_sq)
        postnet_loss = jnp.mean(postnet_sq)
        gate_loss = jnp.mean(gate_bce)
    else:
        w = row_weights / jnp.maximum(jnp.sum(row_weights), 1.0)  # (B,)
        mel_loss = jnp.sum(w * jnp.mean(mel_sq, axis=(1, 2)))
        postnet_loss = jnp.sum(w * jnp.mean(postnet_sq, axis=(1, 2)))
        gate_loss = jnp.sum(w * jnp.mean(gate_bce, axis=1))

    return LossBreakdown(mel_loss + postnet_loss + gate_loss,
                         mel_loss, postnet_loss, gate_loss)
