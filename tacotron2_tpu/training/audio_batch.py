"""Mel-on-device training: raw-audio batches, mel extracted in the step.

The reference computes mels on the host inside DataLoader workers
(/root/reference/data_utils.py:37-47) — a throughput ceiling (SURVEY §3.5).
Here the train step can take raw waveforms and run mel extraction on the
TPU itself (the fused Pallas kernel, 2.1× the XLA path — PERFORMANCE.md),
removing host DSP from the loop entirely. Targets (mel, gate) are derived
on device with the exact collate semantics: mel zero-padded past each
row's frame count, gate = 1 from the last real frame.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models import tacotron2 as model
from tacotron2_tpu.ops.layers import length_mask
from tacotron2_tpu.training.state import (
    Batch, StepMetrics, TrainState, train_step,
)


class AudioBatch(NamedTuple):
    """Padded raw-audio batch. T_samples must be hop * (T_mel_bucket - 1)
    so the mel frame count lands exactly on the bucket."""
    text: jnp.ndarray           # (B, T_in) int32
    text_lengths: jnp.ndarray   # (B,) int32
    audio: jnp.ndarray          # (B, T_samples) f32 in [-1, 1], zero-padded
    audio_lengths: jnp.ndarray  # (B,) int32 valid samples per row


def mel_targets_from_audio(batch: AudioBatch, cfg: Tacotron2Config,
                           backend: str = "pallas") -> Batch:
    """Device-side target construction: audio -> (mel, gate, lengths).

    Matches the host pipeline numerically (same DFT/mel math) and
    semantically (reference TextMelCollate, data_utils.py:93-108): mel rows
    zeroed past each row's frame count, gate 1 from the last real frame.
    """
    from tacotron2_tpu.audio.mel import MelConfig, mel_spectrogram
    mel_cfg = MelConfig.from_config(cfg)

    if backend == "pallas":
        from tacotron2_tpu.kernels import mel_spectrogram_pallas
        mel = mel_spectrogram_pallas(batch.audio, mel_cfg)  # (B, n_mels, T)
    else:
        mel = mel_spectrogram(batch.audio, mel_cfg)
    mel = mel.transpose(0, 2, 1)  # (B, T_mel, n_mels)

    T_mel = mel.shape[1]
    r = cfg.n_frames_per_step
    if T_mel % r:
        pad = r - T_mel % r
        mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
        T_mel += pad

    # frames per row: 1 + valid_samples // hop (centered STFT), capped and
    # rounded like the host collate
    mel_lengths = jnp.minimum(1 + batch.audio_lengths // cfg.hop_length,
                              T_mel).astype(jnp.int32)

    valid = length_mask(mel_lengths, T_mel)
    mel = jnp.where(valid[:, :, None], mel, 0.0)
    # gate: 1.0 from the LAST REAL frame on (data_utils.py:107)
    t = jnp.arange(T_mel)[None, :]
    gate = (t >= (mel_lengths - 1)[:, None]).astype(jnp.float32)

    return Batch(batch.text, batch.text_lengths, mel, gate, mel_lengths)


def train_step_from_audio(state: TrainState, batch: AudioBatch,
                          rng: jax.Array, cfg: Tacotron2Config,
                          mel_backend: str = "pallas",
                          ) -> Tuple[TrainState, StepMetrics,
                                     model.ForwardOutput]:
    """train_step with on-device mel extraction fused into the same jit."""
    mel_batch = mel_targets_from_audio(batch, cfg, mel_backend)
    return train_step(state, mel_batch, rng, cfg)


def pad_audio_batch(items, t_text: int, t_mel: int, hop_length: int):
    """Host-side assembly of an AudioBatch from (text_ids, waveform) pairs.
    Audio padded to hop * (t_mel - 1) samples so frames == t_mel."""
    import numpy as np
    B = len(items)
    t_samples = hop_length * (t_mel - 1)
    text = np.zeros((B, t_text), np.int32)
    text_lengths = np.zeros((B,), np.int32)
    audio = np.zeros((B, t_samples), np.float32)
    audio_lengths = np.zeros((B,), np.int32)
    for i, (ids, wav) in enumerate(items):
        L_t = min(len(ids), t_text)
        text[i, :L_t] = ids[:L_t]
        text_lengths[i] = L_t
        L_a = min(len(wav), t_samples)
        audio[i, :L_a] = wav[:L_a]
        audio_lengths[i] = L_a
    return AudioBatch(jnp.asarray(text), jnp.asarray(text_lengths),
                      jnp.asarray(audio), jnp.asarray(audio_lengths))
