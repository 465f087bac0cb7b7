"""Mel-spectrogram frontend.

Equivalent of the reference ``TacotronSTFT`` (/root/reference/layers.py:42-80):
STFT magnitude -> slaney mel filterbank -> log dynamic-range compression.
Pure jittable function of the waveform; the filterbank and DFT basis are
host-precomputed constants, so the whole pipeline is two MXU matmuls plus
elementwise ops that XLA fuses into one kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.audio import filters
from tacotron2_tpu.audio.stft import STFTConfig, frame_signal
from tacotron2_tpu.config import Tacotron2Config


class MelConfig(NamedTuple):
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 80
    sampling_rate: int = 22050
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0

    @property
    def stft(self) -> STFTConfig:
        return STFTConfig(self.filter_length, self.hop_length, self.win_length)

    @classmethod
    def from_config(cls, config: Tacotron2Config) -> "MelConfig":
        return cls(config.filter_length, config.hop_length, config.win_length,
                   config.n_mel_channels, config.sampling_rate,
                   config.mel_fmin, config.mel_fmax)


def dynamic_range_compression(x: jnp.ndarray, clip_val: float = 1e-5,
                              C: float = 1.0) -> jnp.ndarray:
    """log(clamp(x, 1e-5)) — reference audio_processing.py:78-84."""
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x: jnp.ndarray, C: float = 1.0) -> jnp.ndarray:
    return jnp.exp(x) / C


@functools.partial(jax.jit, static_argnums=(1,))
def mel_spectrogram(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """(B, T) waveform in [-1, 1] -> (B, n_mels, n_frames) log-mel.

    Matches reference TacotronSTFT.mel_spectrogram (layers.py:63-80)
    numerically: reflect-padded windowed DFT magnitudes, slaney-normalized
    mel projection, log-clamp compression.
    """
    frames = frame_signal(y, cfg.stft)  # (B, T_frames, n_fft)
    cos_b, sin_b = filters.dft_basis(cfg.filter_length, cfg.win_length)
    real = frames @ jnp.asarray(cos_b)
    imag = frames @ jnp.asarray(sin_b)
    magnitude = jnp.sqrt(real * real + imag * imag)  # (B, T, n_bins)

    mel_w = jnp.asarray(filters.mel_filterbank(
        cfg.sampling_rate, cfg.filter_length, cfg.n_mel_channels,
        cfg.mel_fmin, cfg.mel_fmax))  # (n_mels, n_bins)
    mel = magnitude @ mel_w.T  # (B, T, n_mels)
    mel = dynamic_range_compression(mel)
    return mel.transpose(0, 2, 1)  # (B, n_mels, T) — reference layout


def mel_frames_for_samples(cfg: MelConfig, num_samples: int) -> int:
    from tacotron2_tpu.audio.stft import n_frames_for_samples
    return n_frames_for_samples(cfg.stft, num_samples)


def mel_spectrogram_backend(y: jnp.ndarray, cfg: MelConfig,
                            backend: str = "xla") -> jnp.ndarray:
    """Select among the interchangeable device implementations:
    'xla' (two fused matmuls) or 'pallas' (single fused kernel)."""
    if backend == "xla":
        return mel_spectrogram(y, cfg)
    if backend == "pallas":
        from tacotron2_tpu.kernels import mel_spectrogram_pallas
        return mel_spectrogram_pallas(y, cfg)
    raise ValueError(f"unknown mel backend {backend!r}")
