"""STFT analysis/synthesis on TPU.

TPU-native equivalent of the reference's conv-as-DFT STFT
(/root/reference/stft.py:42-141): the framed DFT is expressed as one dense
matmul against a windowed Fourier basis (MXU-friendly; XLA fuses the
magnitude and mel matmuls around it). The inverse transform is a standard
dual-window overlap-add ISTFT with sum-square envelope correction — same
function as the reference's conv_transpose + pinv-basis formulation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.audio import filters


class STFTConfig(NamedTuple):
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024

    @property
    def n_bins(self) -> int:
        return 1 + self.filter_length // 2


def n_frames_for_samples(cfg: STFTConfig, num_samples: int) -> int:
    """Frame count after centered reflect padding (reference stft.py:85-89:
    pad n_fft//2 on both sides, then hop with no extra padding)."""
    padded = num_samples + cfg.filter_length
    return 1 + (padded - cfg.filter_length) // cfg.hop_length


def frame_signal(y: jnp.ndarray, cfg: STFTConfig) -> jnp.ndarray:
    """(B, T) waveform -> (B, n_frames, n_fft) overlapping frames with
    centered reflect padding."""
    pad = cfg.filter_length // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - cfg.filter_length) // cfg.hop_length
    frame_idx = (np.arange(n_frames)[:, None] * cfg.hop_length
                 + np.arange(cfg.filter_length)[None, :])
    return y[:, frame_idx]


@functools.partial(jax.jit, static_argnums=(1,))
def stft(y: jnp.ndarray, cfg: STFTConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward STFT. (B, T) -> magnitude, phase each (B, n_bins, n_frames).

    Numerics match the reference transform (stft.py:77-105): reflect pad,
    periodic-Hann window, real/imag via the windowed DFT basis.
    """
    frames = frame_signal(y, cfg)
    cos_b, sin_b = filters.dft_basis(cfg.filter_length, cfg.win_length)
    real = frames @ jnp.asarray(cos_b)
    imag = frames @ jnp.asarray(sin_b)
    magnitude = jnp.sqrt(real * real + imag * imag)
    phase = jnp.arctan2(imag, real)
    # (B, n_frames, n_bins) -> (B, n_bins, n_frames) to mirror reference layout
    return magnitude.transpose(0, 2, 1), phase.transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnums=(2,))
def istft(magnitude: jnp.ndarray, phase: jnp.ndarray,
          cfg: STFTConfig) -> jnp.ndarray:
    """Inverse STFT. (B, n_bins, T) x2 -> (B, samples).

    Windowed overlap-add with window-sum-square envelope division
    (reference stft.py:107-136 + audio_processing.py:7-56), trimming the
    n_fft//2 centering pad from both ends.
    """
    n_frames = magnitude.shape[-1]
    n_fft, hop = cfg.filter_length, cfg.hop_length

    spec = (magnitude * jnp.exp(1j * phase.astype(jnp.complex64)))
    # (B, n_bins, T) -> (B, T, n_bins) -> time-domain frames (B, T, n_fft)
    frames = jnp.fft.irfft(spec.transpose(0, 2, 1), n=n_fft, axis=-1)
    window = jnp.asarray(filters.padded_window(cfg.win_length, n_fft))
    frames = frames * window[None, None, :]

    total = n_fft + hop * (n_frames - 1)
    frame_idx = (np.arange(n_frames)[:, None] * hop
                 + np.arange(n_fft)[None, :])  # (T, n_fft)
    signal = jnp.zeros((magnitude.shape[0], total), magnitude.dtype)
    signal = signal.at[:, frame_idx].add(frames)

    envelope = filters.window_sumsquare(cfg.win_length, n_fft, hop, n_frames)
    safe = np.where(envelope > np.finfo(np.float32).tiny, envelope, 1.0)
    signal = signal / jnp.asarray(safe)

    pad = n_fft // 2
    return signal[:, pad:total - pad]


def griffin_lim(magnitude: jnp.ndarray, cfg: STFTConfig, n_iters: int = 30,
                key: jax.Array | None = None) -> jnp.ndarray:
    """Griffin-Lim phase recovery (reference audio_processing.py:59-75):
    start from random phase, alternate ISTFT / STFT keeping the target
    magnitude. Dependency-free fallback vocoder."""
    if key is None:
        key = jax.random.PRNGKey(0)
    phase = jax.random.uniform(key, magnitude.shape, magnitude.dtype,
                               -jnp.pi, jnp.pi)

    def body(_, carry):
        signal = istft(magnitude, carry, cfg)
        _, new_phase = stft(signal, cfg)
        # STFT of the trimmed signal can be one frame short; keep length.
        t = min(new_phase.shape[-1], magnitude.shape[-1])
        return carry.at[..., :t].set(new_phase[..., :t])

    phase = jax.lax.fori_loop(0, n_iters, body, phase)
    return istft(magnitude, phase, cfg)
