"""Pallas TPU kernel: fused mel-spectrogram extraction.

Fuses the whole framed-DFT -> magnitude -> mel-projection -> log-clamp
chain (audio/mel.py) into a single kernel: the (frames x n_bins)
magnitude intermediate lives only in VMEM, never round-tripping to HBM
between the two matmuls (XLA compiles them as separate fusions). Both
matmuls run on the MXU with fp32 accumulation.

Layout per program (grid = (B, T_frames / BLOCK_T)):
  frames block (BLOCK_T, n_fft)  @  cos/sin basis (n_fft, n_bins)  -> MXU
  magnitude (BLOCK_T, n_bins)    @  mel^T (n_bins, n_mels)         -> MXU
  log(clamp(.)) -> out block (BLOCK_T, n_mels)

VMEM budget at n_fft=1024: bases 2 x 2.1 MB + mel 0.16 MB + frames
(128, 1024) 0.5 MB + scratch << 16 MB.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tacotron2_tpu.audio import filters
from tacotron2_tpu.audio.mel import MelConfig
from tacotron2_tpu.audio.stft import frame_signal

BLOCK_T = 128


def _mel_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref):
    frames = frames_ref[0]  # (BLOCK_T, n_fft)
    real = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    imag = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    magnitude = jnp.sqrt(real * real + imag * imag)
    mel = jnp.dot(magnitude, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.clip(mel, 1e-5, None))


@functools.partial(jax.jit, static_argnums=(1, 2))
def mel_spectrogram_pallas(y: jnp.ndarray, cfg: MelConfig,
                           interpret: bool = False) -> jnp.ndarray:
    """(B, T_samples) -> (B, n_mels, n_frames); numerics match
    audio/mel.py:mel_spectrogram (tested in tests/test_kernels.py)."""
    frames = frame_signal(y, cfg.stft)  # (B, T, n_fft)
    B, T, n_fft = frames.shape
    # pad frame count to the block size; padded frames produce log(1e-5)
    # rows that we slice off at the end
    T_pad = -(-T // BLOCK_T) * BLOCK_T
    if T_pad != T:
        frames = jnp.pad(frames, ((0, 0), (0, T_pad - T), (0, 0)))

    cos_b, sin_b = filters.dft_basis(cfg.filter_length, cfg.win_length)
    mel_w = filters.mel_filterbank(cfg.sampling_rate, cfg.filter_length,
                                   cfg.n_mel_channels, cfg.mel_fmin,
                                   cfg.mel_fmax)
    n_bins = cos_b.shape[1]
    n_mels = mel_w.shape[0]

    out = pl.pallas_call(
        _mel_kernel,
        grid=(B, T_pad // BLOCK_T),
        in_specs=[
            pl.BlockSpec((1, BLOCK_T, n_fft), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, n_mels), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_T, n_mels), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T_pad * n_fft * 2 * n_bins
            + 2 * B * T_pad * n_bins * n_mels,
            bytes_accessed=4 * (B * T_pad * (n_fft + n_mels)
                                + 2 * n_fft * n_bins + n_bins * n_mels),
            transcendentals=B * T_pad * (n_bins + n_mels)),
        interpret=interpret,
    )(frames, jnp.asarray(cos_b), jnp.asarray(sin_b),
      jnp.asarray(mel_w.T.copy()))

    return out[:, :T].transpose(0, 2, 1)  # (B, n_mels, T) reference layout
