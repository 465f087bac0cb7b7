"""Text-to-speech inference pipeline (the reference notebook's flow as a
library + CLI).

Covers /root/reference/inference.ipynb end to end: load checkpoint ->
text_to_sequence -> Tacotron2 inference -> vocoder (WaveGlow-style flow at
sigma=0.666 with optional Denoiser at strength 0.01, or dependency-free
Griffin-Lim) -> waveform. Batched: synthesize() takes a list of texts and
per-row gate stopping trims each result independently (the reference
notebook is B=1 only).
"""

from __future__ import annotations

import argparse
from typing import List, NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_tpu.audio import STFTConfig, griffin_lim
from tacotron2_tpu.audio.stft import istft as istft_fn, stft as stft_fn
from tacotron2_tpu.audio.mel import dynamic_range_decompression
from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models import tacotron2, waveglow
from tacotron2_tpu.text import text_to_sequence


class SynthesisResult(NamedTuple):
    mel: np.ndarray          # (T, n_mels) per item, trimmed
    audio: Optional[np.ndarray]  # (samples,) per item, or None (mel-only)
    alignment: np.ndarray    # (T, T_in)
    gate: np.ndarray         # (T,)


def encode_texts(texts: Sequence[str], cfg: Tacotron2Config):
    """Texts -> padded (ids, lengths) arrays."""
    seqs = [text_to_sequence(t, cfg.text_cleaners) for t in texts]
    max_len = max(len(s) for s in seqs)
    ids = np.zeros((len(seqs), max_len), np.int32)
    lengths = np.zeros((len(seqs),), np.int32)
    for i, s in enumerate(seqs):
        ids[i, :len(s)] = s
        lengths[i] = len(s)
    return jnp.asarray(ids), jnp.asarray(lengths)


class Denoiser:
    """WaveGlow bias removal (inference.ipynb cell 17, strength 0.01):
    estimate the vocoder's zero-mel bias spectrum once, then subtract a
    scaled copy from synthesized audio in the magnitude domain."""

    def __init__(self, vocoder_params, vocoder_cfg: waveglow.WaveGlowConfig,
                 stft_cfg: STFTConfig = STFTConfig(filter_length=1024,
                                                  hop_length=256,
                                                  win_length=1024),
                 n_mel_frames: int = 88, mode: str = "zeros"):
        self.stft_cfg = stft_cfg
        fill = {"zeros": 0.0, "normal": None}[mode]
        key = jax.random.PRNGKey(0)
        if fill is None:
            mel = jax.random.normal(
                key, (1, n_mel_frames, vocoder_cfg.n_mel_channels))
        else:
            mel = jnp.full((1, n_mel_frames, vocoder_cfg.n_mel_channels),
                           fill, jnp.float32)
        bias_audio = waveglow.infer(vocoder_params, mel, vocoder_cfg,
                                    sigma=0.0, key=key)
        bias_mag, _ = stft_fn(bias_audio, stft_cfg)
        self.bias_mag = bias_mag[0]  # (n_bins, T)

    def __call__(self, audio: jnp.ndarray,
                 strength: float = 0.01) -> jnp.ndarray:
        mag, phase = stft_fn(audio, self.stft_cfg)
        bias = self.bias_mag.mean(axis=1, keepdims=True)[None]
        mag = jnp.clip(mag - strength * bias, 0.0, None)
        return istft_fn(mag, phase, self.stft_cfg)


def synthesize(params, stats, texts: Sequence[str], cfg: Tacotron2Config, *,
               vocoder: str = "griffin_lim",
               vocoder_params=None,
               vocoder_cfg: Optional[waveglow.WaveGlowConfig] = None,
               denoiser: Optional[Denoiser] = None,
               denoiser_strength: float = 0.01,
               sigma: float = 0.666,
               rng: Optional[jax.Array] = None,
               max_steps: Optional[int] = None,
               griffin_lim_iters: int = 30,
               fused: bool = False) -> List[SynthesisResult]:
    """Batched text -> (mel, audio). vocoder: 'none' | 'griffin_lim' |
    'waveglow' | 'hifigan'. ``fused=True`` decodes through the fused
    Pallas decoder kernel (B=1, deterministic prenet only — ~4.5x)."""
    text_ids, text_lengths = encode_texts(texts, cfg)
    if fused:
        if len(texts) != 1 or rng is not None:
            raise ValueError("fused decode is the B=1 deterministic path")
        result = tacotron2.infer_fused(params, stats, text_ids,
                                       text_lengths, cfg,
                                       max_steps=max_steps,
                                       compute_dtype=cfg.jax_compute_dtype)
    else:
        result = tacotron2.infer(params, stats, text_ids, text_lengths, cfg,
                                 rng=rng, max_steps=max_steps,
                                 compute_dtype=cfg.jax_compute_dtype)
    mel = result.mel_postnet  # (B, T_max, n_mels)

    audio_batch = None
    if vocoder == "waveglow":
        audio_batch = waveglow.infer(vocoder_params, mel, vocoder_cfg,
                                     sigma=sigma, key=rng)
        if denoiser is not None:
            audio_batch = denoiser(audio_batch, denoiser_strength)
    elif vocoder == "hifigan":
        from tacotron2_tpu.models import hifigan
        hg_cfg = vocoder_cfg if vocoder_cfg is not None else \
            hifigan.HiFiGANConfig(n_mel_channels=cfg.n_mel_channels)
        audio_batch = hifigan.generator(vocoder_params, mel, hg_cfg)
    elif vocoder == "griffin_lim":
        # invert mel -> linear magnitude via the filterbank pseudo-inverse
        from tacotron2_tpu.audio import filters
        mel_w = filters.mel_filterbank(cfg.sampling_rate, cfg.filter_length,
                                       cfg.n_mel_channels, cfg.mel_fmin,
                                       cfg.mel_fmax)
        inv = np.linalg.pinv(mel_w)  # (n_bins, n_mels)
        linear = jnp.clip(
            jnp.einsum("btm,mf->bft",
                       dynamic_range_decompression(mel), jnp.asarray(inv.T)),
            0.0, None)
        audio_batch = griffin_lim(
            linear, STFTConfig(cfg.filter_length, cfg.hop_length,
                               cfg.win_length), n_iters=griffin_lim_iters,
            key=rng if rng is not None else jax.random.PRNGKey(0))
    elif vocoder != "none":
        raise ValueError(f"unknown vocoder {vocoder!r}")

    out = []
    hop = cfg.hop_length
    for b in range(len(texts)):
        T = int(result.mel_lengths[b])
        audio = None
        if audio_batch is not None:
            audio = np.asarray(audio_batch[b][:T * hop])
        out.append(SynthesisResult(
            mel=np.asarray(mel[b, :T]),
            audio=audio,
            alignment=np.asarray(result.alignments[b, :T]),
            gate=np.asarray(result.gate_energies[b, :T])))
    return out


def load_vocoder(kind: str, path: str, cfg: Tacotron2Config, *,
                 torch_format: bool = False):
    """Load vocoder weights: 'waveglow' (framework .npz checkpoint or a
    torch WaveGlow .pt) or 'hifigan' (framework .npz). Returns
    (params, vocoder_cfg)."""
    if kind == "waveglow":
        vocoder_cfg = waveglow.WaveGlowConfig(
            n_mel_channels=cfg.n_mel_channels,
            upsample_stride=cfg.hop_length)
        if torch_format:
            from tacotron2_tpu.convert_waveglow import (
                load_waveglow_checkpoint)
            return load_waveglow_checkpoint(path, vocoder_cfg)
        from tacotron2_tpu.training.checkpoint import Checkpointer
        from tacotron2_tpu.training.vocoder_trainer import (
            create_vocoder_state)
        import os
        state_like = create_vocoder_state(jax.random.PRNGKey(0), vocoder_cfg)
        ckpt = Checkpointer(os.path.dirname(path) or ".")
        return ckpt.restore(state_like, path).params, vocoder_cfg
    if kind == "hifigan":
        from tacotron2_tpu.models import hifigan
        from tacotron2_tpu.training.checkpoint import Checkpointer
        from tacotron2_tpu.training.hifigan_trainer import (
            create_hifigan_state)
        import os
        vocoder_cfg = hifigan.HiFiGANConfig(
            n_mel_channels=cfg.n_mel_channels)
        state_like = create_hifigan_state(jax.random.PRNGKey(0), vocoder_cfg)
        ckpt = Checkpointer(os.path.dirname(path) or ".")
        return ckpt.restore(state_like, path).gen_params, vocoder_cfg
    raise ValueError(f"unknown vocoder {kind!r}")


def main() -> None:
    from tacotron2_tpu.config import create_config
    from tacotron2_tpu.training.checkpoint import Checkpointer
    from tacotron2_tpu.training.state import create_train_state

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("-t", "--text", action="append", required=True,
                        help="text to synthesize (repeatable)")
    parser.add_argument("-o", "--output_prefix", default="synth")
    parser.add_argument("--vocoder", default="griffin_lim",
                        choices=["none", "griffin_lim", "waveglow",
                                 "hifigan"])
    parser.add_argument("--vocoder_checkpoint", default=None,
                        help="vocoder weights: framework .npz, or a torch "
                             "WaveGlow .pt with --torch_vocoder")
    parser.add_argument("--torch_vocoder", action="store_true",
                        help="vocoder checkpoint is a torch WaveGlow .pt")
    parser.add_argument("--torch_checkpoint", action="store_true",
                        help="checkpoint is a reference .pt state dict")
    parser.add_argument("--int8", action="store_true",
                        help="int8 weight-only decoder LSTMs (~2x faster "
                             "B=1 decode; Pallas kernel)")
    parser.add_argument("--fused", action="store_true",
                        help="fused Pallas decoder kernel (~4.5x faster "
                             "B=1 decode; one text only, deterministic "
                             "prenet)")
    parser.add_argument("--hparams", type=str, default=None)
    args = parser.parse_args()

    cfg = create_config(args.hparams)
    if args.torch_checkpoint:
        from tacotron2_tpu.convert import load_torch_checkpoint
        params, stats = load_torch_checkpoint(args.checkpoint, cfg)
    else:
        import os
        ckpt = Checkpointer(os.path.dirname(args.checkpoint) or ".")
        state = ckpt.restore(
            create_train_state(jax.random.PRNGKey(0), cfg), args.checkpoint)
        params, stats = state.params, state.stats

    if args.int8:
        from tacotron2_tpu.models.tacotron2 import quantize_for_serving
        params = quantize_for_serving(params)

    vocoder_params, vocoder_cfg = None, None
    if args.vocoder in ("waveglow", "hifigan"):
        if args.vocoder_checkpoint is None:
            parser.error(f"--vocoder {args.vocoder} needs "
                         "--vocoder_checkpoint")
        vocoder_params, vocoder_cfg = load_vocoder(
            args.vocoder, args.vocoder_checkpoint, cfg,
            torch_format=args.torch_vocoder)

    if args.fused and (args.int8 or len(args.text) != 1):
        parser.error("--fused needs exactly one -t text and no --int8")
    results = synthesize(params, stats, args.text, cfg,
                         vocoder=args.vocoder,
                         vocoder_params=vocoder_params,
                         vocoder_cfg=vocoder_cfg,
                         fused=args.fused)
    import scipy.io.wavfile
    for i, r in enumerate(results):
        np.save(f"{args.output_prefix}_{i}_mel.npy", r.mel.T)  # ref layout
        if r.audio is not None:
            wav = np.clip(r.audio, -1, 1)
            scipy.io.wavfile.write(
                f"{args.output_prefix}_{i}.wav", cfg.sampling_rate,
                (wav * 32767).astype(np.int16))
        print(f"[{i}] {r.mel.shape[0]} frames "
              f"({r.mel.shape[0] * cfg.hop_length / cfg.sampling_rate:.2f}s)")


if __name__ == "__main__":
    main()
