"""Flow-vocoder training.

The reference consumes a pre-trained WaveGlow; training lives in NVIDIA's
separate waveglow repo. Here the vocoder is trainable in-framework: random
audio crops + aligned mels -> maximum-likelihood flow objective
(models/waveglow.py:loss), Adam, the same checkpoint/logging machinery as
the acoustic model.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tacotron2_tpu.audio.mel import MelConfig
from tacotron2_tpu.models import waveglow
from tacotron2_tpu.training.checkpoint import Checkpointer


class VocoderBatch(NamedTuple):
    audio: jnp.ndarray  # (B, segment_samples) in [-1, 1]
    mel: jnp.ndarray    # (B, T_mel, n_mels) aligned


class VocoderTrainState(NamedTuple):
    step: jnp.ndarray
    params: dict
    opt_state: tuple


def create_vocoder_state(rng: jax.Array, cfg: waveglow.WaveGlowConfig,
                         learning_rate: float = 1e-4) -> VocoderTrainState:
    params = waveglow.init_params(rng, cfg)
    tx = optax.adam(learning_rate)
    return VocoderTrainState(jnp.zeros((), jnp.int32), params,
                             tx.init(params))


def vocoder_train_step(state: VocoderTrainState, batch: VocoderBatch,
                       cfg: waveglow.WaveGlowConfig,
                       learning_rate: float = 1e-4, sigma: float = 1.0,
                       ) -> Tuple[VocoderTrainState, jnp.ndarray]:
    """One NLL step. Pure; jit at the call site."""
    def loss_fn(params):
        out = waveglow.forward(params, batch.audio, batch.mel, cfg)
        return waveglow.loss(out, sigma=sigma)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    tx = optax.adam(learning_rate)
    updates, opt_state = tx.update(grads, state.opt_state)
    params = optax.apply_updates(state.params, updates)
    return VocoderTrainState(state.step + 1, params, opt_state), loss


def segment_sampler(dataset, mel_cfg: MelConfig, segment_mels: int,
                    batch_size: int, seed: int = 0,
                    ) -> Iterator[VocoderBatch]:
    """Random fixed-length (audio, mel) crops from a TextMelDataset-style
    dataset (the standard WaveGlow training regime: short random segments).
    Audio segment length = segment_mels * hop."""
    from tacotron2_tpu.data.dataset import load_wav
    rng = np.random.RandomState(seed)
    hop = mel_cfg.hop_length
    seg_samples = segment_mels * hop
    n = len(dataset)
    while True:
        audio_rows, mel_rows = [], []
        while len(audio_rows) < batch_size:
            idx = rng.randint(n)
            path = dataset.entries[idx][0]
            wav, sr = load_wav(path)
            wav = wav / 32768.0
            if len(wav) < seg_samples + hop:
                continue
            start = rng.randint(len(wav) - seg_samples)
            seg = wav[start:start + seg_samples]
            _, full_mel = dataset[idx]  # (n_mels, T)
            m0 = start // hop
            mel = full_mel[:, m0:m0 + segment_mels]
            if mel.shape[1] < segment_mels:
                continue
            audio_rows.append(seg.astype(np.float32))
            mel_rows.append(mel.T.astype(np.float32))
        yield VocoderBatch(jnp.asarray(np.stack(audio_rows)),
                           jnp.asarray(np.stack(mel_rows)))


def train_vocoder(dataset, out_dir: str,
                  cfg: waveglow.WaveGlowConfig = waveglow.WaveGlowConfig(),
                  mel_cfg: MelConfig = MelConfig(),
                  steps: int = 100000, batch_size: int = 8,
                  segment_mels: int = 64, learning_rate: float = 1e-4,
                  log_every: int = 100, checkpoint_every: int = 5000,
                  seed: int = 1234) -> VocoderTrainState:
    """Minimal vocoder training loop (tools/train_vocoder.py wraps this)."""
    import functools
    state = create_vocoder_state(jax.random.PRNGKey(seed), cfg, learning_rate)
    ckpt = Checkpointer(out_dir)
    step_fn = jax.jit(functools.partial(vocoder_train_step, cfg=cfg,
                                        learning_rate=learning_rate))
    batches = segment_sampler(dataset, mel_cfg, segment_mels, batch_size,
                              seed)
    for i, batch in enumerate(batches):
        if i >= steps:
            break
        state, loss = step_fn(state, batch)
        if i % log_every == 0:
            print(f"vocoder step {int(state.step)}: nll {float(loss):.4f}",
                  flush=True)
        if int(state.step) % checkpoint_every == 0:
            ckpt.save(state)
    ckpt.save(state, wait=True)
    return state
