"""Vocoder training loop tests (tiny config, CPU)."""

import numpy as np
import pytest
import scipy.io.wavfile

import jax

from tacotron2_tpu.audio.mel import MelConfig
from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data import TextMelDataset
from tacotron2_tpu.models import waveglow as wg
from tacotron2_tpu.training.vocoder_trainer import (
    VocoderBatch, create_vocoder_state, segment_sampler, train_vocoder,
    vocoder_train_step,
)

WG_CFG = wg.WaveGlowConfig(
    n_mel_channels=8, n_flows=4, n_group=8, n_early_every=2, n_early_size=2,
    wn_layers=2, wn_channels=8, upsample_kernel=32, upsample_stride=16)
MEL_CFG = MelConfig(filter_length=64, hop_length=16, win_length=64,
                    n_mel_channels=8)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    rng = np.random.RandomState(0)
    lines = []
    for i in range(3):
        wav = (rng.randn(8192) * 3000).astype(np.int16)
        path = root / f"v{i}.wav"
        scipy.io.wavfile.write(path, 22050, wav)
        lines.append(f"{path}|ignored text")
    fl = root / "fl.txt"
    fl.write_text("\n".join(lines))
    return str(fl)


def test_segment_sampler_shapes(corpus):
    cfg = Tacotron2Config(filter_length=64, hop_length=16, win_length=64,
                          n_mel_channels=8)
    ds = TextMelDataset(corpus, cfg, shuffle=False)
    batch = next(segment_sampler(ds, MEL_CFG, segment_mels=16, batch_size=2))
    assert batch.audio.shape == (2, 16 * 16)
    assert batch.mel.shape == (2, 16, 8)
    assert float(np.abs(np.asarray(batch.audio)).max()) <= 1.0


def test_train_step_decreases_nll(corpus):
    import functools
    cfg = Tacotron2Config(filter_length=64, hop_length=16, win_length=64,
                          n_mel_channels=8)
    ds = TextMelDataset(corpus, cfg, shuffle=False)
    state = create_vocoder_state(jax.random.PRNGKey(0), WG_CFG, 1e-3)
    step = jax.jit(functools.partial(vocoder_train_step, cfg=WG_CFG,
                                     learning_rate=1e-3))
    batch = next(segment_sampler(ds, MEL_CFG, 16, 2))
    losses = []
    for _ in range(25):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_train_vocoder_end_to_end(corpus, tmp_path):
    cfg = Tacotron2Config(filter_length=64, hop_length=16, win_length=64,
                          n_mel_channels=8)
    ds = TextMelDataset(corpus, cfg, shuffle=False)
    state = train_vocoder(ds, str(tmp_path / "wg"), cfg=WG_CFG,
                          mel_cfg=MEL_CFG, steps=3, batch_size=2,
                          segment_mels=16, checkpoint_every=2, log_every=1)
    assert int(state.step) == 3
    import os
    assert any(f.startswith("checkpoint") for f in
               os.listdir(tmp_path / "wg"))
