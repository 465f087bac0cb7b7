"""Mel-on-device training path tests."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data.dataset import mel_spectrogram_np
from tacotron2_tpu.audio.mel import MelConfig
from tacotron2_tpu.training import Batch, create_train_state
from tacotron2_tpu.training.audio_batch import (
    AudioBatch, mel_targets_from_audio, pad_audio_batch,
    train_step_from_audio,
)

CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=16, encoder_embedding_dim=16,
    encoder_n_convolutions=2, attention_rnn_dim=20, decoder_rnn_dim=24,
    prenet_dim=8, attention_dim=12, attention_location_n_filters=4,
    attention_location_kernel_size=7, postnet_embedding_dim=16,
    postnet_n_convolutions=3, n_mel_channels=20, max_decoder_steps=10,
    filter_length=256, hop_length=64, win_length=256,
)


@pytest.fixture(scope="module")
def audio_batch():
    rng = np.random.RandomState(0)
    t_mel = 32
    items = []
    for i, n in enumerate([64 * 31, 64 * 20 + 7]):
        ids = rng.randint(1, 148, 6 + i).astype(np.int32)
        wav = (rng.randn(n) * 0.2).astype(np.float32)
        items.append((ids, wav))
    return items, pad_audio_batch(items, t_text=8, t_mel=t_mel,
                                  hop_length=CFG.hop_length)


class TestTargets:
    def test_shapes_and_lengths(self, audio_batch):
        items, batch = audio_batch
        out = mel_targets_from_audio(batch, CFG, backend="xla")
        assert out.mel.shape == (2, 32, CFG.n_mel_channels)
        # frames = 1 + samples // hop
        np.testing.assert_array_equal(
            np.asarray(out.mel_lengths),
            [1 + len(items[0][1]) // 64, 1 + len(items[1][1]) // 64])

    def test_matches_host_pipeline(self, audio_batch):
        """Device-side targets equal the host numpy pipeline (up to the
        final 2 frames, whose reflect padding sees the batch zero-pad)."""
        items, batch = audio_batch
        out = mel_targets_from_audio(batch, CFG, backend="xla")
        mel_cfg = MelConfig.from_config(CFG)
        for b, (_, wav) in enumerate(items):
            host = mel_spectrogram_np(wav, mel_cfg).T  # (T, n_mels)
            L = int(out.mel_lengths[b])
            assert host.shape[0] == L
            np.testing.assert_allclose(np.asarray(out.mel[b, :L - 2]),
                                       host[:L - 2], atol=2e-3)

    def test_gate_and_masking_semantics(self, audio_batch):
        _, batch = audio_batch
        out = mel_targets_from_audio(batch, CFG, backend="xla")
        for b in range(2):
            L = int(out.mel_lengths[b])
            g = np.asarray(out.gate_target[b])
            np.testing.assert_array_equal(g[:L - 1], 0.0)
            np.testing.assert_array_equal(g[L - 1:], 1.0)
            np.testing.assert_array_equal(np.asarray(out.mel[b, L:]), 0.0)

    def test_pallas_interpret_matches_xla(self, audio_batch):
        _, batch = audio_batch
        # interpret-mode pallas on CPU via the backend switch in the kernel
        from tacotron2_tpu.kernels.mel_kernel import mel_spectrogram_pallas
        from tacotron2_tpu.audio.mel import mel_spectrogram
        mel_cfg = MelConfig.from_config(CFG)
        a = np.asarray(mel_spectrogram_pallas(batch.audio, mel_cfg,
                                              interpret=True))
        b = np.asarray(mel_spectrogram(batch.audio, mel_cfg))
        np.testing.assert_allclose(a, b, atol=2e-4)


@pytest.mark.slow
class TestTrainStep:
    def test_step_runs_and_learns(self, audio_batch):
        _, batch = audio_batch
        state = create_train_state(jax.random.PRNGKey(0), CFG)
        step = jax.jit(functools.partial(train_step_from_audio, cfg=CFG,
                                         mel_backend="xla"))
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(60):
            state, metrics, _ = step(state, batch, rng)
            losses.append(float(metrics.loss))
        assert np.isfinite(losses[-1])
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_equals_mel_batch_path(self, audio_batch):
        """One step from audio == one step from the equivalent mel batch."""
        _, batch = audio_batch
        from tacotron2_tpu.training import train_step
        state = create_train_state(jax.random.PRNGKey(0), CFG)
        rng = jax.random.PRNGKey(2)
        mel_batch = mel_targets_from_audio(batch, CFG, backend="xla")
        s1, m1, _ = jax.jit(functools.partial(
            train_step_from_audio, cfg=CFG, mel_backend="xla"))(
            state, batch, rng)
        s2, m2, _ = jax.jit(functools.partial(train_step, cfg=CFG))(
            state, mel_batch, rng)
        np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-6)
