"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tacotron2_tpu.audio.mel import MelConfig, mel_spectrogram
from tacotron2_tpu.kernels import mel_spectrogram_pallas


@pytest.fixture(scope="module")
def audio():
    rng = np.random.RandomState(0)
    return (rng.randn(2, 22050) * 0.2).astype(np.float32)


def test_pallas_mel_matches_xla(audio):
    cfg = MelConfig()
    expected = np.asarray(mel_spectrogram(jnp.asarray(audio), cfg))
    got = np.asarray(mel_spectrogram_pallas(jnp.asarray(audio), cfg,
                                            interpret=True))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_pallas_mel_nonmultiple_block(audio):
    """Frame count not a multiple of BLOCK_T (87 frames with defaults)."""
    cfg = MelConfig()
    short = audio[:, :10000]
    expected = np.asarray(mel_spectrogram(jnp.asarray(short), cfg))
    got = np.asarray(mel_spectrogram_pallas(jnp.asarray(short), cfg,
                                            interpret=True))
    np.testing.assert_allclose(got, expected, atol=2e-4)
