"""Native (C++) DSP library tests: parity with the numpy/JAX paths."""

import numpy as np
import pytest
import scipy.io.wavfile

from tacotron2_tpu.audio.mel import MelConfig
from tacotron2_tpu.data import native
from tacotron2_tpu.data.dataset import mel_spectrogram_np

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libtaco_dsp.so not built")


@pytest.fixture(scope="module")
def audio():
    rng = np.random.RandomState(0)
    t = np.linspace(0, 1, 22050, endpoint=False)
    y = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.randn(len(t))
    return y.astype(np.float32)


def test_native_mel_matches_numpy(audio):
    cfg = MelConfig()
    expected = mel_spectrogram_np(audio, cfg)
    got = native.NativeMelExtractor(cfg).extract(audio)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_native_mel_small_config(audio):
    cfg = MelConfig(filter_length=256, hop_length=64, win_length=256,
                    n_mel_channels=20, mel_fmax=8000.0)
    expected = mel_spectrogram_np(audio[:8000], cfg)
    got = native.NativeMelExtractor(cfg).extract(audio[:8000])
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_native_wav_read(tmp_path, audio):
    path = str(tmp_path / "test.wav")
    pcm = (audio * 20000).astype(np.int16)
    scipy.io.wavfile.write(path, 22050, pcm)
    got, sr = native.wav_read(path)
    assert sr == 22050
    np.testing.assert_allclose(got, pcm.astype(np.float32), atol=0.5)


def test_native_wav_read_float32(tmp_path, audio):
    path = str(tmp_path / "testf.wav")
    scipy.io.wavfile.write(path, 22050, (audio / 2).astype(np.float32))
    got, sr = native.wav_read(path)
    assert sr == 22050
    np.testing.assert_allclose(got / 32768.0, audio / 2, atol=1e-4)


def test_native_faster_than_numpy(audio):
    """The point of the native path: beat numpy on the per-utterance hot
    loop (it avoids large temporary allocations and the GIL)."""
    import time
    cfg = MelConfig()
    ext = native.NativeMelExtractor(cfg)
    ext.extract(audio)  # warm
    mel_spectrogram_np(audio, cfg)

    t0 = time.perf_counter()
    for _ in range(5):
        ext.extract(audio)
    native_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        mel_spectrogram_np(audio, cfg)
    numpy_dt = time.perf_counter() - t0
    # don't be flaky: just require the native path is not dramatically slower
    assert native_dt < numpy_dt * 3, (native_dt, numpy_dt)
