"""Audio DSP tests.

Golden references are computed with numpy/scipy directly (framed rfft with a
periodic Hann window — the math the reference's conv-as-DFT STFT implements,
/root/reference/stft.py:52-105), so parity is checked against an independent
formulation rather than our own code.
"""

import numpy as np
import pytest
import scipy.signal

from tacotron2_tpu.audio import (
    MelConfig, STFTConfig, griffin_lim, istft, mel_spectrogram, stft,
)
from tacotron2_tpu.audio import filters


def _reference_stft_magnitude(y, n_fft=1024, hop=256, win=1024):
    """Independent numpy STFT: reflect pad, frame, periodic hann, rfft."""
    window = scipy.signal.get_window("hann", win, fftbins=True)
    pad = n_fft // 2
    y = np.pad(y, pad, mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    mags = np.empty((1 + n_fft // 2, n_frames), np.float32)
    for t in range(n_frames):
        frame = y[t * hop:t * hop + n_fft] * window
        mags[:, t] = np.abs(np.fft.rfft(frame))
    return mags


@pytest.fixture(scope="module")
def chirp():
    rng = np.random.RandomState(0)
    t = np.linspace(0, 1.0, 22050, endpoint=False)
    y = scipy.signal.chirp(t, f0=100, f1=4000, t1=1.0) * 0.5
    y += 0.01 * rng.randn(len(t))
    return y.astype(np.float32)


class TestWindowAndFilters:
    def test_periodic_hann_matches_scipy(self):
        ours = filters.periodic_hann(1024)
        theirs = scipy.signal.get_window("hann", 1024, fftbins=True)
        np.testing.assert_allclose(ours, theirs, atol=1e-7)

    def test_mel_filterbank_properties(self):
        mel_w = filters.mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
        assert mel_w.shape == (80, 513)
        assert np.all(mel_w >= 0)
        # triangles: every filter has support and a single peak region
        assert np.all(mel_w.sum(axis=1) > 0)
        # slaney area normalization: filter integral over Hz ~ constant 2·df
        # (up to discretization) — check rough uniformity
        areas = mel_w.sum(axis=1)
        assert areas.std() / areas.mean() < 0.35

    def test_mel_scale_roundtrip(self):
        f = np.array([0.0, 500.0, 1000.0, 4000.0, 8000.0])
        np.testing.assert_allclose(filters.mel_to_hz(filters.hz_to_mel(f)), f,
                                   rtol=1e-10)

    def test_mel_scale_slaney_constants(self):
        # linear region: 200/3 Hz per mel; 1 kHz lands exactly at mel 15
        np.testing.assert_allclose(filters.hz_to_mel(1000.0), 15.0)
        np.testing.assert_allclose(filters.hz_to_mel(200.0 / 3.0), 1.0)

    def test_window_sumsquare(self):
        env = filters.window_sumsquare(1024, 1024, 256, 10)
        assert env.shape == (1024 + 256 * 9,)
        # interior: 4 overlapping hann² windows sum to 4 * mean(hann²) = 1.5
        interior = env[1024:-1024]
        np.testing.assert_allclose(interior, 1.5, rtol=1e-5)


class TestSTFT:
    def test_magnitude_matches_numpy(self, chirp):
        mag, _ = stft(chirp[None, :], STFTConfig())
        expected = _reference_stft_magnitude(chirp)
        assert mag.shape[1:] == expected.shape
        np.testing.assert_allclose(np.asarray(mag[0]), expected,
                                   atol=2e-3, rtol=1e-4)

    def test_phase_consistency(self, chirp):
        """Re/Im implied by (mag, phase) must match numpy rfft."""
        mag, phase = stft(chirp[None, :], STFTConfig())
        window = scipy.signal.get_window("hann", 1024, fftbins=True)
        y = np.pad(chirp, 512, mode="reflect")
        spec = np.fft.rfft(y[:1024] * window)
        ours = np.asarray(mag[0, :, 0]) * np.exp(1j * np.asarray(phase[0, :, 0]))
        np.testing.assert_allclose(ours, spec, atol=5e-3)

    def test_roundtrip_reconstruction(self, chirp):
        cfg = STFTConfig()
        mag, phase = stft(chirp[None, :], cfg)
        recon = np.asarray(istft(mag, phase, cfg))[0]
        n = min(len(recon), len(chirp))
        # ignore edges where the envelope correction is partial
        err = np.abs(recon[1024:n - 1024] - chirp[1024:n - 1024])
        assert err.max() < 1e-3

    def test_batched(self, chirp):
        y = np.stack([chirp, chirp * 0.3])
        mag, _ = stft(y, STFTConfig())
        np.testing.assert_allclose(np.asarray(mag[1]), np.asarray(mag[0]) * 0.3,
                                   atol=1e-4)


class TestMel:
    def test_shape_and_layout(self, chirp):
        mel = mel_spectrogram(chirp[None, :], MelConfig())
        # 22050 samples, hop 256, centered: 1 + ceil? -> 87 frames
        assert mel.shape == (1, 80, 87)

    def test_log_compression_floor(self):
        silence = np.zeros((1, 4096), np.float32)
        mel = mel_spectrogram(silence, MelConfig())
        np.testing.assert_allclose(np.asarray(mel), np.log(1e-5), atol=1e-4)

    def test_matches_numpy_composition(self, chirp):
        cfg = MelConfig()
        mel = np.asarray(mel_spectrogram(chirp[None, :], cfg))[0]
        mag = _reference_stft_magnitude(chirp)
        mel_w = filters.mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
        expected = np.log(np.clip(mel_w @ mag, 1e-5, None))
        np.testing.assert_allclose(mel, expected, atol=2e-3)

    def test_scaling_sensitivity(self, chirp):
        """Louder audio -> uniformly higher log-mel (away from the floor)."""
        cfg = MelConfig()
        m1 = np.asarray(mel_spectrogram(chirp[None, :], cfg))
        m2 = np.asarray(mel_spectrogram(2.0 * chirp[None, :], cfg))
        active = m1 > np.log(1e-5) + 1.0
        np.testing.assert_allclose((m2 - m1)[active], np.log(2.0), atol=1e-2)


class TestGriffinLim:
    def test_recovers_signal_spectrum(self, chirp):
        cfg = STFTConfig()
        short = chirp[:8192]
        mag, _ = stft(short[None, :], cfg)
        audio = np.asarray(griffin_lim(mag, cfg, n_iters=20))
        assert audio.shape[0] == 1
        mag2, _ = stft(audio, cfg)
        t = min(mag.shape[-1], mag2.shape[-1])
        # spectral convergence: relative L2 between target and recovered mags
        num = np.linalg.norm(np.asarray(mag2)[..., :t] - np.asarray(mag)[..., :t])
        den = np.linalg.norm(np.asarray(mag)[..., :t])
        assert num / den < 0.25
