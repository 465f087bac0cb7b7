"""WAV header-only length probing tests."""

import numpy as np
import scipy.io.wavfile

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data.dataset import item_lengths, wav_num_samples


def test_wav_num_samples(tmp_path):
    for n in (1000, 4096, 12345):
        path = str(tmp_path / f"t{n}.wav")
        scipy.io.wavfile.write(path, 22050,
                               np.zeros(n, np.int16))
        assert wav_num_samples(path) == n


def test_item_lengths_matches_extraction(tmp_path):
    cfg = Tacotron2Config()
    path = str(tmp_path / "x.wav")
    scipy.io.wavfile.write(path, 22050,
                           (np.random.RandomState(0).randn(9999) * 1000)
                           .astype(np.int16))
    t_len, m_len = item_lengths([path, "hello world"], cfg)
    assert t_len == len("hello world")
    # must equal the frames the actual extractor produces
    from tacotron2_tpu.audio.mel import MelConfig
    from tacotron2_tpu.data.dataset import mel_spectrogram_np
    mel = mel_spectrogram_np(np.zeros(9999, np.float32),
                             MelConfig.from_config(cfg))
    assert m_len == mel.shape[1]


def test_item_lengths_npy(tmp_path):
    cfg = Tacotron2Config()
    mel = np.zeros((80, 37), np.float32)
    np.save(tmp_path / "c.npy", mel)
    _, m_len = item_lengths([str(tmp_path / "c.npy"), "text"], cfg)
    assert m_len == 37
