"""Mixed grapheme/phoneme encoding tests."""

import random

import numpy as np
import pytest
import scipy.io.wavfile

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.text import SYMBOL_TO_ID, sequence_to_text
from tacotron2_tpu.text.arpabet import encode_mixed, words_to_arpabet
from tacotron2_tpu.text.cmudict import CMUDict

CMUDICT_DATA = (
    "HELLO  HH AH0 L OW1\n"
    "WORLD  W ER1 L D\n"
    "THE  DH AH0\n"
    "TWO  T UW1\n"
)


@pytest.fixture
def cmudict(tmp_path):
    path = tmp_path / "cmudict.txt"
    path.write_text(CMUDICT_DATA)
    return CMUDict(str(path))


def test_full_substitution(cmudict):
    rng = random.Random(0)
    out = words_to_arpabet("hello world!", cmudict, rng, p_arpabet=1.0)
    assert out == "{HH AH0 L OW1} {W ER1 L D}!"


def test_zero_probability_is_identity(cmudict):
    rng = random.Random(0)
    assert words_to_arpabet("hello world", cmudict, rng, 0.0) == "hello world"


def test_oov_words_stay_graphemes(cmudict):
    rng = random.Random(0)
    out = words_to_arpabet("hello zyzzyva", cmudict, rng, 1.0)
    assert out == "{HH AH0 L OW1} zyzzyva"


def test_encode_mixed_ids(cmudict):
    rng = random.Random(0)
    seq = encode_mixed("hello world.", ["english_cleaners"], cmudict, rng, 1.0)
    # ARPAbet IDs present, final punctuation preserved
    assert any(s >= 64 for s in seq)
    assert seq[-1] == SYMBOL_TO_ID["."]
    assert "{HH AH0 L OW1}" in sequence_to_text(seq)


def test_encode_mixed_numbers_still_expand(cmudict):
    rng = random.Random(0)
    seq = encode_mixed("the 2 worlds", ["english_cleaners"], cmudict, rng, 0.0)
    assert "two" in sequence_to_text(seq)


def test_dataset_integration(cmudict, tmp_path):
    wav = (np.zeros(4096)).astype(np.int16)
    wav_path = tmp_path / "u.wav"
    scipy.io.wavfile.write(wav_path, 22050, wav)
    fl = tmp_path / "fl.txt"
    fl.write_text(f"{wav_path}|hello world")
    cmupath = tmp_path / "cmu.txt"
    cmupath.write_text(CMUDICT_DATA)

    from tacotron2_tpu.data import TextMelDataset
    cfg = Tacotron2Config(p_arpabet=1.0, cmudict_path=str(cmupath))
    ds = TextMelDataset(str(fl), cfg, shuffle=False)
    ids, _ = ds[0]
    assert any(s >= 64 for s in ids)  # phonemes in the training sequence
