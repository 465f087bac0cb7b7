"""Data pipeline tests: dataset, bucketing, gate targets, prefetch."""

import os

import numpy as np
import pytest
import scipy.io.wavfile

import jax.numpy as jnp

from tacotron2_tpu.audio.mel import MelConfig, mel_spectrogram
from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data import (
    BucketSampler, DataPipeline, TextMelDataset, load_filelist, pad_batch,
    prefetch, mel_spectrogram_np, text_bucket,
)

CFG = Tacotron2Config(batch_size=2, text_buckets=(16, 32, 64),
                      mel_bucket_step=32, max_mel_length=256)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Tiny synthetic wav corpus + filelist."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.RandomState(0)
    lines = []
    texts = ["hello world.", "the quick brown fox jumps over the lazy dog",
             "a b c.", "testing one two three, testing.",
             "yet another utterance here", "short"]
    for i, text in enumerate(texts):
        n = 4096 + 2048 * i
        wav = (rng.randn(n) * 3000).astype(np.int16)
        path = root / f"utt{i}.wav"
        scipy.io.wavfile.write(path, 22050, wav)
        lines.append(f"{path}|{text}")
    filelist = root / "filelist.txt"
    filelist.write_text("\n".join(lines))
    return str(filelist)


class TestDataset:
    def test_load_filelist(self, corpus):
        entries = load_filelist(corpus)
        assert len(entries) == 6
        assert len(entries[0]) == 2

    def test_getitem(self, corpus):
        ds = TextMelDataset(corpus, CFG, shuffle=False)
        ids, mel = ds[0]
        assert ids.dtype == np.int32 and ids.ndim == 1 and len(ids) > 0
        assert mel.shape[0] == CFG.n_mel_channels
        assert mel.dtype == np.float32

    def test_seeded_shuffle_deterministic(self, corpus):
        d1 = TextMelDataset(corpus, CFG)
        d2 = TextMelDataset(corpus, CFG)
        assert [e[0] for e in d1.entries] == [e[0] for e in d2.entries]

    def test_host_mel_matches_device_mel(self, corpus):
        """numpy (worker) and jitted (device) mel paths must agree —
        cached and on-the-fly mels are interchangeable."""
        rng = np.random.RandomState(1)
        y = (rng.randn(9000) * 0.1).astype(np.float32)
        host = mel_spectrogram_np(y, MelConfig())
        dev = np.asarray(mel_spectrogram(jnp.asarray(y)[None], MelConfig()))[0]
        np.testing.assert_allclose(host, dev, atol=2e-4)

    def test_sample_rate_mismatch_raises(self, corpus, tmp_path):
        wav = (np.zeros(1000)).astype(np.int16)
        path = tmp_path / "bad.wav"
        scipy.io.wavfile.write(path, 16000, wav)
        fl = tmp_path / "fl.txt"
        fl.write_text(f"{path}|oops")
        ds = TextMelDataset(str(fl), CFG, shuffle=False)
        with pytest.raises(ValueError, match="sample rate"):
            ds[0]

    def test_cached_npy_path(self, corpus, tmp_path):
        mel = np.random.RandomState(0).randn(80, 37).astype(np.float32)
        np.save(tmp_path / "utt.npy", mel)
        fl = tmp_path / "fl.txt"
        fl.write_text(f"{tmp_path / 'utt.npy'}|cached item")
        ds = TextMelDataset(str(fl), CFG, shuffle=False)
        _, got = ds[0]
        np.testing.assert_array_equal(got, mel)


class TestBucketing:
    def test_text_bucket(self):
        assert text_bucket(5, (16, 32)) == 16
        assert text_bucket(16, (16, 32)) == 16
        assert text_bucket(17, (16, 32)) == 32

    def test_text_bucket_auto_extends_beyond_last(self):
        """Over-long text must never be clamped (silent truncation); the
        bucket grid extends by the last spacing, with a warning."""
        with pytest.warns(UserWarning, match="auto-extending"):
            assert text_bucket(99, (16, 32)) == 112  # 32 + 16*5
        assert text_bucket(33, (16, 32)) == 48
        assert text_bucket(70, (64,)) == 128  # single bucket: spacing = size

    def test_pad_batch_rejects_text_truncation(self):
        items = [(np.arange(10, dtype=np.int32), np.ones((4, 5), np.float32))]
        with pytest.raises(ValueError, match="truncate text"):
            pad_batch(items, t_text=8, t_mel=8)

    def test_pad_batch_warns_on_mel_truncation(self):
        items = [(np.array([1, 2], np.int32), np.ones((4, 12), np.float32))]
        with pytest.warns(UserWarning, match="mel row 0 truncated"):
            _, _, mel, gate, ml = pad_batch(items, t_text=4, t_mel=8)[:5]
        assert ml[0] == 8

    def test_pad_batch_gate_semantics(self):
        """gate = 1.0 from the LAST REAL frame on (data_utils.py:107)."""
        items = [(np.array([1, 2, 3], np.int32),
                  np.ones((4, 5), np.float32)),
                 (np.array([4, 5], np.int32),
                  np.ones((4, 8), np.float32))]
        text, tl, mel, gate, ml = pad_batch(items, t_text=4, t_mel=8)
        assert mel.shape == (2, 8, 4)
        np.testing.assert_array_equal(tl, [3, 2])
        np.testing.assert_array_equal(ml, [5, 8])
        np.testing.assert_array_equal(gate[0], [0, 0, 0, 0, 1, 1, 1, 1])
        np.testing.assert_array_equal(gate[1], [0, 0, 0, 0, 0, 0, 0, 1])
        # padding regions zero
        np.testing.assert_array_equal(mel[0, 5:], 0.0)
        np.testing.assert_array_equal(text[1, 2:], 0)

    def test_sampler_fixed_shapes(self):
        lengths = [(10, 40), (12, 45), (30, 100), (28, 120), (9, 30), (31, 90)]
        sampler = BucketSampler(lengths, CFG, batch_size=2)
        shapes = [s for s, _ in sampler.batches(np.random.RandomState(0))]
        for t_text, t_mel in shapes:
            assert t_text in CFG.text_buckets
            assert t_mel % CFG.mel_bucket_step == 0

    def test_sampler_drop_last(self):
        lengths = [(10, 40)] * 5  # one bucket, batch 2 -> 2 batches, 1 dropped
        sampler = BucketSampler(lengths, CFG, batch_size=2, drop_last=True)
        batches = list(sampler.batches(np.random.RandomState(0)))
        assert len(batches) == 2
        sampler2 = BucketSampler(lengths, CFG, batch_size=2, drop_last=False)
        assert len(list(sampler2.batches(np.random.RandomState(0)))) == 3

    def test_all_items_covered_once(self):
        lengths = [(i % 30 + 2, 30 + i % 100) for i in range(40)]
        sampler = BucketSampler(lengths, CFG, batch_size=2, drop_last=False)
        seen = [i for _, idxs in sampler.batches(np.random.RandomState(1))
                for i in idxs]
        assert sorted(seen) == list(range(40))


class TestPipeline:
    def test_epoch_batches(self, corpus):
        ds = TextMelDataset(corpus, CFG, shuffle=False)
        pipe = DataPipeline(ds, CFG, batch_size=2, drop_last=False,
                            num_workers=2, process_index=0, process_count=1)
        batches = list(pipe.epoch(0))
        assert len(batches) >= 2
        # partial batches are padded (by cycling) to the full batch size
        assert all(b.text.shape[0] == 2 for b in batches)
        for b in batches:
            assert b.mel.shape[1] % CFG.mel_bucket_step == 0
            assert b.mel.shape[2] == CFG.n_mel_channels

    def test_multihost_sharding_disjoint(self, corpus):
        ds = TextMelDataset(corpus, CFG, shuffle=False)
        p0 = DataPipeline(ds, CFG, process_index=0, process_count=2)
        p1 = DataPipeline(ds, CFG, process_index=1, process_count=2)
        assert set(p0.indices).isdisjoint(p1.indices)
        assert len(p0.indices) + len(p1.indices) == 6

    def test_prefetch_preserves_order_and_errors(self):
        assert list(prefetch(iter(range(10)), depth=3)) == list(range(10))

        def boom():
            yield 1
            raise RuntimeError("worker failed")
        gen = prefetch(boom(), depth=2)
        assert next(gen) == 1
        with pytest.raises(RuntimeError, match="worker failed"):
            list(gen)
