"""Tool script tests: filelist generation, mel caching."""

import os
import subprocess
import sys

import numpy as np
import scipy.io.wavfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **kw):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=env, cwd=REPO, timeout=180, **kw)


class TestMakeFilelists:
    def test_split_sizes_and_format(self, tmp_path):
        root = tmp_path / "LJSpeech-1.1"
        (root / "wavs").mkdir(parents=True)
        with open(root / "metadata.csv", "w") as f:
            for i in range(40):
                f.write(f"LJ001-{i:04d}|raw text {i}|Normalized text {i}.\n")
        out = tmp_path / "filelists"
        r = _run(["tools/make_ljspeech_filelists.py", str(root),
                  "--outdir", str(out), "--n-val", "5", "--n-test", "10"])
        assert r.returncode == 0, r.stderr
        val = open(out / "ljs_audio_text_val_filelist.txt").read().splitlines()
        test = open(out / "ljs_audio_text_test_filelist.txt").read().splitlines()
        train = open(out / "ljs_audio_text_train_filelist.txt").read().splitlines()
        assert (len(val), len(test), len(train)) == (5, 10, 25)
        path, text = train[0].split("|")
        assert path.endswith(".wav") and "wavs" in path
        assert text.startswith("Normalized")
        # deterministic split: no overlap
        assert not (set(val) & set(test)) and not (set(val) & set(train))


class TestCacheMels:
    def test_cache_and_filelist_rewrite(self, tmp_path):
        rng = np.random.RandomState(0)
        lines = []
        for i in range(3):
            wav = (rng.randn(4096) * 2000).astype(np.int16)
            path = tmp_path / f"u{i}.wav"
            scipy.io.wavfile.write(path, 22050, wav)
            lines.append(f"{path}|utterance {i}")
        fl = tmp_path / "fl.txt"
        fl.write_text("\n".join(lines))
        out_fl = tmp_path / "fl_mels.txt"
        r = _run(["tools/cache_mels.py", str(fl), "--out", str(out_fl)])
        assert r.returncode == 0, r.stderr
        cached = open(out_fl).read().splitlines()
        assert len(cached) == 3
        for line in cached:
            npy = line.split("|")[0]
            assert npy.endswith(".npy") and os.path.exists(npy)
            mel = np.load(npy)
            assert mel.shape[0] == 80

    def test_cached_mels_load_in_dataset(self, tmp_path):
        from tacotron2_tpu.config import Tacotron2Config
        from tacotron2_tpu.data import TextMelDataset
        rng = np.random.RandomState(1)
        wav = (rng.randn(4096) * 2000).astype(np.int16)
        path = tmp_path / "a.wav"
        scipy.io.wavfile.write(path, 22050, wav)
        fl = tmp_path / "fl.txt"
        fl.write_text(f"{path}|hello")
        out_fl = tmp_path / "fl2.txt"
        r = _run(["tools/cache_mels.py", str(fl), "--out", str(out_fl)])
        assert r.returncode == 0, r.stderr
        cfg = Tacotron2Config(load_mel_from_disk=True)
        ds = TextMelDataset(str(out_fl), cfg, shuffle=False)
        ids, mel = ds[0]
        # cached mel equals direct extraction
        ds2 = TextMelDataset(str(fl), cfg.replace(load_mel_from_disk=False),
                             shuffle=False)
        _, mel2 = ds2[0]
        np.testing.assert_allclose(mel, mel2, atol=5e-4)
