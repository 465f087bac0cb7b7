"""Offline mel cache: precompute .npy mels for a filelist.

Equivalent of the reference's ``load_mel_from_disk`` workflow
(/root/reference/data_utils.py:48-52): run once, then train with
``load_mel_from_disk=true`` and a filelist pointing at the .npy files —
removing mel extraction from the training-time hot path entirely.

Usage: python tools/cache_mels.py filelist.txt [--out filelist_mels.txt]
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tacotron2_tpu.audio.mel import MelConfig  # noqa: E402
from tacotron2_tpu.config import create_config  # noqa: E402
from tacotron2_tpu.data.dataset import (  # noqa: E402
    load_filelist, load_wav, mel_spectrogram_np,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("filelist")
    parser.add_argument("--out", default=None,
                        help="write a filelist pointing at the cached .npy")
    parser.add_argument("--hparams", default=None)
    parser.add_argument("--workers", type=int, default=16)
    args = parser.parse_args()

    cfg = create_config(args.hparams)
    mel_cfg = MelConfig.from_config(cfg)
    entries = load_filelist(args.filelist)

    def process(entry):
        audio_path = entry[0]
        npy_path = os.path.splitext(audio_path)[0] + ".npy"
        if not os.path.exists(npy_path):
            audio, sr = load_wav(audio_path)
            if sr != cfg.sampling_rate:
                raise ValueError(f"{audio_path}: sr {sr}")
            mel = mel_spectrogram_np(audio / cfg.max_wav_value, mel_cfg)
            np.save(npy_path, mel)
        return [npy_path] + list(entry[1:])

    with ThreadPoolExecutor(args.workers) as pool:
        new_entries = list(pool.map(process, entries))

    if args.out:
        with open(args.out, "w") as f:
            for entry in new_entries:
                f.write("|".join(entry) + "\n")
    print(f"cached {len(new_entries)} mels")


if __name__ == "__main__":
    main()
