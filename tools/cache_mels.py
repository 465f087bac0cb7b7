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
    parser.add_argument("--device", action="store_true",
                        help="extract on the TPU with the fused Pallas mel "
                             "kernel (2.1x the XLA path; see PERFORMANCE.md) "
                             "instead of host CPU")
    args = parser.parse_args()

    cfg = create_config(args.hparams)
    mel_cfg = MelConfig.from_config(cfg)
    entries = load_filelist(args.filelist)

    device_extract = None
    if args.device:
        import jax.numpy as jnp
        from tacotron2_tpu.kernels import mel_spectrogram_pallas

        def device_extract(audio):
            # one utterance per call; batched-by-length batching would be
            # faster still, but cache generation is a one-time pass
            mel = mel_spectrogram_pallas(jnp.asarray(audio)[None], mel_cfg)
            return np.asarray(mel[0])

    def process(entry):
        audio_path = entry[0]
        npy_path = os.path.splitext(audio_path)[0] + ".npy"
        if not os.path.exists(npy_path):
            audio, sr = load_wav(audio_path)
            if sr != cfg.sampling_rate:
                raise ValueError(f"{audio_path}: sr {sr}")
            audio = audio / cfg.max_wav_value
            mel = (device_extract(audio) if device_extract is not None
                   else mel_spectrogram_np(audio, mel_cfg))
            np.save(npy_path, mel)
        return [npy_path] + list(entry[1:])

    workers = 1 if args.device else args.workers
    with ThreadPoolExecutor(workers) as pool:
        new_entries = list(pool.map(process, entries))

    if args.out:
        with open(args.out, "w") as f:
            for entry in new_entries:
                f.write("|".join(entry) + "\n")
    print(f"cached {len(new_entries)} mels")


if __name__ == "__main__":
    main()
