"""Generate LJSpeech train/val/test filelists.

The reference ships fixed filelists (12,500 train / 100 val / 500 test,
``DUMMY/LJ###-####.wav|transcript`` — /root/reference/filelists/, SURVEY
§2.1 #23). Those are LJSpeech data, not code, so instead of copying them we
derive an equivalent split deterministically from the dataset's own
``metadata.csv``: seeded shuffle, same 12500/100/500 sizes, same
``path|normalized_transcript`` format.

Usage:
  python tools/make_ljspeech_filelists.py /path/to/LJSpeech-1.1 \
      [--outdir filelists] [--audio-root /path/to/LJSpeech-1.1/wavs]
"""

from __future__ import annotations

import argparse
import csv
import os
import random


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("ljspeech_root",
                        help="directory containing metadata.csv and wavs/")
    parser.add_argument("--outdir", default="filelists")
    parser.add_argument("--audio-root", default=None,
                        help="path prefix for wav files in the lists "
                             "(default: <root>/wavs)")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--n-val", type=int, default=100)
    parser.add_argument("--n-test", type=int, default=500)
    args = parser.parse_args()

    audio_root = args.audio_root or os.path.join(args.ljspeech_root, "wavs")
    meta = os.path.join(args.ljspeech_root, "metadata.csv")
    entries = []
    with open(meta, encoding="utf-8") as f:
        for row in csv.reader(f, delimiter="|", quoting=csv.QUOTE_NONE):
            if len(row) < 3:
                continue
            clip_id, _, normalized = row[0], row[1], row[2]
            path = os.path.join(audio_root, clip_id + ".wav")
            entries.append(f"{path}|{normalized}")

    random.Random(args.seed).shuffle(entries)
    n_val, n_test = args.n_val, args.n_test
    splits = {
        "ljs_audio_text_val_filelist.txt": entries[:n_val],
        "ljs_audio_text_test_filelist.txt": entries[n_val:n_val + n_test],
        "ljs_audio_text_train_filelist.txt": entries[n_val + n_test:],
    }
    os.makedirs(args.outdir, exist_ok=True)
    for name, lines in splits.items():
        with open(os.path.join(args.outdir, name), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        print(f"{name}: {len(lines)} entries")


if __name__ == "__main__":
    main()
