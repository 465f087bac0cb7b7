"""End-to-end synthesis quality gate for tone-corpus checkpoints.

Verifies the whole text->mel loop semantically: synthesize a prompt with
the trained model (tools/train_demo.py corpus: each character = a fixed
0.08 s tone) and check the mel's per-segment dominant frequency against
the character->frequency map. BASELINE.md records the round-1 result
(11/11 characters correct after 5,000 steps).

Usage: python tools/synthesis_check.py CHECKPOINT_DIR [--text "we like jax"]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from tacotron2_tpu.audio import filters  # noqa: E402
from tacotron2_tpu.config import Tacotron2Config, parse_overrides  # noqa: E402
from tacotron2_tpu.infer import synthesize  # noqa: E402
from tacotron2_tpu.training.checkpoint import Checkpointer  # noqa: E402
from tacotron2_tpu.training.state import create_train_state  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_dir")
    parser.add_argument("--text", default="we like jax")
    parser.add_argument("--hparams", default=None)
    parser.add_argument("--tolerance-hz", type=float, default=60.0)
    args = parser.parse_args()

    cfg = Tacotron2Config(
        batch_size=32, compute_dtype="bfloat16", decoder_scan_unroll=4,
        text_buckets=(32, 48), mel_bucket_step=128, max_mel_length=512)
    if args.hparams:
        cfg = parse_overrides(cfg, args.hparams)

    state = Checkpointer(args.checkpoint_dir).restore(
        create_train_state(jax.random.PRNGKey(0), cfg))
    print(f"restored step {int(state.step)}")

    [res] = synthesize(state.params, state.stats, [args.text],
                       cfg.replace(prenet_dropout_at_inference=False),
                       vocoder="none")
    mel = res.mel

    mel_w = filters.mel_filterbank(cfg.sampling_rate, cfg.filter_length, 80,
                                   cfg.mel_fmin, cfg.mel_fmax)
    bin_freqs = np.linspace(0, cfg.sampling_rate / 2, 513)
    mel_center = ((mel_w * bin_freqs[None, :]).sum(1)
                  / np.maximum(mel_w.sum(1), 1e-9))
    dominant = mel_center[np.asarray(mel).argmax(axis=1)]

    frames_per_char = 0.08 * cfg.sampling_rate / cfg.hop_length
    hits, total = 0, 0
    for i, ch in enumerate(args.text):
        lo = int(i * frames_per_char)
        hi = int((i + 1) * frames_per_char)
        if hi > len(dominant):
            break
        expected = 200.0 + 40.0 * (ord(ch) % 32)
        got = float(np.median(dominant[lo:hi]))
        ok = abs(got - expected) < args.tolerance_hz
        hits += ok
        total += 1
        print(f"char {ch!r}: expected {expected:6.0f} Hz got {got:6.0f} Hz "
              f"{'OK' if ok else 'MISS'}")
    print(json.dumps({"chars_matched": hits, "total": total,
                      "frames": int(mel.shape[0])}))


if __name__ == "__main__":
    main()
