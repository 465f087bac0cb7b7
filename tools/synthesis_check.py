"""End-to-end synthesis quality gate for tone-corpus checkpoints.

Verifies the whole text->mel loop semantically: synthesize a prompt with
the trained model (tools/train_demo.py corpus: each character = a fixed
0.08 s tone) and check the mel's per-segment dominant frequency against
the character->frequency map. BASELINE.md records the round-1 result
(11/11 characters correct after 5,000 steps).

Usage:
  python tools/synthesis_check.py CHECKPOINT_DIR [--text "we like jax"]
      check an existing tone-corpus checkpoint;
  python tools/synthesis_check.py --train --steps 5000 [--seeds 1234,777]
      the FULL quality gate (round 4, VERDICT r3 #8): train on the tone
      corpus from scratch once per seed (two seeds by default, so a
      marginal pass cannot alias on one lucky init/dropout stream), run
      the check after each, and write a committed pass/fail artifact to
      QUALITY_GATE.json. Run this after any change that touches training
      numerics — per-step gradient parity does NOT catch accumulation
      drifts (it missed the round-3 backward-kernel bug; this gate
      caught it).
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


def check_checkpoint(checkpoint_dir: str, text: str, tolerance_hz: float,
                     hparams=None) -> dict:
    """Synthesize ``text`` from a tone-corpus checkpoint and score the
    per-character dominant frequencies. Returns the result dict."""
    cfg = Tacotron2Config(
        batch_size=32, compute_dtype="bfloat16", decoder_scan_unroll=4,
        text_buckets=(32, 48), mel_bucket_step=128, max_mel_length=512)
    if hparams:
        cfg = parse_overrides(cfg, hparams)

    state = Checkpointer(checkpoint_dir).restore(
        create_train_state(jax.random.PRNGKey(0), cfg))
    print(f"restored step {int(state.step)}")

    [res] = synthesize(state.params, state.stats, [text],
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
    for i, ch in enumerate(text):
        lo = int(i * frames_per_char)
        hi = int((i + 1) * frames_per_char)
        if hi > len(dominant):
            break
        expected = 200.0 + 40.0 * (ord(ch) % 32)
        got = float(np.median(dominant[lo:hi]))
        ok = abs(got - expected) < tolerance_hz
        hits += ok
        total += 1
        print(f"char {ch!r}: expected {expected:6.0f} Hz got {got:6.0f} Hz "
              f"{'OK' if ok else 'MISS'}")
    result = {"chars_matched": hits, "total": total,
              "frames": int(mel.shape[0])}
    print(json.dumps(result))
    return result


def run_gate(steps: int, seeds, text: str, tolerance_hz: float,
             out_path: str, workdir: str) -> dict:
    """Train-from-scratch quality gate: one tone-corpus run per seed at
    the SHIPPED kernel defaults, then the synthesis check. Expected
    characters = len(text) (the round-1 baseline: 11/11 on 'we like
    jax'); the round-3 drift read 8/11 with a late gate."""
    import shutil
    import train_demo

    runs = {}
    for seed in seeds:
        outdir = os.path.join(workdir, f"gate_seed{seed}")
        shutil.rmtree(outdir, ignore_errors=True)
        print(f"=== quality gate: training {steps} steps, seed {seed} ===",
              flush=True)
        summary = train_demo.run(steps, outdir, hparams=f"seed={seed}")
        res = check_checkpoint(outdir, text, tolerance_hz)
        res["final_loss"] = summary["final_loss"]
        res["pass"] = (res["total"] == len(text)
                       and res["chars_matched"] == res["total"])
        runs[f"seed{seed}"] = res
    import datetime
    import subprocess
    try:
        code_state = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip() or "unknown"
    except OSError:
        code_state = "unknown"
    gate = {
        "date": datetime.date.today().isoformat(),
        "steps": steps,
        "code_state": code_state,
        "note": (f"two-seed tone-corpus gate at {steps} steps/seed; pass = "
                 "every tone recognized with matched character count in "
                 "every run"),
        "text": text,
        "runs": runs,
        "pass": all(r["pass"] for r in runs.values()),
    }
    with open(out_path, "w") as f:
        json.dump(gate, f, indent=1)
    print(json.dumps({"quality_gate": gate["pass"], "artifact": out_path}))
    return gate


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_dir", nargs="?")
    parser.add_argument("--text", default="we like jax")
    parser.add_argument("--hparams", default=None)
    parser.add_argument("--tolerance-hz", type=float, default=60.0)
    parser.add_argument("--train", action="store_true",
                        help="full gate: train per seed, check, write "
                             "QUALITY_GATE.json")
    # 2500 is the measured separation point (round 5): the known-bad
    # backward kernel (bf16 d_M summation, commit 7946be1~1) already
    # fails at 2.5k steps (8/11 tones, late gate at 90 frames) while the
    # shipped kernels pass 11/11 on both seeds — half the chip time of
    # the 5k gate (QUALITY_GATE_SEPARATION.json). Use --steps 5000 for
    # the round-end gate.
    parser.add_argument("--steps", type=int, default=2500)
    parser.add_argument("--seeds", default="1234,777")
    parser.add_argument("--out", default="QUALITY_GATE.json")
    parser.add_argument("--workdir", default="/tmp/quality_gate")
    args = parser.parse_args()

    if args.train:
        seeds = [int(s) for s in args.seeds.split(",") if s]
        gate = run_gate(args.steps, seeds, args.text, args.tolerance_hz,
                        args.out, args.workdir)
        sys.exit(0 if gate["pass"] else 1)
    if not args.checkpoint_dir:
        parser.error("checkpoint_dir required unless --train")
    check_checkpoint(args.checkpoint_dir, args.text, args.tolerance_hz,
                     args.hparams)


if __name__ == "__main__":
    main()
