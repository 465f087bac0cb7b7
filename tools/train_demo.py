"""End-to-end training demonstration on real hardware.

LJSpeech is not available in this environment (zero egress), so this builds
a synthetic-but-learnable corpus: each character maps to a fixed tone, each
utterance is the concatenation of its characters' tones. A working
text->mel model must then learn a clean monotonic alignment — the same
health signal the reference's TensorBoard alignment image provides
(SURVEY §4). Exercises the full stack end to end: native WAV/mel pipeline,
bucketing, sharded bf16 training, checkpointing, metric logging.

Usage: python tools/train_demo.py [--steps 300] [--outdir demo_run]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scipy.io.wavfile  # noqa: E402


def build_corpus(root: str, n_utts: int = 128, seed: int = 0) -> str:
    """Write wavs + filelist. Tone per character, 0.08 s each at 22.05 kHz."""
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    words = ["we", "like", "fast", "chips", "sound", "model", "text",
             "train", "mel", "jax"]
    sr, tone_len = 22050, int(0.08 * 22050)
    lines = []
    for i in range(n_utts):
        text = " ".join(rng.choice(words, rng.randint(3, 7)))
        samples = []
        for ch in text:
            freq = 200.0 + 40.0 * (ord(ch) % 32)
            t = np.arange(tone_len) / sr
            tone = np.sin(2 * np.pi * freq * t) * 0.4
            tone *= np.hanning(tone_len)  # avoid clicks
            samples.append(tone)
        wav = (np.concatenate(samples) * 32767 * 0.5).astype(np.int16)
        path = os.path.join(root, f"utt{i:04d}.wav")
        scipy.io.wavfile.write(path, sr, wav)
        lines.append(f"{path}|{text}")
    filelist = os.path.join(root, "train.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(lines))
    return filelist


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--outdir", default="demo_run")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--hparams", default=None,
                        help="extra config overrides, e.g. n_frames_per_step=2")
    args = parser.parse_args()
    run(args.steps, args.outdir, batch=args.batch, hparams=args.hparams)


def run(steps: int, outdir: str, batch: int = 32,
        hparams: "str | None" = None) -> dict:
    """Train on the tone corpus; returns (and writes) the summary dict.
    Callable entry for the quality gate (tools/synthesis_check.py)."""

    class args:  # keep the body below identical to the old CLI flow
        pass

    args.steps, args.outdir, args.batch, args.hparams = (
        steps, outdir, batch, hparams)

    from tacotron2_tpu.config import Tacotron2Config
    from tacotron2_tpu.data import DataPipeline, TextMelDataset, prefetch
    from tacotron2_tpu.training.trainer import Trainer

    cfg = Tacotron2Config(
        batch_size=args.batch, compute_dtype="bfloat16",
        decoder_scan_unroll=4, iters_per_checkpoint=max(args.steps // 2, 1),
        text_buckets=(32, 48), mel_bucket_step=128, max_mel_length=512,
        learning_rate=1e-3)
    if args.hparams:
        from tacotron2_tpu.config import parse_overrides
        cfg = parse_overrides(cfg, args.hparams)

    filelist = build_corpus(os.path.join(args.outdir, "corpus"))
    dataset = TextMelDataset(filelist, cfg)
    pipe = DataPipeline(dataset, cfg, num_workers=8,
                        process_index=0, process_count=1)
    trainer = Trainer(cfg, args.outdir)

    losses = []
    steps_done = 0
    epoch = 0
    import time
    t_start = time.time()
    while steps_done < args.steps:
        for batch in prefetch(pipe.epoch(epoch), depth=2):
            t0 = time.perf_counter()
            trainer.state, metrics = trainer.train_step_fn(
                trainer.state, batch, trainer.rng)
            loss = float(metrics.loss)
            losses.append(loss)
            steps_done += 1
            if steps_done % 20 == 0 or steps_done == 1:
                print(f"step {steps_done}: loss {loss:.4f} "
                      f"({time.perf_counter() - t0:.3f}s)", flush=True)
            if steps_done >= args.steps:
                break
        epoch += 1

    trainer.checkpointer.save(trainer.state, wait=True)
    summary = {
        "steps": steps_done,
        "first_loss": losses[0],
        "loss_at_10pct": float(np.mean(losses[:max(len(losses) // 10, 1)])),
        "final_loss": float(np.mean(losses[-10:])),
        "wall_s": round(time.time() - t_start, 1),
    }
    with open(os.path.join(args.outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))

    # alignment health artifact from a validation-style forward
    from tacotron2_tpu.training.state import eval_step
    batch = next(iter(pipe.epoch(0)))
    _, output = eval_step(trainer.state, batch, cfg)
    np.save(os.path.join(args.outdir, "alignment.npy"),
            np.asarray(output.alignments[0]))
    try:
        from tacotron2_tpu.training.logging import plot_alignment
        from PIL import Image
        Image.fromarray(plot_alignment(np.asarray(output.alignments[0]))) \
            .save(os.path.join(args.outdir, "alignment.png"))
        print("wrote alignment.png")
    except Exception as e:
        print("plot skipped:", e)
    return summary


if __name__ == "__main__":
    main()
