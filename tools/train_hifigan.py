"""HiFi-GAN vocoder training CLI.

    python tools/train_hifigan.py filelist.txt -o hifigan_out \
        [--steps N] [--batch 16] [--segment-mels 32]

Adversarial vocoder training (multi-period + multi-scale discriminators,
feature matching, mel L1) on (audio, mel) segments from a standard
``path|text`` filelist (transcripts ignored).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tacotron2_tpu.config import create_config  # noqa: E402
from tacotron2_tpu.audio.mel import MelConfig  # noqa: E402
from tacotron2_tpu.data import TextMelDataset  # noqa: E402
from tacotron2_tpu.models import hifigan  # noqa: E402
from tacotron2_tpu.training.hifigan_trainer import train_hifigan  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("filelist")
    parser.add_argument("-o", "--outdir", required=True)
    parser.add_argument("--steps", type=int, default=100000)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--segment-mels", type=int, default=32)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--hparams", default=None,
                        help="audio-config overrides (k=v,...)")
    args = parser.parse_args()

    cfg = create_config(args.hparams)
    dataset = TextMelDataset(args.filelist, cfg)
    train_hifigan(dataset, args.outdir,
                  cfg=hifigan.HiFiGANConfig(
                      n_mel_channels=cfg.n_mel_channels),
                  mel_cfg=MelConfig.from_config(cfg),
                  steps=args.steps, batch_size=args.batch,
                  segment_mels=args.segment_mels, learning_rate=args.lr,
                  seed=cfg.seed)


if __name__ == "__main__":
    main()
