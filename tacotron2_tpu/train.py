"""Training CLI.

Same surface as the reference (/root/reference/train.py:258-290):

    python -m tacotron2_tpu.train -o outdir -l logdir \
        [-c CKPT] [--warm_start] [--hparams k=v,k=v]

No multiproc.py equivalent is needed: one process drives all local chips
through the mesh; multi-host runs launch this same script once per host
(JAX runtime handles rendezvous — parallel/mesh.py).
"""

from __future__ import annotations

import argparse

from tacotron2_tpu.config import create_config
from tacotron2_tpu.data import DataPipeline, TextMelDataset
from tacotron2_tpu.training.trainer import Trainer


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output_directory", type=str, required=True,
                        help="directory for checkpoints")
    parser.add_argument("-l", "--log_directory", type=str, default="logs",
                        help="directory for logs (under output_directory)")
    parser.add_argument("-c", "--checkpoint_path", type=str, default=None,
                        help="checkpoint to resume from")
    parser.add_argument("--warm_start", action="store_true",
                        help="load model weights only, ignoring "
                             "config.ignore_layers")
    parser.add_argument("--hparams", type=str, default=None,
                        help="comma separated name=value pairs")
    args = parser.parse_args()

    config = create_config(args.hparams)

    trainer = Trainer(
        config, args.output_directory, args.log_directory,
        checkpoint_path=None if args.warm_start else args.checkpoint_path,
        warm_start_path=args.checkpoint_path if args.warm_start else None)

    train_data = DataPipeline(
        TextMelDataset(config.training_files, config), config)
    val_data = DataPipeline(
        TextMelDataset(config.validation_files, config, shuffle=False),
        config, drop_last=False)

    trainer.fit(train_data, val_data)


if __name__ == "__main__":
    main()
