"""Training driver: the reference ``train()`` loop, TPU-native.

Mirrors /root/reference/train.py:149-255 feature-for-feature — epoch loop,
per-iteration logging, periodic validation + checkpoint, resume/warm-start,
live learning-rate injection, non-finite-loss step skipping (the bf16-world
analog of the fp16 overflow skip, train.py:228-249) — but with: one jitted
sharded train step (per bucket shape), host prefetch, async checkpoints.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data import DataPipeline, prefetch
from tacotron2_tpu.parallel import (
    create_mesh, create_sharded_state, initialize_distributed, make_eval_step,
    make_train_step, shard_tree,
)
from tacotron2_tpu.training.checkpoint import Checkpointer, warm_start
from tacotron2_tpu.training.logging import MetricLogger
from tacotron2_tpu.training.state import TrainState, create_train_state


class Trainer:
    def __init__(self, config: Tacotron2Config, output_directory: str,
                 log_directory: str = "logs",
                 checkpoint_path: Optional[str] = None,
                 warm_start_path: Optional[str] = None):
        initialize_distributed()
        config.validate()
        if config.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if config.prng_impl != "threefry":
            jax.config.update("jax_default_prng_impl", config.prng_impl)
        self.config = config
        # mesh_shape=(1,1) (the default) means all devices on dp
        self.mesh = create_mesh(
            config.mesh_shape if int(np.prod(config.mesh_shape)) > 1 else None)
        self.checkpointer = Checkpointer(output_directory)
        self.logger = MetricLogger(f"{output_directory}/{log_directory}")
        self.rng = jax.random.PRNGKey(config.seed)
        if jax.process_index() == 0:
            # reproducibility snapshot of the exact configuration
            import dataclasses, json, os
            with open(os.path.join(output_directory, "config.json"),
                      "w") as f:
                json.dump(dataclasses.asdict(config), f, indent=2, default=str)

        self.state = create_sharded_state(
            jax.random.PRNGKey(config.seed), config, self.mesh)
        if checkpoint_path or (warm_start_path is None and
                               self.checkpointer.latest()):
            self.state = self.checkpointer.restore(self.state, checkpoint_path)
            if not config.use_saved_learning_rate:
                self.state = self.state._replace(
                    learning_rate=np.float32(config.learning_rate))
            print(f"Resumed from step {int(self.state.step)}")
        elif warm_start_path:
            loaded = self.checkpointer.restore(
                create_train_state(jax.random.PRNGKey(0), config),
                warm_start_path)
            merged = warm_start(jax.device_get(self.state.params),
                                loaded.params, config.ignore_layers)
            self.state = self.state._replace(
                params=shard_tree(merged, self.mesh))
            print(f"Warm-started from {warm_start_path} "
                  f"(ignoring {config.ignore_layers})")

        self.train_step_fn = make_train_step(config, self.mesh, self.state)
        self.eval_step_fn = make_eval_step(config, self.mesh, self.state)

    # ------------------------------------------------------------------

    def fit(self, train_pipeline: DataPipeline,
            val_pipeline: Optional[DataPipeline] = None,
            epochs: Optional[int] = None,
            lr_schedule=None) -> TrainState:
        """lr_schedule: optional step -> lr callable
        (training/schedules.py); None keeps the constant config lr."""
        cfg = self.config
        epochs = epochs if epochs is not None else cfg.epochs
        steps_per_epoch = train_pipeline.steps_per_epoch()
        start_epoch = (int(self.state.step) // max(steps_per_epoch, 1)
                       if steps_per_epoch else 0)
        frames_per_audio_sec = cfg.sampling_rate / cfg.hop_length

        for epoch in range(start_epoch, epochs):
            if jax.process_index() == 0:
                print(f"Epoch {epoch}")
            for batch in prefetch(train_pipeline.epoch(epoch), depth=2):
                t0 = time.perf_counter()
                if lr_schedule is not None:
                    self.set_learning_rate(lr_schedule(int(self.state.step)))
                self.state, metrics = self.train_step_fn(
                    self.state, batch, self.rng)
                loss = float(metrics.loss)
                duration = time.perf_counter() - t0
                step = int(self.state.step)

                finite = np.isfinite(loss)
                if finite and jax.process_index() == 0:
                    mel_frames = int(np.prod(batch.mel.shape[:2]))
                    print(f"Train loss {step} {loss:.6f} Grad Norm "
                          f"{float(metrics.grad_norm):.6f} {duration:.2f}s/it")
                    self.logger.log_training(
                        step, loss, float(metrics.grad_norm),
                        float(self.state.learning_rate), duration,
                        mel_frames=mel_frames,
                        frames_per_audio_sec=frames_per_audio_sec)

                if finite and step % cfg.iters_per_checkpoint == 0:
                    if val_pipeline is not None:
                        self.validate(val_pipeline, step)
                    self.checkpointer.save(self.state)
        self.checkpointer.save(self.state, wait=True)
        return self.state

    def validate(self, val_pipeline: DataPipeline, step: int) -> float:
        total, count = 0.0, 0
        last = None
        for batch in val_pipeline.epoch(0):
            breakdown, output = self.eval_step_fn(self.state, batch)
            total += float(breakdown.total)
            count += 1
            last = (output, batch)
        val_loss = total / max(count, 1)
        if jax.process_index() == 0:
            print(f"Validation loss {step}: {val_loss:9f}")
            output, batch = last if last else (None, None)
            self.logger.log_validation(step, val_loss, output, batch)
            if output is not None:
                from tacotron2_tpu.training.diagnostics import (
                    alignment_diagnostics, gate_accuracy,
                )
                scalars = alignment_diagnostics(
                    np.asarray(output.alignments),
                    np.asarray(batch.text_lengths),
                    np.asarray(batch.mel_lengths))
                scalars.update(gate_accuracy(
                    np.asarray(output.gate_energies),
                    np.asarray(batch.gate_target),
                    np.asarray(batch.mel_lengths)))
                self.logger.write_scalars(step, scalars)
        return val_loss

    def set_learning_rate(self, lr: float) -> None:
        """Live LR injection (reference train.py:210-211)."""
        self.state = self.state._replace(learning_rate=np.float32(lr))
