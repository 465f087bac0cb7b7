"""Training driver: the reference ``train()`` loop, TPU-native.

Mirrors /root/reference/train.py:149-255 feature-for-feature — epoch loop,
per-iteration logging, periodic validation + checkpoint, resume/warm-start,
live learning-rate injection, non-finite-loss step skipping (the bf16-world
analog of the fp16 overflow skip, train.py:228-249) — but with: one jitted
sharded train step (per bucket shape), host prefetch, async checkpoints.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import numpy as np

import jax

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data import DataPipeline, prefetch
from tacotron2_tpu.parallel import (
    batch_sharding, create_mesh, create_sharded_state,
    initialize_distributed, make_eval_step, make_train_step, shard_tree,
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
        step = int(self.state.step)  # host-side mirror of the step counter
        start_epoch = (step // max(steps_per_epoch, 1)
                       if steps_per_epoch else 0)
        frames_per_audio_sec = cfg.sampling_rate / cfg.hop_length

        # H2D transfer of batch N+1 runs in the prefetch thread while the
        # device executes batch N (reference's non_blocking to_gpu,
        # utils.py:24-29, moved one batch ahead).
        transfer = functools.partial(jax.device_put,
                                     device=batch_sharding(self.mesh))
        for epoch in range(start_epoch, epochs):
            if jax.process_index() == 0:
                print(f"Epoch {epoch}")
            interval_t0 = time.perf_counter()
            interval_steps = interval_frames = 0
            for batch in prefetch(train_pipeline.epoch(epoch), depth=2,
                                  transfer=transfer):
                if lr_schedule is not None:
                    self.set_learning_rate(lr_schedule(step))
                # The step's metrics stay on-device: non-finite updates are
                # skipped inside the jitted step (guarded_update), so the
                # host never has to pull the loss to decide anything and
                # only syncs at the logging cadence — the device and the
                # prefetcher run ahead in between (the reference stalls on
                # loss.item() every iteration, train.py:219).
                self.state, metrics = self.train_step_fn(
                    self.state, batch, self.rng)
                step += 1
                interval_steps += 1
                interval_frames += int(np.prod(batch.mel.shape[:2]))

                at_ckpt = step % cfg.iters_per_checkpoint == 0
                if at_ckpt or step % cfg.log_interval == 0:
                    loss = float(metrics.loss)  # host sync point
                    duration = ((time.perf_counter() - interval_t0)
                                / interval_steps)
                    if jax.process_index() == 0:
                        skipped = "" if float(metrics.applied) else " SKIPPED"
                        print(f"Train loss {step} {loss:.6f} Grad Norm "
                              f"{float(metrics.grad_norm):.6f} "
                              f"{duration:.2f}s/it{skipped}")
                        self.logger.log_training(
                            step, loss, float(metrics.grad_norm),
                            float(self.state.learning_rate), duration,
                            mel_frames=interval_frames // interval_steps,
                            frames_per_audio_sec=frames_per_audio_sec)
                    interval_t0 = time.perf_counter()
                    interval_steps = interval_frames = 0
                if at_ckpt:
                    if val_pipeline is not None:
                        self.validate(val_pipeline, step)
                    self.checkpointer.save(self.state)
        self.checkpointer.save(self.state, wait=True)
        return self.state

    def validate(self, val_pipeline: DataPipeline, step: int) -> float:
        """Exact validation mean (reference train.py:121-146): each batch's
        loss is already weighted over its real rows (cycled padding rows
        masked out); batches are combined weighted by real-row count, so the
        result is invariant to how the val set is partitioned into batches.
        """
        cfg = self.config
        eval_rng = (jax.random.fold_in(jax.random.PRNGKey(cfg.seed), step)
                    if cfg.eval_prenet_dropout else None)
        total, weight = 0.0, 0.0
        last = None
        for i, batch in enumerate(val_pipeline.epoch(0)):
            rng = (jax.random.fold_in(eval_rng, i)
                   if eval_rng is not None else None)
            breakdown, output = self.eval_step_fn(self.state, batch, rng)
            n_valid = (float(np.sum(batch.row_valid))
                       if batch.row_valid is not None
                       else float(batch.text.shape[0]))
            total += float(breakdown.total) * n_valid
            weight += n_valid
            last = (output, batch)
        val_loss = total / max(weight, 1.0)
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
