"""Observability tests: metric logger scalars/JSONL and plot rendering."""

import json
import os

import numpy as np

from tacotron2_tpu.training.logging import (
    MetricLogger, plot_alignment, plot_gate, plot_mel,
)


class TestPlots:
    def test_alignment_image(self):
        img = plot_alignment(np.random.RandomState(0).rand(50, 20))
        assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8

    def test_mel_image(self):
        img = plot_mel(np.random.RandomState(0).randn(40, 80))
        assert img.ndim == 3 and img.shape[2] == 3

    def test_gate_image(self):
        t = np.linspace(0, 1, 30)
        img = plot_gate((t > 0.7).astype(np.float32), t)
        assert img.ndim == 3


class TestMetricLogger:
    def test_scalars_and_jsonl(self, tmp_path):
        logger = MetricLogger(str(tmp_path), enabled=True)
        logger.log_training(step=1, loss=2.5, grad_norm=1.0,
                            learning_rate=1e-3, duration=0.1,
                            mel_frames=4096)
        logger.log_validation(step=1, loss=3.0)
        logger.close()
        lines = [json.loads(l) for l in
                 open(os.path.join(tmp_path, "metrics.jsonl"))]
        assert lines[0]["training/loss"] == 2.5
        assert "throughput/audio_sec_per_s" in lines[0]
        assert lines[1]["validation/loss"] == 3.0

    def test_disabled_writes_nothing(self, tmp_path):
        logger = MetricLogger(str(tmp_path / "x"), enabled=False)
        logger.log_training(1, 1.0, 1.0, 1e-3, 0.1)
        logger.close()
        assert not os.path.exists(tmp_path / "x" / "metrics.jsonl")

    def test_validation_images(self, tmp_path):
        """Full validation logging path with images (output + batch)."""
        import jax.numpy as jnp
        from tacotron2_tpu.models.tacotron2 import ForwardOutput
        from tacotron2_tpu.training.state import Batch
        B, T, M, T_in = 2, 12, 8, 6
        rng = np.random.RandomState(0)
        output = ForwardOutput(
            jnp.asarray(rng.randn(B, T, M), jnp.float32),
            jnp.asarray(rng.randn(B, T, M), jnp.float32),
            jnp.asarray(rng.randn(B, T), jnp.float32),
            jnp.asarray(rng.rand(B, T, T_in), jnp.float32))
        batch = Batch(jnp.zeros((B, T_in), jnp.int32),
                      jnp.full((B,), T_in, jnp.int32),
                      jnp.asarray(rng.randn(B, T, M), jnp.float32),
                      jnp.zeros((B, T), jnp.float32),
                      jnp.full((B,), T, jnp.int32))
        logger = MetricLogger(str(tmp_path), enabled=True)
        logger.log_validation(5, 1.23, output, batch)
        logger.log_param_histograms(5, {"w": np.ones(4)})
        logger.close()
        # TB event files written
        assert any(f.startswith("events") for f in os.listdir(tmp_path))
