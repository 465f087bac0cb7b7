"""Headline benchmark: teacher-forced training throughput on one chip.

Prints ONE JSON line:
  {"metric": "train_mel_frames_per_s_per_chip", "value": N,
   "unit": "mel-frames/s/chip", "vs_baseline": R}

``vs_baseline`` is the real-time factor: mel-frames/s divided by 86.13
(mel frames per second of audio at sr=22050, hop=256 — the reference's
audio configuration, /root/reference/hparams.py:36-38). The reference
publishes no quantitative throughput numbers (see BASELINE.md), so
real-time audio rate is the stable baseline unit: vs_baseline = how many
seconds of speech the trainer consumes per wall-clock second per chip.

Runs on whatever jax.devices() provides (the real TPU under the driver).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    from tacotron2_tpu.config import Tacotron2Config
    from tacotron2_tpu.parallel import create_mesh, create_sharded_state, \
        make_train_step
    from __graft_entry__ import _make_batch

    # Tuned by the round-1 sweep (PERFORMANCE.md): B>=128 fills the
    # 128-row MXU, hardware RNG for dropout keys is +16%. Round-2: bf16
    # context einsum (+2.8%) and the custom-VJP decoder scan
    # (models/decoder_vjp.py, +25%: backward computes only the sequential
    # data-gradient chain; LSTM weight gradients are hoisted into single
    # large matmuls, cuDNN-RNN style). unroll=8 is optimal under the
    # leaner custom backward (u4 under plain autodiff). Round-2b: the
    # weights-resident Pallas forward AND backward scans
    # (kernels/train_scan.py) keep all decoder weights VMEM-resident
    # across the 512 sequential steps in each direction (+12% step-level
    # over the XLA scans, 506.7k frames/s — PERFORMANCE.md).
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    # Persistent compile cache: reuses an in-round warm compile if one
    # exists, and shields the measurement from remote-compile latency
    # (and from the wedge failure mode noted in PERFORMANCE.md).
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass
    cfg = Tacotron2Config(compute_dtype="bfloat16", batch_size=128,
                          decoder_scan_unroll=8, prng_impl="unsafe_rbg",
                          custom_vjp_decoder=True, pallas_train_scan=True,
                          pallas_train_scan_bwd=True)
    B, T_in, T_out = cfg.batch_size, 128, 512

    n_dev = len(jax.devices())
    mesh = create_mesh((n_dev, 1))
    state = create_sharded_state(jax.random.PRNGKey(0), cfg, mesh)
    step = make_train_step(cfg, mesh, state)
    batch = _make_batch(cfg, B=B, T_in=T_in, T_out=T_out)
    rng = jax.random.PRNGKey(1)

    # warmup / compile. NOTE: sync via host transfer of the loss —
    # block_until_ready alone does not reliably block on the tunneled
    # axon platform.
    state, metrics = step(state, batch, rng)
    float(metrics.loss)

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch, rng)
    float(metrics.loss)  # the final loss depends on every previous step
    dt = time.perf_counter() - t0

    frames_per_s = B * T_out * n_steps / dt / n_dev
    mel_frames_per_audio_sec = cfg.sampling_rate / cfg.hop_length  # 86.13
    print(json.dumps({
        "metric": "train_mel_frames_per_s_per_chip",
        "value": round(frames_per_s, 2),
        "unit": "mel-frames/s/chip",
        "vs_baseline": round(frames_per_s / mel_frames_per_audio_sec, 2),
    }))


if __name__ == "__main__":
    main()
