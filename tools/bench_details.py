"""Extended benchmark: fills the BASELINE.md measurement matrix.

Measures on the available device (the real TPU chip under the driver):
  1. teacher-forced train step throughput (fp32 and bf16), mel-frames/s/chip
  2. autoregressive inference RTF (gate forced to run max_steps — worst
     case) at B=1 and B=8
  3. WaveGlow-style vocoder inference RTF
Writes BENCH_DETAILS.json. NOTE: sync via host transfers (block_until_ready
is unreliable on the tunneled axon platform).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models import tacotron2, waveglow
from tacotron2_tpu.parallel import create_mesh, create_sharded_state, \
    make_train_step
from __graft_entry__ import _make_batch

RESULTS = {}
FRAMES_PER_AUDIO_SEC = 22050 / 256


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(fn, reps: int) -> float:
    """Mean seconds per call, pipelining ``reps`` queued dispatches.

    The tunneled axon platform has a ~28 ms dispatch ROUND-TRIP LATENCY
    that overlaps almost completely across queued calls (measured:
    1 call 28 ms, 50 queued trivial calls 31 ms total). Benching with
    only 3-5 reps therefore inflated every per-call number by several
    ms — reps must be high enough that total device time >> one RTT.
    """
    out = fn()                      # warmup / compile
    sync(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / reps


def bench_train(compute_dtype: str, B=32, T_in=128, T_out=512, n_steps=10):
    cfg = Tacotron2Config(compute_dtype=compute_dtype, batch_size=B)
    mesh = create_mesh((1, 1), jax.devices()[:1])
    state = create_sharded_state(jax.random.PRNGKey(0), cfg, mesh)
    step = make_train_step(cfg, mesh, state)
    batch = _make_batch(cfg, B=B, T_in=T_in, T_out=T_out)
    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, rng)
    sync(metrics.loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch, rng)
    sync(metrics.loss)
    dt = time.perf_counter() - t0
    fps = B * T_out * n_steps / dt
    RESULTS[f"train_{compute_dtype}_mel_frames_per_s"] = round(fps, 1)
    RESULTS[f"train_{compute_dtype}_audio_sec_per_s"] = round(
        fps / FRAMES_PER_AUDIO_SEC, 1)
    RESULTS[f"train_{compute_dtype}_step_ms"] = round(dt / n_steps * 1e3, 1)
    print(f"train[{compute_dtype}] {fps:,.0f} mel-frames/s "
          f"({dt / n_steps * 1e3:.1f} ms/step)", flush=True)


def bench_infer(B, T_in=128, steps=400, quantized=False):
    # gate_threshold > 1 -> never stops early: measures the full decode
    cfg = Tacotron2Config(prenet_dropout_at_inference=False,
                          gate_threshold=1.5, max_decoder_steps=steps)
    params, stats = tacotron2.init_params(jax.random.PRNGKey(0), cfg)
    if quantized:
        params = tacotron2.quantize_for_serving(params)

    def run(text, lengths):
        r = tacotron2.infer(params, stats, text, lengths, cfg,
                            compute_dtype=jnp.bfloat16)
        return r.mel_postnet, r.mel_lengths

    run_j = jax.jit(run)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 148, (B, T_in)).astype(np.int32))
    lengths = jnp.full((B,), T_in, jnp.int32)
    dt = timeit(lambda: run_j(text, lengths)[0], reps=30)
    audio_sec = B * steps / FRAMES_PER_AUDIO_SEC
    rtf = dt / audio_sec
    tag = f"infer_b{B}" + ("_int8" if quantized else "")
    RESULTS[f"{tag}_rtf"] = round(rtf, 5)
    RESULTS[f"{tag}_frames_per_s"] = round(B * steps / dt, 1)
    RESULTS[f"{tag}_ms_per_frame"] = round(dt / steps * 1e3, 3)
    print(f"infer[B={B}{' int8' if quantized else ''}] RTF {rtf:.5f} "
          f"({B * steps / dt:,.0f} frames/s, "
          f"{dt / steps * 1e3:.3f} ms/frame-step)", flush=True)


def bench_infer_fused(T_in=128, steps=448, chunk=64):
    """B=1 decode through the fused Pallas decoder chunk kernel
    (kernels/decoder_step.py): weights VMEM-resident, whole chunk one
    kernel. The chunk loop must be jitted as ONE function — eager wrapper
    ops between chunks each cost a tunnel dispatch."""
    from tacotron2_tpu.kernels import decoder_step as ds
    from tacotron2_tpu.ops.layers import dense, length_mask

    cfg = Tacotron2Config(prenet_dropout_at_inference=False,
                          gate_threshold=1.5, max_decoder_steps=steps)
    params, stats = tacotron2.init_params(jax.random.PRNGKey(0), cfg)
    fp = ds.pack_decoder_params(params, cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 148, (1, T_in)).astype(np.int32))
    lengths = jnp.asarray([T_in], jnp.int32)
    memory, _ = tacotron2.encode(params, stats, text, lengths, cfg,
                                 training=False,
                                 compute_dtype=jnp.bfloat16)
    processed = dense(params["decoder"]["attention"]["memory"], memory,
                      compute_dtype=jnp.bfloat16)
    mask = length_mask(lengths, memory.shape[1])

    @jax.jit
    def run_all(fp, memory, processed, mask):
        carry = tacotron2.init_stream_carry(memory, cfg)
        mels = []
        for _ in range(steps // chunk):
            carry, (mel, _, _) = ds.decode_chunk_fused(
                fp, carry, memory, processed, mask, cfg, chunk_steps=chunk,
                dtype=jnp.bfloat16)
            mels.append(mel)
        return jnp.concatenate(mels, axis=1)

    dt = timeit(lambda: run_all(fp, memory, processed, mask), reps=30)
    audio_sec = steps / FRAMES_PER_AUDIO_SEC
    rtf = dt / audio_sec
    RESULTS["infer_b1_fused_rtf"] = round(rtf, 5)
    RESULTS["infer_b1_fused_frames_per_s"] = round(steps / dt, 1)
    RESULTS["infer_b1_fused_us_per_frame"] = round(dt / steps * 1e6, 2)
    print(f"infer[B=1 fused] RTF {rtf:.5f} ({steps / dt:,.0f} frames/s, "
          f"{dt / steps * 1e6:.1f} us/frame)", flush=True)


def bench_fused_vs_xla_b8():
    """Explicit serving-tradeoff row (VERDICT r1 #9): 8 concurrent
    utterances served either as ONE XLA B=8 batch (throughput-optimal —
    the batch amortizes the ~36 MB/step decoder weight stream) or as 8
    sequential fused-B=1 Pallas decodes (latency-optimal per stream —
    zero per-step weight traffic, but the VMEM-resident kernel serves one
    row at a time). Records both plus the ratio, so the choice of serving
    mode is a measured row: use the fused kernel for single-stream
    latency, the XLA batch for aggregate throughput at B>=8."""
    bench_infer(B=8)
    bench_infer_fused()
    b8 = RESULTS["infer_b8_frames_per_s"]          # 8 rows in parallel
    fused1 = RESULTS["infer_b1_fused_frames_per_s"]  # one row at a time
    RESULTS["b8_xla_vs_fused_seq_throughput"] = round(b8 / fused1, 2)
    RESULTS["b8_fused_vs_xla_latency"] = round(
        RESULTS["infer_b8_rtf"] * 8 / RESULTS["infer_b1_fused_rtf"], 2)
    print(f"fused_vs_xla_b8: XLA B=8 {b8:,.0f} frames/s total vs fused "
          f"B=1 {fused1:,.0f} frames/s/stream -> XLA batch serves "
          f"{b8 / fused1:.2f}x the aggregate throughput; fused B=1 is "
          f"{RESULTS['b8_fused_vs_xla_latency']:.2f}x lower per-utterance "
          f"latency", flush=True)


def bench_vocoder(B=1, T_mel=400):
    cfg = waveglow.WaveGlowConfig()
    params = waveglow.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.RandomState(0).randn(
        B, T_mel, cfg.n_mel_channels).astype(np.float32))
    # params must be a jit ARGUMENT: closures embed them as literals in the
    # program, blowing past the remote-compile request size limit
    run = jax.jit(lambda p, m: waveglow.infer(p, m, cfg, sigma=0.666,
                                              key=jax.random.PRNGKey(1)))
    dt = timeit(lambda: run(params, mel), reps=15)
    audio_sec = B * T_mel / FRAMES_PER_AUDIO_SEC
    RESULTS[f"vocoder_b{B}_rtf"] = round(dt / audio_sec, 4)
    RESULTS[f"vocoder_b{B}_audio_sec_per_s"] = round(audio_sec / dt, 1)
    print(f"vocoder[B={B}] RTF {dt / audio_sec:.4f} "
          f"({audio_sec / dt:,.1f} audio-sec/s)", flush=True)


def bench_hifigan(B=1, T_mel=400, compute_dtype="bfloat16"):
    from tacotron2_tpu.models import hifigan
    cfg = hifigan.HiFiGANConfig()
    params = hifigan.init_generator(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.RandomState(0).randn(
        B, T_mel, cfg.n_mel_channels).astype(np.float32))
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    run = jax.jit(lambda p, m: hifigan.generator(p, m, cfg,
                                                 compute_dtype=dtype))
    dt = timeit(lambda: run(params, mel), reps=40)
    audio_sec = B * T_mel / FRAMES_PER_AUDIO_SEC
    RESULTS[f"hifigan_b{B}_rtf"] = round(dt / audio_sec, 5)
    RESULTS[f"hifigan_b{B}_audio_sec_per_s"] = round(audio_sec / dt, 1)
    print(f"hifigan[B={B}] RTF {dt / audio_sec:.5f} "
          f"({audio_sec / dt:,.1f} audio-sec/s)", flush=True)


def _save():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAILS.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(RESULTS)
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)


if __name__ == "__main__":
    import argparse
    parser = argparse.ArgumentParser()
    known = {"train_bf16", "train_fp32", "infer1", "infer8", "infer1_int8",
             "infer8_int8", "infer1_fused", "fused_vs_xla_b8", "vocoder",
             "hifigan"}
    parser.add_argument("stages", nargs="*", default=[],
                        help=f"subset of: {' '.join(sorted(known))} "
                             "(default: all)")
    args = parser.parse_args()
    unknown = set(args.stages) - known
    if unknown:
        parser.error(f"unknown stages: {sorted(unknown)}")
    stages = set(args.stages) or known
    print("devices:", jax.devices(), flush=True)
    if "train_bf16" in stages:
        bench_train("bfloat16"); _save()
    if "train_fp32" in stages:
        bench_train("float32"); _save()
    if "infer1" in stages:
        bench_infer(B=1); _save()
    if "infer8" in stages:
        bench_infer(B=8); _save()
    if "infer1_int8" in stages:
        bench_infer(B=1, quantized=True); _save()
    if "infer8_int8" in stages:
        bench_infer(B=8, quantized=True); _save()
    if "infer1_fused" in stages:
        bench_infer_fused(); _save()
    if "fused_vs_xla_b8" in stages:
        bench_fused_vs_xla_b8(); _save()
    if "vocoder" in stages:
        bench_vocoder(B=1, T_mel=400); _save()
        bench_vocoder(B=8, T_mel=400); _save()
    if "hifigan" in stages:
        bench_hifigan(B=1, T_mel=400); _save()
        bench_hifigan(B=8, T_mel=400); _save()
    print(json.dumps(RESULTS, indent=2))
