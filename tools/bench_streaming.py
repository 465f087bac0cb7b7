"""First-chunk latency of the streaming synthesis paths (real chip).

Measures, at the production config (random weights — latency depends on
shapes, not values; the gate never fires so every path runs to the step
cap, the worst case):

  - B=1 fused streaming, prenet dropout ACTIVE (reference model.py:99)
  - B=1 XLA streaming (same semantics)
  - B=8 batched-kernel stream_batch (per-session lockstep)

Reports time-to-first-mel-event and time-to-first-audio-event (with a
HiFi-GAN V1 generator), excluding compile (one throwaway stream first).

Usage: python tools/bench_streaming.py [--max-steps 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models import hifigan
from tacotron2_tpu.models import tacotron2 as m
from tacotron2_tpu.streaming import StreamingSynthesizer

TEXT = "the quick brown fox jumps over the lazy dog"


def first_event_latencies(run_stream):
    """(ms to first mel event, ms to first audio event, total ms)."""
    t0 = time.perf_counter()
    t_mel = t_audio = None
    for ev in run_stream():
        if ev.mel is not None and t_mel is None:
            np.asarray(ev.mel)
            t_mel = time.perf_counter() - t0
        if ev.audio is not None and t_audio is None:
            np.asarray(ev.audio)
            t_audio = time.perf_counter() - t0
    total = time.perf_counter() - t0
    return tuple(None if t is None else round(t * 1e3, 1)
                 for t in (t_mel, t_audio, total))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steps", type=int, default=64)
    ap.add_argument("--chunk-steps", type=int, default=32)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass
    cfg = Tacotron2Config(compute_dtype="bfloat16",
                          max_decoder_steps=args.max_steps)
    params, stats = m.init_params(jax.random.PRNGKey(0), cfg)
    gp = hifigan.init_generator(jax.random.PRNGKey(1),
                                hifigan.HiFiGANConfig())
    rng = jax.random.PRNGKey(7)
    out = {"max_steps": args.max_steps, "chunk_steps": args.chunk_steps}

    def bench(name, synth, call):
        for _ in call():  # compile pass
            pass
        t_mel, t_audio, total = first_event_latencies(call)
        out[name] = {"first_mel_ms": t_mel, "first_audio_ms": t_audio,
                     "total_ms": total}
        print(json.dumps({name: out[name]}), flush=True)

    s_fused = StreamingSynthesizer(
        params, stats, cfg, vocoder_params=gp, deterministic=False,
        chunk_steps=args.chunk_steps)
    assert s_fused._fused
    bench("b1_fused_dropout", s_fused,
          lambda: s_fused.stream(TEXT, rng=rng))

    s_xla = StreamingSynthesizer(
        params, stats, cfg, vocoder_params=gp, deterministic=False,
        chunk_steps=args.chunk_steps, fused=False)
    bench("b1_xla_dropout", s_xla, lambda: s_xla.stream(TEXT, rng=rng))

    texts8 = [TEXT] * 8
    bench("b8_batched_kernel_dropout", s_fused,
          lambda: (ev for _, ev in s_fused.stream_batch(texts8, rng=rng)))
    assert s_fused._packed_batch is not None  # kernel path engaged

    print(json.dumps(out))


if __name__ == "__main__":
    main()
