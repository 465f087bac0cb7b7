"""Measure decoder_interleave on the real chip: the round-2 MFU prototype.

Sweeps interleave x unroll x batch on the headline training configuration
(bf16, custom-VJP decoder scan) and prints one JSON line per variant plus
a summary. The hypothesis (config.py:decoder_interleave): a single chain's
per-step critical path leaves the MXU idle during the LSTM activations /
attention softmax; N independent sub-batch chains give the scheduler
matmuls to fill those gaps. Numerics are bitwise-identical to N=1
(tests/test_decoder_vjp.py::test_interleave_*), so any win is free.

Usage: python tools/bench_interleave.py [quick]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax

sys.path.insert(0, ".")


def bench_variant(B, T_in, T_out, unroll, interleave, n_steps=10,
                  warmup=2):
    from tacotron2_tpu.config import Tacotron2Config
    from tacotron2_tpu.parallel import create_mesh, create_sharded_state, \
        make_train_step
    from __graft_entry__ import _make_batch

    cfg = Tacotron2Config(compute_dtype="bfloat16", batch_size=B,
                          decoder_scan_unroll=unroll,
                          prng_impl="unsafe_rbg",
                          custom_vjp_decoder=True,
                          decoder_interleave=interleave)
    mesh = create_mesh((len(jax.devices()), 1))
    state = create_sharded_state(jax.random.PRNGKey(0), cfg, mesh)
    step = make_train_step(cfg, mesh, state)
    batch = _make_batch(cfg, B=B, T_in=T_in, T_out=T_out)
    rng = jax.random.PRNGKey(1)

    for _ in range(warmup):
        state, metrics = step(state, batch, rng)
    float(metrics.loss)  # sync (host transfer; block_until_ready is
    # unreliable on the tunneled axon platform)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch, rng)
    float(metrics.loss)
    dt = time.perf_counter() - t0
    frames_per_s = B * T_out * n_steps / dt
    return {"B": B, "T_in": T_in, "T_out": T_out, "unroll": unroll,
            "interleave": interleave,
            "ms_per_step": round(dt / n_steps * 1e3, 1),
            "frames_per_s": round(frames_per_s, 0)}


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    variants = [
        # (B, unroll, interleave) — baseline first (r1 headline config)
        (128, 8, 1),
        (128, 8, 2),
        (128, 4, 2),
        (128, 8, 4),
        (256, 4, 2),
        (256, 8, 2),
        (128, 4, 4),
        (256, 4, 4),
    ]
    if quick:
        variants = variants[:3]
    results = []
    for B, u, il in variants:
        try:
            r = bench_variant(B, 128, 512, u, il)
        except Exception as e:  # OOM etc. — record and continue
            r = {"B": B, "unroll": u, "interleave": il,
                 "error": repr(e)[:200]}
        print(json.dumps(r), flush=True)
        results.append(r)
    ok = [r for r in results if "frames_per_s" in r]
    if ok:
        best = max(ok, key=lambda r: r["frames_per_s"])
        base = next((r for r in ok if r["interleave"] == 1), None)
        summary = {"best": best}
        if base:
            summary["speedup_vs_il1"] = round(
                best["frames_per_s"] / base["frames_per_s"], 3)
        print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
