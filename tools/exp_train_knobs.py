"""One-off train-step knob experiments on the real chip."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.parallel import create_mesh, create_sharded_state, \
    make_train_step
from __graft_entry__ import _make_batch


def run(label: str, B: int = 128, unroll: int = 4, n_steps: int = 10,
        **cfg_kw) -> float:
    cfg = Tacotron2Config(compute_dtype="bfloat16", batch_size=B,
                          decoder_scan_unroll=unroll,
                          prng_impl="unsafe_rbg", **cfg_kw)
    T_in, T_out = 128, 512
    mesh = create_mesh((len(jax.devices()), 1))
    state = create_sharded_state(jax.random.PRNGKey(0), cfg, mesh)
    step = make_train_step(cfg, mesh, state)
    batch = _make_batch(cfg, B=B, T_in=T_in, T_out=T_out)
    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, rng)
    float(metrics.loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch, rng)
    float(metrics.loss)
    dt = time.perf_counter() - t0
    fps = B * T_out * n_steps / dt
    print(f"{label}: B={B} u={unroll}: {dt / n_steps * 1e3:.1f} ms/step, "
          f"{fps:,.0f} frames/s", flush=True)
    return fps


if __name__ == "__main__":
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    run("bf16-ctx-einsum")
    run("bf16-ctx-einsum B=192", B=192)
    run("bf16-ctx-einsum B=160", B=160)
