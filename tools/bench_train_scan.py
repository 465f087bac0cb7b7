"""Measure the Pallas weights-resident training forward scan on the real
chip vs the XLA forward, standalone and inside the full train step.

Usage: python tools/bench_train_scan.py [core|step|all]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "unsafe_rbg")

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models import decoder_vjp, tacotron2
from tacotron2_tpu.parallel import create_mesh, create_sharded_state, \
    make_train_step
from __graft_entry__ import _make_batch

B, T_IN, T_OUT = 128, 128, 512


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(fn, *args, reps=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def cfg_for(pallas: bool):
    return Tacotron2Config(compute_dtype="bfloat16", batch_size=B,
                           decoder_scan_unroll=8, prng_impl="unsafe_rbg",
                           custom_vjp_decoder=True,
                           pallas_train_scan=pallas)


def bench_core(res):
    params, _ = tacotron2.init_params(jax.random.PRNGKey(0), cfg_for(False))
    dp = params["decoder"]
    core = {
        "attention_rnn": dp["attention_rnn"],
        "attention": {k: dp["attention"][k]
                      for k in ("query", "v", "location_conv",
                                "location_dense")},
        "decoder_rnn": dp["decoder_rnn"],
    }
    r = np.random.RandomState(0)
    prenet = jax.device_put(r.randn(T_OUT, B, 256).astype(np.float32) * .2)
    memory = jax.device_put(r.randn(B, T_IN, 512).astype(np.float32) * .2)
    proc = jax.device_put(r.randn(B, T_IN, 128).astype(np.float32) * .2)
    mask = jnp.ones((B, T_IN), bool)
    key = jax.random.PRNGKey(7)

    for pallas in (False, True):
        cfg = cfg_for(pallas)

        @jax.jit
        def fwd(core, prenet, memory, proc):
            return decoder_vjp.core_scan(core, prenet, memory, proc, mask,
                                         key, cfg, True)

        label = "pallas" if pallas else "xla"
        res[f"core_fwd_{label}_ms"] = round(
            timeit(fwd, core, prenet, memory, proc), 1)
        print(json.dumps({f"core_fwd_{label}_ms":
                          res[f"core_fwd_{label}_ms"]}), flush=True)

        @jax.jit
        def fwd_bwd(core, prenet, memory, proc):
            def f(c, p, m, pr):
                h, cx, w = decoder_vjp.core_scan(c, p, m, pr, mask, key,
                                                 cfg, True)
                return (h * 1e-3).sum() + (cx * 1e-3).sum() \
                    + (w * 1e-3).sum()
            return jax.grad(f, argnums=(0, 1, 2, 3))(core, prenet, memory,
                                                     proc)

        res[f"core_fwd_bwd_{label}_ms"] = round(
            timeit(fwd_bwd, core, prenet, memory, proc), 1)
        print(json.dumps({f"core_fwd_bwd_{label}_ms":
                          res[f"core_fwd_bwd_{label}_ms"]}), flush=True)


def bench_step(res):
    for pallas in (False, True):
        cfg = cfg_for(pallas)
        mesh = create_mesh((len(jax.devices()), 1))
        state = create_sharded_state(jax.random.PRNGKey(0), cfg, mesh)
        step = make_train_step(cfg, mesh, state)
        batch = _make_batch(cfg, B=B, T_in=T_IN, T_out=T_OUT)
        rng = jax.random.PRNGKey(1)
        label = "pallas" if pallas else "xla"

        # the train step donates `state` — reassign every call
        def run_steps(state, n):
            for _ in range(n):
                state, metrics = step(state, batch, rng)
            return state, metrics

        state, metrics = run_steps(state, 2)
        sync(metrics.loss)
        t0 = time.perf_counter()
        state, metrics = run_steps(state, 10)
        sync(metrics.loss)
        ms = (time.perf_counter() - t0) / 10 * 1e3
        res[f"step_{label}_ms"] = round(ms, 1)
        res[f"step_{label}_frames_per_s"] = round(B * T_OUT / ms * 1e3)
        print(json.dumps({k: res[k] for k in res if label in k}),
              flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    res = {}
    if which in ("core", "all"):
        bench_core(res)
    if which in ("step", "all"):
        bench_step(res)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
