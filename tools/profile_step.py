"""Coarse breakdown of the headline train step on the real chip.

Times, with everything jitted and queued past the tunnel RTT
(PERFORMANCE.md measurement protocol):
  1. full train step (fwd+bwd+Adam)            -> step_full
  2. loss value only (no grad)                 -> fwd_total
  3. decoder core_scan forward alone           -> core_fwd
  4. core_scan forward+backward (jax.vjp)      -> core_fwd_bwd
  5. the hoisted dW einsums, standalone        -> hoisted
Derived: bwd_chain ~= core_fwd_bwd - core_fwd - hoisted;
         non-decoder ~= step_full - core_fwd_bwd.

Usage: python tools/profile_step.py
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
from tacotron2_tpu.models import tacotron2 as model
from tacotron2_tpu.models import decoder_vjp
from tacotron2_tpu.parallel import create_mesh, create_sharded_state, \
    make_train_step
from tacotron2_tpu.training.loss import tacotron2_loss
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
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    pallas = "pallas" in sys.argv[1:]
    cfg = Tacotron2Config(compute_dtype="bfloat16", batch_size=B,
                          decoder_scan_unroll=8, prng_impl="unsafe_rbg",
                          custom_vjp_decoder=True,
                          pallas_train_scan=pallas)
    print(json.dumps({"pallas_train_scan": pallas}), flush=True)
    cdt = cfg.jax_compute_dtype
    mesh = create_mesh((len(jax.devices()), 1))
    state = create_sharded_state(jax.random.PRNGKey(0), cfg, mesh)
    step = make_train_step(cfg, mesh, state)
    batch = _make_batch(cfg, B=B, T_in=T_IN, T_out=T_OUT)
    rng = jax.random.PRNGKey(1)
    res = {}

    # NOTE: the train step donates `state` (parallel/step.py) — it must be
    # reassigned every call, so it gets its own timing loop.
    def run_steps(state, n):
        for _ in range(n):
            state, metrics = step(state, batch, rng)
        return state, metrics

    state, metrics = run_steps(state, 2)
    sync(metrics.loss)
    t0 = time.perf_counter()
    state, metrics = run_steps(state, 10)
    sync(metrics.loss)
    res["step_full_ms"] = (time.perf_counter() - t0) / 10 * 1e3
    print(json.dumps({"step_full_ms": round(res["step_full_ms"], 1)}), flush=True)

    params = jax.device_get(state.params)
    stats = jax.device_get(state.stats)
    params = jax.device_put(params)
    stats = jax.device_put(stats)

    @jax.jit
    def fwd_loss(params, stats):
        out, new_stats = model.forward(
            params, stats, batch.text, batch.text_lengths, batch.mel,
            batch.mel_lengths, cfg, training=True, rng=rng)
        return tacotron2_loss(out, batch.mel, batch.gate_target).total

    res["fwd_total_ms"] = timeit(fwd_loss, params, stats, reps=10)
    print(json.dumps({"fwd_total_ms": round(res["fwd_total_ms"], 1)}), flush=True)

    # --- decoder core_scan in isolation ------------------------------
    dp = params["decoder"]
    core_params = {
        "attention_rnn": dp["attention_rnn"],
        "attention": {k: dp["attention"][k]
                      for k in ("query", "v", "location_conv",
                                "location_dense")},
        "decoder_rnn": dp["decoder_rnn"],
    }
    key = jax.random.PRNGKey(7)
    prenet_steps = jax.device_put(np.random.RandomState(0).randn(
        T_OUT, B, cfg.prenet_dim).astype(np.float32) * 0.1)
    memory = jax.device_put(np.random.RandomState(1).randn(
        B, T_IN, cfg.encoder_embedding_dim).astype(np.float32) * 0.1)
    processed = jax.device_put(np.random.RandomState(2).randn(
        B, T_IN, cfg.attention_dim).astype(np.float32) * 0.1)
    mask = jnp.ones((B, T_IN), bool)

    @jax.jit
    def core_fwd(core_params, prenet_steps, memory, processed):
        h, c, w = decoder_vjp.core_scan(core_params, prenet_steps, memory,
                                        processed, mask, key, cfg, True)
        # scalarize: a (T,B,D) stack is ~134 MB — transferring it through
        # the tunnel would dwarf the device time being measured
        return h.sum() + c.sum() + w.sum()

    res["core_fwd_ms"] = timeit(core_fwd, core_params, prenet_steps,
                                memory, processed, reps=10)
    print(json.dumps({"core_fwd_ms": round(res["core_fwd_ms"], 1)}), flush=True)

    @jax.jit
    def core_fwd_bwd(core_params, prenet_steps, memory, processed):
        def f(cp, ps, mem, proc):
            h, c, w = decoder_vjp.core_scan(cp, ps, mem, proc, mask, key,
                                            cfg, True)
            return (h * 1e-3).sum() + (c * 1e-3).sum() + (w * 1e-3).sum()
        g = jax.grad(f, argnums=(0, 1, 2, 3))(
            core_params, prenet_steps, memory, processed)
        return sum(x.sum() for x in jax.tree.leaves(g))  # scalarize

    res["core_fwd_bwd_ms"] = timeit(core_fwd_bwd, core_params,
                                    prenet_steps, memory, processed,
                                    reps=10)
    print(json.dumps({"core_fwd_bwd_ms": round(res["core_fwd_bwd_ms"], 1)}), flush=True)

    # --- hoisted einsums standalone ----------------------------------
    A, D = cfg.attention_rnn_dim, cfg.decoder_rnn_dim
    E, P = cfg.encoder_embedding_dim, cfg.prenet_dim
    r0 = np.random.RandomState(3)
    mk = lambda *s: jax.device_put(r0.randn(*s).astype(np.float32) * .01
                                   ).astype(cdt)
    dga = mk(T_OUT, B, 4 * A)
    dgd = mk(T_OUT, B, 4 * D)
    xa = mk(T_OUT, B, P + E)
    xd = mk(T_OUT, B, A + E)
    ha = mk(T_OUT, B, A)
    hd = mk(T_OUT, B, D)
    wstack = mk(T_OUT, B, T_IN)
    dctx = mk(T_OUT, B, E)

    @jax.jit
    def hoisted(dga, dgd, xa, xd, ha, hd, wstack, dctx):
        f32 = jnp.float32
        outs = [
            jnp.einsum("tbi,tbg->ig", xa, dga, preferred_element_type=f32),
            jnp.einsum("tbh,tbg->hg", ha, dga, preferred_element_type=f32),
            jnp.einsum("tbi,tbg->ig", xd, dgd, preferred_element_type=f32),
            jnp.einsum("tbh,tbg->hg", hd, dgd, preferred_element_type=f32),
            jnp.einsum("tbi,tbe->bie", wstack, dctx,
                       preferred_element_type=f32),
            jnp.sum(dga.astype(f32), axis=(0, 1)),
            jnp.sum(dgd.astype(f32), axis=(0, 1)),
        ]
        return outs[0][0, 0] + outs[1][0, 0] + outs[2][0, 0] \
            + outs[3][0, 0] + outs[4][0, 0, 0] + outs[5][0] + outs[6][0]

    res["hoisted_ms"] = timeit(hoisted, dga, dgd, xa, xd, ha, hd, wstack,
                               dctx, reps=10)

    res["derived_bwd_chain_ms"] = round(
        res["core_fwd_bwd_ms"] - res["core_fwd_ms"] - res["hoisted_ms"], 1)
    res["derived_non_decoder_ms"] = round(
        res["step_full_ms"] - res["core_fwd_bwd_ms"], 1)
    for k in list(res):
        res[k] = round(res[k], 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
