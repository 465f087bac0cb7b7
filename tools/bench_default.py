"""Shipped-default-config training throughput on the real chip.

Measures what ``python -m tacotron2_tpu.train`` with the STOCK config
actually delivers (VERDICT r4 #4): batch_size=64, prng_impl=threefry,
bf16, kernels at their config.py defaults — no bench-recipe knobs
(bench.py's batch_size=128 + unsafe_rbg are documented opt-in
semantics-changing knobs, README.md). Reports the headline shape
(T_in=128, T_out=512) and the LJSpeech-distribution blend over the
three text buckets, same method as tools/bench_buckets.py.

Usage: python tools/bench_default.py
"""

import sys; sys.path.insert(0, ".")
import time, json, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.parallel import create_mesh, create_sharded_state, \
    make_train_step
from __graft_entry__ import _make_batch

cfg = Tacotron2Config()  # the stock config, no overrides
B = cfg.batch_size
assert B == 64 and cfg.prng_impl == "threefry"
mesh = create_mesh((1, 1))
state = create_sharded_state(jax.random.PRNGKey(0), cfg, mesh)
step = make_train_step(cfg, mesh, state)
rng = jax.random.PRNGKey(1)
rows = {}
for t_in, t_out in ((64, 256), (128, 512), (192, 768)):
    batch = _make_batch(cfg, B=B, T_in=t_in, T_out=t_out)
    state, m = step(state, batch, rng); float(m.loss)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch, rng)
    float(m.loss)
    dt = (time.perf_counter() - t0) / n
    rows[t_in] = {"t_out": t_out, "ms_per_step": round(dt * 1e3, 1),
                  "frames_per_s": round(B * t_out / dt)}
    print(t_in, rows[t_in], flush=True)

# blended over the real LJSpeech text-length distribution
p = {64: 0.171, 128: 0.602, 192: 0.228}
tot_frames = sum(p[t] * B * rows[t]["t_out"] for t in p)
tot_time = sum(p[t] * rows[t]["ms_per_step"] / 1e3 for t in p)
print(json.dumps({"default_headline_frames_per_s":
                  rows[128]["frames_per_s"],
                  "default_blended_frames_per_s":
                  round(tot_frames / tot_time),
                  "rows": rows}))
