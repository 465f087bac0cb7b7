"""Blended-bucket training throughput on the real chip.

One train-step shape per text bucket (T_out = 4*T_in), blended by the
REAL LJSpeech text-length distribution (computed from the reference
train filelist: 17.1% <=64, 60.2% <=128, 22.8% <=192 chars). Writes the
row recorded as BENCH_DETAILS.json:round3_blended_bucket_throughput.

Usage: python tools/bench_buckets.py
"""

import sys; sys.path.insert(0, ".")
import time, json, numpy as np, jax
jax.config.update("jax_default_prng_impl", "unsafe_rbg")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.parallel import create_mesh, create_sharded_state, make_train_step
from __graft_entry__ import _make_batch

B = 128
cfg = Tacotron2Config(batch_size=B, decoder_scan_unroll=8,
                      prng_impl="unsafe_rbg")
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
    rows[t_in] = {"t_out": t_out, "ms_per_step": round(dt*1e3, 1),
                  "frames_per_s": round(B*t_out/dt)}
    print(t_in, rows[t_in], flush=True)

# blended over the real LJSpeech text-length distribution
p = {64: 0.171, 128: 0.602, 192: 0.228}
tot_frames = sum(p[t]*128*rows[t]["t_out"] for t in p)
tot_time = sum(p[t]*rows[t]["ms_per_step"]/1e3 for t in p)
blended = tot_frames / tot_time
print(json.dumps({"blended_frames_per_s": round(blended), "rows": rows}))
