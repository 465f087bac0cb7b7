"""On-hardware Pallas kernel parity harness (VERDICT r2 #5).

The kernel parity TESTS run in Pallas interpret mode on CPU — they can
not see a Mosaic/libtpu regression. This tool runs the same
kernel-vs-XLA comparisons on the REAL chip (interpret=False) and writes
a JSON record (KERNEL_PARITY_TPU.json at the repo root) that future
rounds re-run to catch toolchain drift:

  1. training forward scan, single-tile (T_in=24) and multi-tile
     (T_in=150) and batch-tiled (B=256 over two 128-row tiles)
  2. training backward chain (gradients through the custom VJP)
  3. fused B=1 inference chunk (+ prenet dropout masks)
  4. batched B<=8 inference chunk

Geometry is small-but-aligned (128 dims) so the whole run compiles and
executes in a few minutes on one chip.

Usage: python tools/verify_kernels.py [--out KERNEL_PARITY_TPU.json]
Exit code 0 iff every check passes its tolerance.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config

RESULTS = {}


def record(name: str, err: float, tol: float) -> bool:
    ok = bool(err <= tol)
    RESULTS[name] = {"max_rel_err": float(err), "tol": tol, "ok": ok}
    print(f"{'PASS' if ok else 'FAIL'} {name}: {err:.3e} (tol {tol:g})")
    return ok


def rel_err(got, ref) -> float:
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    scale = max(np.abs(ref).max(), 1e-3)
    return float(np.abs(got - ref).max() / scale)


def tree_rel_err(got, ref) -> float:
    flat_g, tg = jax.tree.flatten(got)
    flat_r, tr = jax.tree.flatten(ref)
    assert tg == tr, "gradient tree mismatch"
    return max(rel_err(g, r) for g, r in zip(flat_g, flat_r))


def small_cfg(**kw):
    base = dict(
        n_symbols=40, symbols_embedding_dim=128, encoder_embedding_dim=128,
        encoder_n_convolutions=1, attention_rnn_dim=128,
        decoder_rnn_dim=128, prenet_dim=128, attention_dim=128,
        attention_location_n_filters=4, attention_location_kernel_size=7,
        n_mel_channels=16, compute_dtype="bfloat16",
        custom_vjp_decoder=True,
        pallas_train_scan_bwd=True)  # cover the bwd kernel explicitly
    base.update(kw)
    return Tacotron2Config(**base)


def check_train_scan(b: int, t_in: int, t_steps: int, label: str) -> None:
    from tacotron2_tpu.models import decoder_vjp, tacotron2

    cfg_k = small_cfg(pallas_train_scan=True)
    cfg_x = small_cfg(pallas_train_scan=False)
    from tacotron2_tpu.kernels import train_scan
    assert train_scan.supported(cfg_k, t_in, b), (label, "envelope")

    r = np.random.RandomState(0)
    params, _ = tacotron2.init_params(jax.random.PRNGKey(0), cfg_k)
    dp = params["decoder"]
    core = {"attention_rnn": dp["attention_rnn"],
            "decoder_rnn": dp["decoder_rnn"],
            "attention": {k: dp["attention"][k]
                          for k in ("query", "v", "location_conv",
                                    "location_dense")}}
    prenet = jnp.asarray(r.randn(t_steps, b, cfg_k.prenet_dim),
                         jnp.float32) * .3
    memory = jnp.asarray(r.randn(b, t_in, 128), jnp.float32) * .3
    proc = jnp.asarray(r.randn(b, t_in, 128), jnp.float32) * .3
    lengths = np.full((b,), t_in)
    lengths[b // 2:] = max(2, t_in - 5)
    mask = jnp.arange(t_in)[None, :] < jnp.asarray(lengths)[:, None]
    rng = jax.random.PRNGKey(3)

    def fwd(cfg):
        f = jax.jit(lambda c, p: decoder_vjp.core_scan(
            c, p, memory, proc, mask, rng, cfg, True))
        return jax.block_until_ready(f(core, prenet))

    ref = fwd(cfg_x)
    got = fwd(cfg_k)
    err = max(rel_err(g, rr) for g, rr in zip(got, ref))
    record(f"train_fwd_{label}", err, 5e-2)

    def grads(cfg):
        def loss(core, prenet):
            h, c, w = decoder_vjp.core_scan(core, prenet, memory, proc,
                                            mask, rng, cfg, True)
            return (jnp.sum(h * 1e-2) + jnp.sum(c * 1e-2)
                    + jnp.sum(w * 1e-2))
        return jax.block_until_ready(
            jax.jit(jax.grad(loss, argnums=(0, 1)))(core, prenet))

    gref = grads(cfg_x)
    ggot = grads(cfg_k)
    record(f"train_bwd_{label}", tree_rel_err(ggot, gref), 1e-1)


def check_encoder_lstm() -> None:
    """Fused BiLSTM encoder scans vs the XLA lax.scan path, values and
    gradients, on the real chip (round 5, kernels/encoder_lstm.py)."""
    from tacotron2_tpu.ops import lstm as L

    cfg = small_cfg(encoder_embedding_dim=256, pallas_encoder_lstm=True)
    E, B, T = 256, 16, 20
    fp = L.lstm_params(jax.random.PRNGKey(1), E, E // 2)
    bp = L.lstm_params(jax.random.PRNGKey(2), E, E // 2)
    xs = jax.random.normal(jax.random.PRNGKey(3), (B, T, E),
                           jnp.float32) * 0.3
    lengths = jnp.full((B,), T, jnp.int32).at[B // 2:].set(T - 4)

    def run(use_kernel):
        f = jax.jit(lambda p, x: L.bilstm(
            p[0], p[1], x, lengths, compute_dtype=jnp.bfloat16,
            cfg=cfg if use_kernel else None))
        return jax.block_until_ready(f((fp, bp), xs))

    record("encoder_lstm_fwd", rel_err(run(True), run(False)), 5e-2)

    def grads(use_kernel):
        def loss(p, x):
            out = L.bilstm(p[0], p[1], x, lengths,
                           compute_dtype=jnp.bfloat16,
                           cfg=cfg if use_kernel else None)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-2
        return jax.block_until_ready(
            jax.jit(jax.grad(loss, argnums=(0, 1)))((fp, bp), xs))

    record("encoder_lstm_bwd", tree_rel_err(grads(True), grads(False)),
           1e-1)


def check_fused_inference() -> None:
    from tacotron2_tpu.kernels import decoder_batch as db
    from tacotron2_tpu.kernels import decoder_step as ds
    from tacotron2_tpu.models import tacotron2 as m
    from tacotron2_tpu.ops.layers import dense, length_mask

    cfg = small_cfg(gate_threshold=0.99, max_decoder_steps=24,
                    compute_dtype="float32")
    params, stats = m.init_params(jax.random.PRNGKey(2), cfg)
    r = np.random.RandomState(2)

    def enc(b, t_text):
        text = r.randint(1, cfg.n_symbols, (b, t_text)).astype(np.int32)
        lengths = jnp.asarray([t_text] * b, jnp.int32)
        memory, _ = m.encode(params, stats, jnp.asarray(text), lengths,
                             cfg, training=False)
        proc = dense(params["decoder"]["attention"]["memory"], memory)
        return memory, proc, length_mask(lengths, memory.shape[1])

    # B=1 fused chunk, deterministic and with prenet dropout
    memory, proc, mask = enc(1, 20)
    fp1 = ds.pack_decoder_params(params, cfg, dtype=jnp.float32)
    for label, rng in (("det", None), ("dropout", jax.random.PRNGKey(7))):
        cr = m.init_stream_carry(memory, cfg)
        cf = m.init_stream_carry(memory, cfg)
        cr, (mr, gr, ar) = m.decode_chunk(params, cr, memory, proc, mask,
                                          cfg, chunk_steps=12, rng=rng)
        cf, (mf, gf, af) = ds.decode_chunk_fused(
            fp1, cf, memory, proc, mask, cfg, chunk_steps=12,
            dtype=jnp.float32, interpret=False, rng=rng)
        err = max(rel_err(mf, mr), rel_err(gf, gr), rel_err(af, ar))
        record(f"infer_b1_{label}", err, 1e-3)

    # batched B=4 fused chunk
    memory, proc, mask = enc(4, 20)
    fpb = db.pack_batch_decoder_params(params, cfg, dtype=jnp.float32)
    cr = m.init_stream_carry(memory, cfg)
    cf = m.init_stream_carry(memory, cfg)
    cr, (mr, gr, ar) = m.decode_chunk(params, cr, memory, proc, mask,
                                      cfg, chunk_steps=12, rng=None)
    cf, (mf, gf, af) = db.decode_chunk_batch(
        fpb, cf, memory, proc, mask, cfg, chunk_steps=12,
        dtype=jnp.float32, interpret=False)
    err = max(rel_err(mf, mr), rel_err(gf, gr), rel_err(af, ar))
    record("infer_batch_b4", err, 1e-3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="KERNEL_PARITY_TPU.json")
    args = ap.parse_args()

    t0 = time.time()
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()})")

    check_train_scan(16, 24, 12, "single_tile")
    check_train_scan(16, 150, 12, "multi_tile")
    check_train_scan(256, 24, 6, "batch_tiled")
    check_encoder_lstm()
    # The fp32 inference parity checks need TRUE fp32 matmuls: TPU's
    # default matmul precision decomposes f32 dots into bf16 passes,
    # and the two implementations' different op orders then drift ~1e-2
    # over an autoregressive chunk. HIGHEST applies inside Pallas
    # kernels and the XLA path alike, isolating real kernel bugs from
    # precision-mode noise. Scoped here: the bf16 training kernels above
    # must keep the default precision (Mosaic rejects fp32 contract
    # precision on bf16 operands).
    jax.config.update("jax_default_matmul_precision", "highest")
    check_fused_inference()

    ok = all(v["ok"] for v in RESULTS.values())
    payload = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "jax_version": jax.__version__,
        "elapsed_s": round(time.time() - t0, 1),
        "all_ok": ok,
        "checks": RESULTS,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{'ALL PASS' if ok else 'FAILURES'} -> {args.out} "
          f"({payload['elapsed_s']}s)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
