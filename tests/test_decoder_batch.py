"""Batched fused decoder kernel (kernels/decoder_batch.py) parity tests.

Interpret mode on CPU: the B<=8 batched kernel must reproduce
``tacotron2.decode_chunk`` step for step — outputs, per-row gate
latches, lengths, and the full resumable carry. The kernel envelope
needs 128-aligned dims, so these run at the train-scan test geometry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.kernels import decoder_batch as db
from tacotron2_tpu.models import tacotron2 as m
from tacotron2_tpu.ops.layers import dense, length_mask


def make_cfg(**kw):
    base = dict(
        n_symbols=40, symbols_embedding_dim=128, encoder_embedding_dim=128,
        encoder_n_convolutions=1, attention_rnn_dim=128,
        decoder_rnn_dim=128, prenet_dim=128, attention_dim=128,
        attention_location_n_filters=4, attention_location_kernel_size=7,
        n_mel_channels=16, max_decoder_steps=24, gate_threshold=0.99,
        compute_dtype="float32")  # fp32 parity (bf16 is the r3 default)
    base.update(kw)
    return Tacotron2Config(**base)


def setup(cfg, B=4, seed=0, t_text=20):
    params, stats = m.init_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    text = rng.randint(1, cfg.n_symbols, (B, t_text)).astype(np.int32)
    lengths = np.full((B,), t_text, np.int32)
    lengths[B // 2:] = max(2, t_text - 6)
    for b, L in enumerate(lengths):
        text[b, L:] = 0
    lengths = jnp.asarray(lengths)
    memory, _ = m.encode(params, stats, jnp.asarray(text), lengths, cfg,
                         training=False)
    processed = dense(params["decoder"]["attention"]["memory"], memory)
    mask = length_mask(lengths, memory.shape[1])
    return params, memory, processed, mask, lengths


@pytest.mark.parametrize("B,gate_threshold,r", [
    (4, 0.99, 1),   # runs to the cap, ragged lengths
    (4, 0.3, 1),    # per-row gate latch path
    (3, 0.99, 2),   # reduction factor r=2, odd batch
    (8, 0.99, 1),   # full sublane tile
    (16, 0.99, 1),  # two sublane tiles (round-5 extension)
    (21, 0.3, 1),   # three tiles, ragged rows + gate latch
])
def test_batch_chunk_matches_reference(B, gate_threshold, r):
    cfg = make_cfg(gate_threshold=gate_threshold, n_frames_per_step=r)
    params, memory, processed, mask, _ = setup(cfg, B=B)
    assert db.batch_supported(cfg, memory.shape[1], B)
    fp = db.pack_batch_decoder_params(params, cfg, dtype=jnp.float32)

    cr = m.init_stream_carry(memory, cfg)
    cf = m.init_stream_carry(memory, cfg)
    for _ in range(3):
        cr, (mr, gr, ar) = m.decode_chunk(
            params, cr, memory, processed, mask, cfg, chunk_steps=6,
            rng=None)
        cf, (mf, gf, af) = db.decode_chunk_batch(
            fp, cf, memory, processed, mask, cfg, chunk_steps=6,
            dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(mf, mr, atol=1e-4)
        np.testing.assert_allclose(gf, gr, atol=1e-4)
        np.testing.assert_allclose(af, ar, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(cf.finished),
                                  np.asarray(cr.finished))
    np.testing.assert_array_equal(np.asarray(cf.lengths),
                                  np.asarray(cr.lengths))
    assert cf.t == cr.t
    for field in cr.state._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(cf.state, field)),
            np.asarray(getattr(cr.state, field)), atol=1e-4,
            err_msg=f"state.{field}")
    np.testing.assert_allclose(np.asarray(cf.prev_mel),
                               np.asarray(cr.prev_mel), atol=1e-4)


def test_batch_chunk_prenet_dropout_parity():
    """Per-row prenet dropout: masks are drawn at the XLA batch width
    (B, p), so each row's pattern matches ``decode_chunk`` exactly."""
    cfg = make_cfg()
    B = 4
    params, memory, processed, mask, _ = setup(cfg, B=B, seed=3)
    fp = db.pack_batch_decoder_params(params, cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(42)

    cr = m.init_stream_carry(memory, cfg)
    cf = m.init_stream_carry(memory, cfg)
    for _ in range(2):
        cr, (mr, gr, ar) = m.decode_chunk(
            params, cr, memory, processed, mask, cfg, chunk_steps=6,
            rng=rng)
        cf, (mf, gf, af) = db.decode_chunk_batch(
            fp, cf, memory, processed, mask, cfg, chunk_steps=6,
            dtype=jnp.float32, interpret=True, rng=rng)
        np.testing.assert_allclose(mf, mr, atol=1e-4)
        np.testing.assert_allclose(gf, gr, atol=1e-4)


def test_batch_autoregressive_matches_xla():
    """Full-utterance batched fused decode == decode_autoregressive
    (deterministic prenet), including per-row early exit and lengths."""
    cfg = make_cfg(gate_threshold=0.5, max_decoder_steps=18)
    B = 4
    params, memory, processed, mask, lengths = setup(cfg, B=B, seed=5)
    fp = db.pack_batch_decoder_params(params, cfg, dtype=jnp.float32)

    ref = m.decode_autoregressive(
        params, memory, lengths, cfg, rng=None)
    got = db.decode_autoregressive_batch(
        fp, memory, processed, mask, cfg, chunk_steps=6,
        dtype=jnp.float32, interpret=True)
    for g, r_, name in zip(got, ref, ("mel", "gate", "align", "len")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r_),
                                   atol=1e-4, err_msg=name)
