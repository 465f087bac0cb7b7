"""Fused decoder chunk kernel (kernels/decoder_step.py) parity tests.

Interpret mode on CPU: the fused kernel must reproduce
``tacotron2.decode_chunk`` (deterministic prenet) step for step —
outputs, gate latch, lengths, and the full resumable carry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.kernels import decoder_step as ds
from tacotron2_tpu.models import tacotron2 as m
from tacotron2_tpu.ops.layers import dense, length_mask


def make_cfg(**kw):
    base = dict(
        n_symbols=148, symbols_embedding_dim=32, encoder_embedding_dim=32,
        encoder_n_convolutions=2, attention_rnn_dim=40, decoder_rnn_dim=48,
        prenet_dim=16, attention_dim=24, attention_location_n_filters=8,
        attention_location_kernel_size=15, postnet_embedding_dim=32,
        postnet_n_convolutions=3, n_mel_channels=20, max_decoder_steps=24,
        text_buckets=(16,), gate_threshold=0.99,
        compute_dtype="float32")  # fp32 parity (bf16 is the r3 default)
    base.update(kw)
    return Tacotron2Config(**base)


def setup(cfg, seed=0, t_text=12):
    params, stats = m.init_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    text = rng.randint(1, 148, (1, t_text)).astype(np.int32)
    lengths = jnp.asarray([t_text], jnp.int32)
    memory, _ = m.encode(params, stats, jnp.asarray(text), lengths, cfg,
                         training=False)
    processed = dense(params["decoder"]["attention"]["memory"], memory)
    mask = length_mask(lengths, memory.shape[1])
    return params, memory, processed, mask


@pytest.mark.parametrize("gate_threshold,ks,r", [
    (0.99, 15, 1),   # runs to the cap
    (0.3, 15, 1),    # gate fires early -> latch/masking path
    (0.99, 31, 1),   # default-size location kernel
    (0.99, 15, 2),   # reduction factor r=2
])
def test_fused_chunk_matches_reference(gate_threshold, ks, r):
    cfg = make_cfg(gate_threshold=gate_threshold,
                   attention_location_kernel_size=ks, n_frames_per_step=r)
    params, memory, processed, mask = setup(cfg)
    fp = ds.pack_decoder_params(params, cfg, dtype=jnp.float32)

    cr = m.init_stream_carry(memory, cfg)
    cf = m.init_stream_carry(memory, cfg)
    for _ in range(3):
        cr, (mr, gr, ar) = m.decode_chunk(
            params, cr, memory, processed, mask, cfg, chunk_steps=8,
            rng=None)
        cf, (mf, gf, af) = ds.decode_chunk_fused(
            fp, cf, memory, processed, mask, cfg, chunk_steps=8,
            dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(mf, mr, atol=1e-5)
        np.testing.assert_allclose(gf, gr, atol=1e-5)
        np.testing.assert_allclose(af, ar, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cf.finished),
                                  np.asarray(cr.finished))
    np.testing.assert_array_equal(np.asarray(cf.lengths),
                                  np.asarray(cr.lengths))
    assert cf.t == cr.t
    for field in cr.state._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(cf.state, field)),
            np.asarray(getattr(cr.state, field)), atol=1e-5,
            err_msg=f"state.{field}")
    np.testing.assert_allclose(np.asarray(cf.prev_mel),
                               np.asarray(cr.prev_mel), atol=1e-5)


def test_fused_chunk_prenet_dropout_parity():
    """Round 3 (VERDICT r2 #4): with ``rng`` given, the fused kernel
    reproduces the reference's inference-time prenet dropout
    (model.py:99) — same fold_in key derivation as the XLA
    ``decode_chunk``, so outputs match bit-for-bit-pattern at fp32
    tolerance across resumed chunks."""
    cfg = make_cfg()
    params, memory, processed, mask = setup(cfg, seed=3)
    fp = ds.pack_decoder_params(params, cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(42)

    cr = m.init_stream_carry(memory, cfg)
    cf = m.init_stream_carry(memory, cfg)
    for _ in range(3):
        cr, (mr, gr, ar) = m.decode_chunk(
            params, cr, memory, processed, mask, cfg, chunk_steps=8,
            rng=rng)
        cf, (mf, gf, af) = ds.decode_chunk_fused(
            fp, cf, memory, processed, mask, cfg, chunk_steps=8,
            dtype=jnp.float32, interpret=True, rng=rng)
        np.testing.assert_allclose(mf, mr, atol=1e-5)
        np.testing.assert_allclose(gf, gr, atol=1e-5)
        np.testing.assert_allclose(af, ar, atol=1e-5)
    # dropout actually does something: deterministic run differs
    cd = m.init_stream_carry(memory, cfg)
    _, (md, _, _) = ds.decode_chunk_fused(
        fp, cd, memory, processed, mask, cfg, chunk_steps=8,
        dtype=jnp.float32, interpret=True, rng=None)
    cx = m.init_stream_carry(memory, cfg)
    _, (mx, _, _) = ds.decode_chunk_fused(
        fp, cx, memory, processed, mask, cfg, chunk_steps=8,
        dtype=jnp.float32, interpret=True, rng=rng)
    assert not np.allclose(np.asarray(md), np.asarray(mx), atol=1e-5)


def test_fused_chunk_resume_equals_one_shot():
    """Two 8-step fused chunks == one 16-step fused chunk."""
    cfg = make_cfg()
    params, memory, processed, mask = setup(cfg, seed=1)
    fp = ds.pack_decoder_params(params, cfg, dtype=jnp.float32)

    c1 = m.init_stream_carry(memory, cfg)
    mels = []
    for _ in range(2):
        c1, (mel, _, _) = ds.decode_chunk_fused(
            fp, c1, memory, processed, mask, cfg, chunk_steps=8,
            dtype=jnp.float32, interpret=True)
        mels.append(mel)
    two = jnp.concatenate(mels, axis=1)

    c2 = m.init_stream_carry(memory, cfg)
    c2, (one, _, _) = ds.decode_chunk_fused(
        fp, c2, memory, processed, mask, cfg, chunk_steps=16,
        dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(two), np.asarray(one), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(c1.finished),
                                  np.asarray(c2.finished))


def test_pack_rejects_nothing_but_wide_frames():
    cfg = make_cfg(n_mel_channels=64, n_frames_per_step=2)  # 128 + gate
    params, _ = m.init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError):
        ds.pack_decoder_params(params, cfg)


@pytest.mark.parametrize("gate_threshold", [0.99, 0.3])
def test_infer_fused_matches_infer(gate_threshold):
    """Full-utterance fused inference == tacotron2.infer (fp32, rng=None),
    including early exit, postnet, and output masking."""
    cfg = make_cfg(gate_threshold=gate_threshold, max_decoder_steps=20)
    params, stats = m.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(2)
    text = jnp.asarray(rng.randint(1, 148, (1, 12)).astype(np.int32))
    lengths = jnp.asarray([12], jnp.int32)

    ref = m.infer(params, stats, text, lengths, cfg)
    got = m.infer_fused(params, stats, text, lengths, cfg, chunk_steps=8)

    np.testing.assert_array_equal(np.asarray(got.mel_lengths),
                                  np.asarray(ref.mel_lengths))
    np.testing.assert_allclose(np.asarray(got.mel), np.asarray(ref.mel),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.mel_postnet),
                               np.asarray(ref.mel_postnet), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.gate_energies),
                               np.asarray(ref.gate_energies), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.alignments),
                               np.asarray(ref.alignments), atol=1e-5)
