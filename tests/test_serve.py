"""Micro-batching synthesizer tests."""

import numpy as np
import pytest

import jax

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models.tacotron2 import init_params
from tacotron2_tpu.serve import BatchingSynthesizer

CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=16, encoder_embedding_dim=16,
    encoder_n_convolutions=2, attention_rnn_dim=20, decoder_rnn_dim=24,
    prenet_dim=8, attention_dim=12, attention_location_n_filters=4,
    attention_location_kernel_size=7, postnet_embedding_dim=16,
    postnet_n_convolutions=3, n_mel_channels=8, max_decoder_steps=10,
    text_buckets=(16, 32),
)


@pytest.fixture(scope="module")
def synth():
    params, stats = init_params(jax.random.PRNGKey(0), CFG)
    s = BatchingSynthesizer(params, stats, CFG, max_batch=4, max_wait_ms=20)
    yield s
    s.close()


def test_single_request(synth):
    mel, align, n = synth.submit("hello world").result(timeout=120)
    assert 1 <= n <= CFG.max_decoder_steps
    assert mel.shape == (n, CFG.n_mel_channels)
    assert align.shape[0] == n


def test_concurrent_requests_batched(synth):
    texts = ["first utterance", "second one", "third", "a fourth request"]
    results = synth.synthesize(texts)
    assert len(results) == 4
    for mel, align, n in results:
        assert mel.shape == (n, CFG.n_mel_channels)


def test_batched_equals_individual(synth):
    """Micro-batching must not change results (deterministic mode)."""
    text = "consistency check"
    r1 = synth.submit(text).result(timeout=120)
    r2 = synth.submit(text).result(timeout=120)
    np.testing.assert_allclose(r1[0], r2[0], atol=1e-5)


def test_closed_rejects(synth):
    params, stats = init_params(jax.random.PRNGKey(0), CFG)
    s = BatchingSynthesizer(params, stats, CFG, max_batch=2)
    s.close()
    with pytest.raises(RuntimeError):
        s.submit("too late")


def test_fused_kernel_path_engages(monkeypatch):
    """Round 3: with 128-aligned dims and max_batch <= 8, the
    synthesizer routes through the batched fused Pallas decoder
    (kernels/decoder_batch.py) and produces sane output."""
    from tacotron2_tpu.kernels import decoder_batch as db

    cfg = Tacotron2Config(
        n_symbols=148, symbols_embedding_dim=128,
        encoder_embedding_dim=128, encoder_n_convolutions=1,
        attention_rnn_dim=128, decoder_rnn_dim=128, prenet_dim=128,
        attention_dim=128, attention_location_n_filters=4,
        attention_location_kernel_size=7, n_mel_channels=16,
        max_decoder_steps=8, text_buckets=(16, 32),
        compute_dtype="float32")
    calls = []
    real = db.decode_autoregressive_batch

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(db, "decode_autoregressive_batch", spy)
    params, stats = init_params(jax.random.PRNGKey(0), cfg)
    s = BatchingSynthesizer(params, stats, cfg, max_batch=4,
                            max_wait_ms=20)
    try:
        assert s._packed is not None, "fused path should be eligible"
        mel, align, n = s.submit("hello").result(timeout=300)
        assert 1 <= n <= cfg.max_decoder_steps
        assert mel.shape == (n, cfg.n_mel_channels)
        assert np.isfinite(mel).all()
        assert calls, "batched fused decoder was not invoked"
    finally:
        s.close()


def test_oversized_bucket_gates_per_bucket(monkeypatch):
    """Round 4 (ADVICE r3): one oversized text bucket (t_pad > 512) must
    not disable the fused decoder for the other buckets — gating is per
    bucket, with the oversized bucket taking the XLA path."""
    from tacotron2_tpu.kernels import decoder_batch as db

    cfg = Tacotron2Config(
        n_symbols=148, symbols_embedding_dim=128,
        encoder_embedding_dim=128, encoder_n_convolutions=1,
        attention_rnn_dim=128, decoder_rnn_dim=128, prenet_dim=128,
        attention_dim=128, attention_location_n_filters=4,
        attention_location_kernel_size=7, n_mel_channels=16,
        max_decoder_steps=6, text_buckets=(16, 576),
        compute_dtype="float32")
    assert not db.batch_supported(cfg, 576, 2)
    assert db.batch_supported(cfg, 16, 2)
    calls = []
    real = db.decode_autoregressive_batch

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(db, "decode_autoregressive_batch", spy)
    params, stats = init_params(jax.random.PRNGKey(0), cfg)
    s = BatchingSynthesizer(params, stats, cfg, max_batch=2,
                            max_wait_ms=10)
    try:
        assert s._packed is not None, \
            "an eligible bucket exists; packing must happen"
        mel, _, n = s.submit("hi").result(timeout=300)  # 16-bucket
        assert calls, "eligible bucket should use the fused decoder"
        assert np.isfinite(mel).all()
        # the oversized bucket traces the XLA path without error
        fn = s._infer_fn(576)
        import jax.numpy as jnp
        n_calls = len(calls)
        text = np.zeros((2, 576), np.int32)
        text[:, :3] = 5
        mel576, _, _ = fn(jnp.asarray(text),
                          jnp.asarray([3, 3], np.int32))
        assert len(calls) == n_calls, "oversized bucket must stay XLA"
        assert np.isfinite(np.asarray(mel576)).all()
    finally:
        s.close()


def test_int8_quantized_params_fall_back_to_xla_path():
    """quantize_for_serving params ({w_q, scale, bias} LSTM trees) cannot
    feed the fused packer — the synthesizer must detect them and keep
    the XLA path instead of crashing at construction (round-3 review)."""
    from tacotron2_tpu.models.tacotron2 import quantize_for_serving

    cfg = Tacotron2Config(
        n_symbols=148, symbols_embedding_dim=128,
        encoder_embedding_dim=128, encoder_n_convolutions=1,
        attention_rnn_dim=128, decoder_rnn_dim=128, prenet_dim=128,
        attention_dim=128, attention_location_n_filters=4,
        attention_location_kernel_size=7, n_mel_channels=16,
        max_decoder_steps=6, text_buckets=(16,),
        compute_dtype="float32")
    params, stats = init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_for_serving(params)
    s = BatchingSynthesizer(qparams, stats, cfg, max_batch=2,
                            max_wait_ms=10)
    try:
        assert s._packed is None  # fused path correctly ineligible
        mel, align, n = s.submit("hi").result(timeout=300)
        assert np.isfinite(mel).all()
    finally:
        s.close()
