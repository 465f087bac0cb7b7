"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tacotron2_tpu.audio.mel import MelConfig, mel_spectrogram
from tacotron2_tpu.kernels import mel_spectrogram_pallas


@pytest.fixture(scope="module")
def audio():
    rng = np.random.RandomState(0)
    return (rng.randn(2, 22050) * 0.2).astype(np.float32)


def test_pallas_mel_matches_xla(audio):
    cfg = MelConfig()
    expected = np.asarray(mel_spectrogram(jnp.asarray(audio), cfg))
    got = np.asarray(mel_spectrogram_pallas(jnp.asarray(audio), cfg,
                                            interpret=True))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_pallas_mel_nonmultiple_block(audio):
    """Frame count not a multiple of BLOCK_T (87 frames with defaults)."""
    cfg = MelConfig()
    short = audio[:, :10000]
    expected = np.asarray(mel_spectrogram(jnp.asarray(short), cfg))
    got = np.asarray(mel_spectrogram_pallas(jnp.asarray(short), cfg,
                                            interpret=True))
    np.testing.assert_allclose(got, expected, atol=2e-4)


# ---------------------------------------------------------------- int8


def _dequant_ref(x, w_q, scale):
    """Reference math for the kernel: bf16 operands, fp32 accumulate."""
    w = w_q.astype(jnp.bfloat16)
    return np.asarray(jnp.dot(jnp.asarray(x).astype(jnp.bfloat16), w,
                              preferred_element_type=jnp.float32)
                      * scale[None, :])


@pytest.mark.parametrize("B,K,N", [(1, 256, 512), (8, 1792, 4096),
                                   (3, 100, 83)])  # last: padding path
def test_int8_matmul_matches_reference(B, K, N):
    from tacotron2_tpu.kernels import int8_matmul, quantize_int8
    rng = np.random.RandomState(1)
    x = rng.randn(B, K).astype(np.float32)
    w = (rng.randn(K, N) * 0.05).astype(np.float32)
    w_q, scale = quantize_int8(w)
    got = np.asarray(int8_matmul(jnp.asarray(x), w_q, scale,
                                 interpret=True))
    expected = _dequant_ref(x, np.asarray(w_q), np.asarray(scale))
    assert got.shape == (B, N)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_quantize_int8_roundtrip_error():
    from tacotron2_tpu.kernels import quantize_int8
    rng = np.random.RandomState(2)
    w = rng.randn(64, 32).astype(np.float32)
    w_q, scale = quantize_int8(w)
    err = np.abs(np.asarray(w_q).astype(np.float32)
                 * np.asarray(scale)[None, :] - w)
    # symmetric absmax: error bounded by scale/2 per channel
    assert (err <= np.asarray(scale)[None, :] * 0.5 + 1e-7).all()


def test_quantized_lstm_cell_close_to_fp32():
    import jax
    from tacotron2_tpu.ops import lstm
    key = jax.random.PRNGKey(0)
    p = lstm.lstm_params(key, 48, 64)
    pq = lstm.quantize_lstm_params(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48))
    state = lstm.lstm_init_state(2, 64)
    h32, c32 = lstm.lstm_cell(p, x, state)
    hq, cq = lstm.lstm_cell(pq, x, state)
    # weight-only int8 + bf16 activations: small relative error
    np.testing.assert_allclose(np.asarray(hq), np.asarray(h32), atol=0.02)
    np.testing.assert_allclose(np.asarray(cq), np.asarray(c32), atol=0.02)


def test_quantized_infer_runs_and_tracks_fp32():
    import jax
    from tacotron2_tpu.config import Tacotron2Config
    from tacotron2_tpu.models import tacotron2 as m
    cfg = Tacotron2Config(
        n_symbols=148, symbols_embedding_dim=32, encoder_embedding_dim=32,
        encoder_n_convolutions=2, attention_rnn_dim=40, decoder_rnn_dim=48,
        prenet_dim=16, attention_dim=24, attention_location_n_filters=8,
        attention_location_kernel_size=15, postnet_embedding_dim=32,
        postnet_n_convolutions=3, n_mel_channels=20, max_decoder_steps=12,
        text_buckets=(16,))
    params, stats = m.init_params(jax.random.PRNGKey(0), cfg)
    pq = m.quantize_for_serving(params)
    text = np.asarray([[3, 7, 11, 5, 2, 9, 0, 0]], np.int32)
    lengths = jnp.asarray([6], jnp.int32)
    res32 = m.infer(params, stats, jnp.asarray(text), lengths, cfg)
    resq = m.infer(pq, stats, jnp.asarray(text), lengths, cfg)
    a, b = np.asarray(resq.mel_postnet), np.asarray(res32.mel_postnet)
    assert np.isfinite(a).all()
    # autoregressive drift compounds; just require the same ballpark
    assert np.abs(a - b).max() < 0.5, np.abs(a - b).max()
