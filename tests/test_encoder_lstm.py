"""Parity tests for the weights-resident fused BiLSTM encoder scans
(kernels/encoder_lstm.py) against the XLA lax.scan path (ops/lstm.py) —
interpret mode on CPU. Values agree to bf16 round-off (same bf16 matmul
+ f32 accumulation + f32 carries); gradients through the custom VJP
track the autodiff-through-scan gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.ops import lstm as L

B, T, N, H = 16, 12, 128, 64  # H=e//2 -> use e=128, H=64? envelope needs H%128

CFG = Tacotron2Config(
    n_symbols=40, symbols_embedding_dim=128, encoder_embedding_dim=256,
    encoder_n_convolutions=1, attention_rnn_dim=128, decoder_rnn_dim=128,
    prenet_dim=128, attention_dim=128, attention_location_n_filters=4,
    attention_location_kernel_size=7, n_mel_channels=16,
    compute_dtype="bfloat16", pallas_encoder_lstm=True)
E = CFG.encoder_embedding_dim          # 256
HH = E // 2                            # 128 per direction


def make():
    fp = L.lstm_params(jax.random.PRNGKey(1), E, HH)
    bp = L.lstm_params(jax.random.PRNGKey(2), E, HH)
    xs = jax.random.normal(jax.random.PRNGKey(3), (B, T, E),
                           jnp.float32) * 0.3
    lengths = jnp.full((B,), T, jnp.int32).at[B // 2:].set(T - 3)
    return fp, bp, xs, lengths


def test_envelope():
    from tacotron2_tpu.kernels import encoder_lstm
    assert encoder_lstm.supported(CFG, B)
    assert not encoder_lstm.supported(CFG, 1)       # B=1 inference
    assert not encoder_lstm.supported(
        CFG.replace(compute_dtype="float32"), B)


def test_forward_parity():
    fp, bp, xs, lengths = make()
    ref = L.bilstm(fp, bp, xs, lengths, compute_dtype=jnp.bfloat16)
    got = L.bilstm(fp, bp, xs, lengths, compute_dtype=jnp.bfloat16,
                   cfg=CFG)
    r, g = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    assert g.shape == r.shape
    np.testing.assert_allclose(g, r, atol=3e-2, rtol=0.05)
    # masked region exactly zero
    assert np.all(g[B // 2:, T - 3:] == 0.0)


def test_grad_parity():
    fp, bp, xs, lengths = make()

    def loss(use_kernel):
        def f(p, x):
            out = L.bilstm(p[0], p[1], x, lengths,
                           compute_dtype=jnp.bfloat16,
                           cfg=CFG if use_kernel else None)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1))((fp, bp), xs)

    g_ref = loss(False)
    g_got = loss(True)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1e-3, float(np.abs(a).max()))
        assert np.abs(a - b).max() / scale < 0.06
