"""Custom-VJP decoder scan (models/decoder_vjp.py): forward and gradient
parity against the plain-autodiff XLA path, fp32 on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models import tacotron2 as m

CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=32, encoder_embedding_dim=32,
    encoder_n_convolutions=2, attention_rnn_dim=40, decoder_rnn_dim=48,
    prenet_dim=16, attention_dim=24, attention_location_n_filters=8,
    attention_location_kernel_size=15, postnet_embedding_dim=32,
    postnet_n_convolutions=3, n_mel_channels=20, max_decoder_steps=50,
    custom_vjp_decoder=False,  # the plain-autodiff reference path
    compute_dtype="float32",  # fp32 parity baseline (bf16 is the r3 default)
)
CFG_VJP = CFG.replace(custom_vjp_decoder=True)


@pytest.fixture(scope="module")
def setup():
    params, _ = m.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(1)
    B, T_in, T_out = 4, 12, 18
    memory = jnp.asarray(rng.randn(B, T_in, 32).astype(np.float32))
    memory_lengths = jnp.asarray([12, 10, 7, 5])
    mels = jnp.asarray(rng.randn(B, T_out, 20).astype(np.float32))
    return params, memory, memory_lengths, mels


def _decode(params, memory, memory_lengths, mels, cfg, training, rng):
    return m.decode_teacher_forced(params, memory, memory_lengths, mels,
                                   cfg, training=training, rng=rng)


@pytest.mark.parametrize("training,use_rng", [(False, False), (True, True)])
def test_forward_parity(setup, training, use_rng):
    params, memory, memory_lengths, mels = setup
    rng = jax.random.PRNGKey(7) if use_rng else None
    ref = _decode(params, memory, memory_lengths, mels, CFG, training, rng)
    got = _decode(params, memory, memory_lengths, mels, CFG_VJP, training, rng)
    for r, g, name in zip(ref, got, ["mel", "gate", "align"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def _loss_fn(cfg, training, rng):
    def loss(params, memory, mels, memory_lengths):
        mel, gate, align = m.decode_teacher_forced(
            params, memory, memory_lengths, mels, cfg,
            training=training, rng=rng)
        # exercise every output cotangent, with distinct weights
        return (jnp.sum(mel ** 2) + 0.5 * jnp.sum(jax.nn.sigmoid(gate))
                + 0.25 * jnp.sum(align * align))
    return loss


@pytest.mark.slow
@pytest.mark.parametrize("training,use_rng", [(False, False), (True, True)])
def test_grad_parity(setup, training, use_rng):
    params, memory, memory_lengths, mels = setup
    rng = jax.random.PRNGKey(3) if use_rng else None
    # grads wrt params, the encoder memory, and the teacher mels (prenet path)
    g_ref = jax.grad(_loss_fn(CFG, training, rng), argnums=(0, 1, 2))(
        params, memory, mels, memory_lengths)
    g_new = jax.grad(_loss_fn(CFG_VJP, training, rng), argnums=(0, 1, 2))(
        params, memory, mels, memory_lengths)

    flat_ref, tree_ref = jax.tree.flatten(g_ref)
    flat_new, tree_new = jax.tree.flatten(g_new)
    assert tree_ref == tree_new
    paths = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(g_ref)[0]]
    for path, a, b in zip(paths, flat_ref, flat_new):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5 * scale,
                                   err_msg=path)


@pytest.mark.slow
def test_interleave_forward_exact(setup):
    """decoder_interleave=2 must match interleave=1 BITWISE: dropout masks
    are drawn at full batch width and sliced, and row-splitting a matmul
    changes nothing per row."""
    params, memory, memory_lengths, mels = setup
    rng = jax.random.PRNGKey(7)
    ref = _decode(params, memory, memory_lengths, mels, CFG_VJP, True, rng)
    got = _decode(params, memory, memory_lengths, mels,
                  CFG_VJP.replace(decoder_interleave=2), True, rng)
    for r, g, name in zip(ref, got, ["mel", "gate", "align"]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=name)


@pytest.mark.slow
def test_interleave_grad_parity(setup):
    """Gradients through the interleaved backward match interleave=1."""
    params, memory, memory_lengths, mels = setup
    rng = jax.random.PRNGKey(3)
    cfg_il = CFG_VJP.replace(decoder_interleave=2)
    g_ref = jax.grad(_loss_fn(CFG_VJP, True, rng), argnums=(0, 1, 2))(
        params, memory, mels, memory_lengths)
    g_new = jax.grad(_loss_fn(cfg_il, True, rng), argnums=(0, 1, 2))(
        params, memory, mels, memory_lengths)
    flat_ref, tree_ref = jax.tree.flatten(g_ref)
    flat_new, tree_new = jax.tree.flatten(g_new)
    assert tree_ref == tree_new
    paths = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(g_ref)[0]]
    for path, a, b in zip(paths, flat_ref, flat_new):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        # dW accumulates per chunk then sums (one extra fp32 add) — exact
        # up to that reassociation
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6 * scale,
                                   err_msg=path)


def test_interleave_rejects_indivisible_batch(setup):
    params, memory, memory_lengths, mels = setup
    with pytest.raises(ValueError, match="divisible"):
        _decode(params, memory, memory_lengths, mels,
                CFG_VJP.replace(decoder_interleave=3), False, None)


@pytest.mark.slow
def test_grad_parity_bf16(setup):
    """bf16 compute path: the custom backward downcasts cotangents at the
    matmul boundaries where autodiff's bf16 forward puts its casts (module
    docstring) — parity holds at a loose, bf16-scale tolerance."""
    params, memory, memory_lengths, mels = setup
    cfg_ref = CFG.replace(compute_dtype="bfloat16")
    cfg_vjp = CFG_VJP.replace(compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(3)
    g_ref = jax.grad(_loss_fn(cfg_ref, True, rng), argnums=(0, 1, 2))(
        params, memory, mels, memory_lengths)
    g_new = jax.grad(_loss_fn(cfg_vjp, True, rng), argnums=(0, 1, 2))(
        params, memory, mels, memory_lengths)

    flat_ref, tree_ref = jax.tree.flatten(g_ref)
    flat_new, tree_new = jax.tree.flatten(g_new)
    assert tree_ref == tree_new
    paths = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(g_ref)[0]]
    for path, a, b in zip(paths, flat_ref, flat_new):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-2)
        # bf16 has ~8 mantissa bits; the two paths differ by dot order and
        # cast placement, so tolerate a few percent of the gradient scale
        np.testing.assert_allclose(b, a, rtol=0.05, atol=0.05 * scale,
                                   err_msg=path)


@pytest.mark.slow
def test_grad_zero_outside_decoder(setup):
    """Params not used by the decoder scan (postnet, encoder convs) get
    exactly zero gradient through decode_teacher_forced in both paths."""
    params, memory, memory_lengths, mels = setup
    g = jax.grad(_loss_fn(CFG_VJP, True, jax.random.PRNGKey(0)))(
        params, memory, mels, memory_lengths)
    assert all(float(jnp.abs(x).max()) == 0.0
               for x in jax.tree.leaves(g["postnet"]))


def test_reduction_factor_parity(setup):
    """r=2 grouping works through the custom path too."""
    params_r1, memory, memory_lengths, mels = setup
    cfg = CFG.replace(n_frames_per_step=2)
    params, _ = m.init_params(jax.random.PRNGKey(0), cfg)
    ref = m.decode_teacher_forced(params, memory, memory_lengths, mels,
                                  cfg, training=False, rng=None)
    got = m.decode_teacher_forced(params, memory, memory_lengths, mels,
                                  cfg.replace(custom_vjp_decoder=True),
                                  training=False, rng=None)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)
