"""Reduction-factor decoding tests (n_frames_per_step > 1).

The reference declares this knob but hardcodes r=1 ("currently only 1 is
supported", hparams.py:56). Here r>1 works: each decoder step emits r
frames, cutting sequential scan steps by r.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models import tacotron2 as m
from tacotron2_tpu.training import Batch, create_train_state, train_step

BASE = dict(
    n_symbols=148, symbols_embedding_dim=16, encoder_embedding_dim=16,
    encoder_n_convolutions=2, attention_rnn_dim=20, decoder_rnn_dim=24,
    prenet_dim=8, attention_dim=12, attention_location_n_filters=4,
    attention_location_kernel_size=7, postnet_embedding_dim=16,
    postnet_n_convolutions=3, n_mel_channels=8, max_decoder_steps=10,
)
CFG_R2 = Tacotron2Config(n_frames_per_step=2, **BASE)
CFG_R3 = Tacotron2Config(n_frames_per_step=3, **BASE)


def make_batch(cfg, B=2, T_in=6, T_out=12, seed=0):
    rng = np.random.RandomState(seed)
    text = rng.randint(1, 148, (B, T_in)).astype(np.int32)
    mel = rng.randn(B, T_out, cfg.n_mel_channels).astype(np.float32) * 0.3
    mel_lengths = np.array([T_out, T_out - cfg.n_frames_per_step])
    gate = np.zeros((B, T_out), np.float32)
    for b, L in enumerate(mel_lengths):
        mel[b, L:] = 0.0
        gate[b, L - 1:] = 1.0  # 1 from last real frame (data_utils.py:107)
    return Batch(jnp.asarray(text), jnp.asarray([T_in, T_in - 2]),
                 jnp.asarray(mel), jnp.asarray(gate),
                 jnp.asarray(mel_lengths))


@pytest.mark.parametrize("cfg", [CFG_R2, CFG_R3], ids=["r2", "r3"])
class TestReductionFactor:
    def test_param_shapes_scale_with_r(self, cfg):
        params, _ = m.init_params(jax.random.PRNGKey(0), cfg)
        r = cfg.n_frames_per_step
        assert params["decoder"]["prenet"][0]["kernel"].shape[0] == 8 * r
        assert params["decoder"]["projection"]["kernel"].shape[1] == 8 * r

    def test_teacher_forced_shapes(self, cfg):
        params, stats = m.init_params(jax.random.PRNGKey(0), cfg)
        batch = make_batch(cfg)
        out, _ = m.forward(params, stats, batch.text, batch.text_lengths,
                           batch.mel, batch.mel_lengths, cfg, training=False)
        assert out.mel.shape == batch.mel.shape
        assert out.gate_energies.shape == batch.gate_target.shape
        assert out.alignments.shape == (2, 12, 6)
        # gate energies repeat within each r-group
        r = cfg.n_frames_per_step
        g = np.asarray(out.gate_energies)
        valid_groups = 12 // r
        for k in range(valid_groups):
            grp = g[:, k * r:(k + 1) * r]
            # all-equal within group unless output-masked (gate -> 1e3)
            unmasked = grp != 1e3
            if unmasked.all():
                assert np.allclose(grp, grp[:, :1])

    @pytest.mark.slow
    def test_training_learns(self, cfg):
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        batch = make_batch(cfg)
        step = jax.jit(functools.partial(train_step, cfg=cfg))
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(100):
            state, metrics, _ = step(state, batch, rng)
            losses.append(float(metrics.loss))
        head, tail = np.mean(losses[:5]), np.mean(losses[-5:])
        assert np.isfinite(tail) and tail < head * 0.9, (head, tail)

    def test_inference_emits_frame_groups(self, cfg):
        params, stats = m.init_params(jax.random.PRNGKey(0), cfg)
        batch = make_batch(cfg)
        res = m.infer(params, stats, batch.text, batch.text_lengths,
                      cfg.replace(prenet_dropout_at_inference=False))
        r = cfg.n_frames_per_step
        assert res.mel.shape == (2, cfg.max_decoder_steps * r,
                                 cfg.n_mel_channels)
        # lengths are frame counts, always multiples of r
        lengths = np.asarray(res.mel_lengths)
        assert np.all(lengths % r == 0) and np.all(lengths >= r)
        for b in range(2):
            np.testing.assert_array_equal(
                np.asarray(res.mel[b, lengths[b]:]), 0.0)


def test_r1_unchanged():
    """r=1 must be bitwise-identical to the pre-reduction-factor path."""
    cfg = Tacotron2Config(n_frames_per_step=1, **BASE)
    params, stats = m.init_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg)
    out, _ = m.forward(params, stats, batch.text, batch.text_lengths,
                       batch.mel, batch.mel_lengths, cfg, training=False)
    assert out.mel.shape == batch.mel.shape
    # sanity: grouped reshape with r=1 is the identity
    assert np.isfinite(np.asarray(out.mel)).all()


def test_non_multiple_t_out_rejected():
    params, stats = m.init_params(jax.random.PRNGKey(0), CFG_R2)
    mels = jnp.zeros((1, 7, 8))
    memory = jnp.zeros((1, 4, 16))
    with pytest.raises(ValueError, match="multiple"):
        m.decode_teacher_forced(params, memory, jnp.asarray([4]), mels,
                                CFG_R2, training=False)
