"""Training step tests: loss semantics, gradient flow, overfitting."""

import functools

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models.tacotron2 import ForwardOutput
from tacotron2_tpu.training import (
    Batch, create_train_state, eval_step, tacotron2_loss, train_step,
)
from tacotron2_tpu.training.loss import bce_with_logits

CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=32, encoder_embedding_dim=32,
    encoder_n_convolutions=2, attention_rnn_dim=40, decoder_rnn_dim=48,
    prenet_dim=16, attention_dim=24, attention_location_n_filters=8,
    attention_location_kernel_size=15, postnet_embedding_dim=32,
    postnet_n_convolutions=3, n_mel_channels=20, max_decoder_steps=50,
    batch_size=2, learning_rate=1e-3,
)


def make_batch(B=2, T_in=10, T_out=16, seed=0):
    rng = np.random.RandomState(seed)
    text = rng.randint(1, 148, (B, T_in)).astype(np.int32)
    text_lengths = np.linspace(T_in, max(2, T_in // 2), B).astype(np.int32)
    for b, L in enumerate(text_lengths):
        text[b, L:] = 0
    mel = rng.randn(B, T_out, CFG.n_mel_channels).astype(np.float32) * 0.5
    mel_lengths = np.linspace(T_out, max(4, T_out // 2), B).astype(np.int32)
    gate = np.zeros((B, T_out), np.float32)
    for b, L in enumerate(mel_lengths):
        mel[b, L:] = 0.0
        gate[b, L - 1:] = 1.0  # reference data_utils.py:107
    return Batch(jnp.asarray(text), jnp.asarray(text_lengths),
                 jnp.asarray(mel), jnp.asarray(gate),
                 jnp.asarray(mel_lengths))


class TestLoss:
    def test_bce_matches_torch(self):
        logits = np.random.RandomState(0).randn(50).astype(np.float32) * 3
        targets = (np.random.RandomState(1).rand(50) > 0.5).astype(np.float32)
        expected = torch.nn.BCEWithLogitsLoss(reduction="none")(
            torch.tensor(logits), torch.tensor(targets)).numpy()
        got = np.asarray(bce_with_logits(jnp.asarray(logits),
                                         jnp.asarray(targets)))
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_loss_composition_matches_torch(self):
        """total = MSE(mel) + MSE(postnet) + BCE(gate), means over padded
        tensors (reference loss_function.py:14-19)."""
        rng = np.random.RandomState(2)
        B, T, M = 3, 12, 8
        mel_out = rng.randn(B, T, M).astype(np.float32)
        mel_post = rng.randn(B, T, M).astype(np.float32)
        gate = rng.randn(B, T).astype(np.float32)
        mel_t = rng.randn(B, T, M).astype(np.float32)
        gate_t = (rng.rand(B, T) > 0.7).astype(np.float32)

        expected = (
            torch.nn.MSELoss()(torch.tensor(mel_out), torch.tensor(mel_t))
            + torch.nn.MSELoss()(torch.tensor(mel_post), torch.tensor(mel_t))
            + torch.nn.BCEWithLogitsLoss()(torch.tensor(gate),
                                           torch.tensor(gate_t))
        ).item()

        out = ForwardOutput(jnp.asarray(mel_out), jnp.asarray(mel_post),
                            jnp.asarray(gate), jnp.zeros((B, T, 4)))
        got = tacotron2_loss(out, jnp.asarray(mel_t), jnp.asarray(gate_t))
        np.testing.assert_allclose(float(got.total), expected, rtol=1e-5)

    def test_masked_padding_contributes_zero_numerator(self):
        """Masked outputs (mel=0 vs target=0; gate=1e3 vs target=1) add no
        error mass at padded positions."""
        B, T, M = 1, 4, 2
        mel = jnp.zeros((B, T, M))
        gate = jnp.full((B, T), 1e3)
        out = ForwardOutput(mel, mel, gate, jnp.zeros((B, T, 1)))
        got = tacotron2_loss(out, jnp.zeros((B, T, M)), jnp.ones((B, T)))
        assert float(got.mel) == 0.0
        assert float(got.gate) < 1e-6


class TestTrainStep:
    @pytest.fixture(scope="class")
    def state(self):
        return create_train_state(jax.random.PRNGKey(0), CFG)

    @pytest.mark.slow
    def test_step_updates_params_and_metrics(self, state):
        batch = make_batch()
        step = jax.jit(functools.partial(train_step, cfg=CFG))
        new_state, metrics, _ = step(state, batch, jax.random.PRNGKey(1))
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics.loss))
        assert float(metrics.grad_norm) > 0
        # params actually moved
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            state.params, new_state.params)
        assert max(jax.tree.leaves(diff)) > 0

    @pytest.mark.slow
    def test_all_params_receive_gradients(self, state):
        batch = make_batch()

        def loss_fn(params):
            from tacotron2_tpu.models import tacotron2 as model
            out, _ = model.forward(params, state.stats, batch.text,
                                   batch.text_lengths, batch.mel,
                                   batch.mel_lengths, CFG, training=True,
                                   rng=jax.random.PRNGKey(0))
            return tacotron2_loss(out, batch.mel, batch.gate_target).total

        grads = jax.grad(loss_fn)(state.params)
        zero_grads = [p for p, g in
                      jax.tree_util.tree_leaves_with_path(grads)
                      if float(jnp.abs(g).max()) == 0.0]
        assert not zero_grads, f"dead params: {zero_grads[:5]}"

    def test_eval_step_deterministic(self, state):
        batch = make_batch()
        l1, _ = eval_step(state, batch, CFG)
        l2, _ = eval_step(state, batch, CFG)
        assert float(l1.total) == float(l2.total)

    @pytest.mark.slow
    def test_nonfinite_step_skipped_on_device(self, state):
        """A NaN batch must leave params/opt-state/stats untouched (the
        bf16 analog of the reference's fp16 overflow skip, train.py:228-249)
        while still advancing the step counter, with metrics.applied=0 —
        all decided inside the jitted step, no host sync required."""
        batch = make_batch()
        bad = batch._replace(mel=batch.mel.at[0, 0, 0].set(jnp.nan))
        new_state, metrics, _ = jax.jit(
            functools.partial(train_step, cfg=CFG))(
            state, bad, jax.random.PRNGKey(0))
        assert float(metrics.applied) == 0.0
        assert not np.isfinite(float(metrics.loss))
        assert int(new_state.step) == int(state.step) + 1
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), state.params, new_state.params)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), state.opt_state,
            new_state.opt_state)

        # a clean batch applies
        _, metrics_ok, _ = jax.jit(functools.partial(train_step, cfg=CFG))(
            state, batch, jax.random.PRNGKey(0))
        assert float(metrics_ok.applied) == 1.0

    def test_eval_step_prenet_dropout_rng(self, state):
        """With an rng, eval applies prenet dropout (reference validation
        semantics, model.py:99 + train.py:121) — different keys give
        different losses; the same key is reproducible."""
        batch = make_batch()
        base, _ = eval_step(state, batch, CFG)
        la, _ = eval_step(state, batch, CFG, rng=jax.random.PRNGKey(0))
        lb, _ = eval_step(state, batch, CFG, rng=jax.random.PRNGKey(1))
        la2, _ = eval_step(state, batch, CFG, rng=jax.random.PRNGKey(0))
        assert float(la.total) == float(la2.total)
        assert float(la.total) != float(lb.total)
        assert float(la.total) != float(base.total)

    def test_row_weighted_loss_ignores_duplicates(self, state):
        """Cycled padding rows with weight 0 must drop out of the loss:
        a weighted batch of [real0, real1, dup(real0)] equals the plain
        loss over [real0, real1]."""
        batch = make_batch(B=2)
        dup = jax.tree.map(
            lambda a: jnp.concatenate([a, a[:1]], axis=0), batch._replace(
                row_valid=None))
        dup = dup._replace(row_valid=jnp.asarray([1.0, 1.0, 0.0]))
        l_plain, _ = eval_step(state, batch, CFG)
        l_weighted, _ = eval_step(state, dup, CFG)
        np.testing.assert_allclose(float(l_weighted.total),
                                   float(l_plain.total), rtol=1e-6)

    @pytest.mark.slow
    def test_overfits_single_batch(self, state):
        """The end-to-end learning sanity check (stands in for the
        reference's overfit-subset practice)."""
        batch = make_batch(B=2, T_in=8, T_out=12, seed=3)
        step = jax.jit(functools.partial(train_step, cfg=CFG))
        rng = jax.random.PRNGKey(42)
        s = state
        first = last = None
        for i in range(150):
            s, metrics, _ = step(s, batch, rng)
            if first is None:
                first = float(metrics.loss)
            last = float(metrics.loss)
        assert last < first * 0.6, f"no learning: {first} -> {last}"
