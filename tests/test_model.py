"""Tacotron 2 model tests: shapes, masking invariants, decoding semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models import tacotron2 as m

# Small config for fast CPU tests — same topology, narrow layers.
CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=32, encoder_embedding_dim=32,
    encoder_n_convolutions=2, attention_rnn_dim=40, decoder_rnn_dim=48,
    prenet_dim=16, attention_dim=24, attention_location_n_filters=8,
    attention_location_kernel_size=15, postnet_embedding_dim=32,
    postnet_n_convolutions=3, n_mel_channels=20, max_decoder_steps=50,
    compute_dtype="float32",  # fp32 parity (bf16 is the r3 default)
)


@pytest.fixture(scope="module")
def params_stats():
    return m.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    B, T_in, T_out = 4, 12, 18
    text = rng.randint(1, 148, (B, T_in))
    text_lengths = np.array([12, 10, 7, 5])
    for b, L in enumerate(text_lengths):
        text[b, L:] = 0
    mels = rng.randn(B, T_out, CFG.n_mel_channels).astype(np.float32)
    output_lengths = np.array([18, 15, 11, 8])
    for b, L in enumerate(output_lengths):
        mels[b, L:] = 0.0
    return (jnp.asarray(text), jnp.asarray(text_lengths), jnp.asarray(mels),
            jnp.asarray(output_lengths))


class TestInit:
    def test_param_shapes(self, params_stats):
        params, stats = params_stats
        assert params["embedding"].shape == (148, 32)
        assert params["decoder"]["projection"]["kernel"].shape == (48 + 32, 20)
        assert params["decoder"]["gate"]["kernel"].shape == (48 + 32, 1)
        assert len(params["encoder"]["convs"]) == 2
        assert len(params["postnet"]["convs"]) == 3
        assert params["postnet"]["convs"][-1]["conv"]["kernel"].shape == (5, 32, 20)

    @pytest.mark.slow
    def test_param_count_full_size(self):
        """Full-size model must have the reference's ~28.2M parameters."""
        params, _ = m.init_params(jax.random.PRNGKey(0), Tacotron2Config())
        n = sum(x.size for x in jax.tree.leaves(params))
        assert 28.0e6 < n < 28.4e6, f"got {n/1e6:.2f}M params"


class TestEncoder:
    def test_shapes_and_padding_zeroed(self, params_stats, batch):
        params, stats = params_stats
        text, text_lengths, _, _ = batch
        memory, _ = m.encode(params, stats, text, text_lengths, CFG,
                             training=False)
        assert memory.shape == (4, 12, 32)
        # BiLSTM outputs beyond each row's length are exactly zero
        for b, L in enumerate(np.asarray(text_lengths)):
            np.testing.assert_array_equal(np.asarray(memory[b, L:]), 0.0)

    def test_padding_independence(self, params_stats, batch):
        """Row results must not depend on what's in the padding (the packed
        BiLSTM guarantee, reference model.py:181-188)."""
        params, stats = params_stats
        text, text_lengths, _, _ = batch
        memory1, _ = m.encode(params, stats, text, text_lengths, CFG,
                              training=False)
        text2 = np.asarray(text).copy()
        text2[2, 7:] = 99  # garbage in padding of row 2 (length 7)
        memory2, _ = m.encode(params, stats, jnp.asarray(text2), text_lengths,
                              CFG, training=False)
        # conv has receptive field k=5 per layer; with 2 layers the last ~4
        # valid frames see padding — compare the clearly-interior frames and
        # note conv DOES leak pad values (reference has the same property:
        # its convs run before packing).
        np.testing.assert_allclose(np.asarray(memory1[0]),
                                   np.asarray(memory2[0]), atol=1e-6)


class TestTeacherForcedDecoder:
    def test_output_shapes(self, params_stats, batch):
        params, stats = params_stats
        text, text_lengths, mels, out_lengths = batch
        out, new_stats = m.forward(params, stats, text, text_lengths, mels,
                                   out_lengths, CFG, training=False)
        assert out.mel.shape == (4, 18, 20)
        assert out.mel_postnet.shape == (4, 18, 20)
        assert out.gate_energies.shape == (4, 18)
        assert out.alignments.shape == (4, 18, 12)

    def test_alignment_rows_are_distributions(self, params_stats, batch):
        params, stats = params_stats
        text, text_lengths, mels, out_lengths = batch
        out, _ = m.forward(params, stats, text, text_lengths, mels,
                           out_lengths, CFG, training=False)
        sums = np.asarray(out.alignments.sum(-1))
        np.testing.assert_allclose(sums, 1.0, atol=1e-5)
        # attention never assigns weight to padded memory positions
        align = np.asarray(out.alignments)
        for b, L in enumerate(np.asarray(text_lengths)):
            np.testing.assert_allclose(align[b, :, L:], 0.0, atol=1e-7)

    def test_output_masking(self, params_stats, batch):
        params, stats = params_stats
        text, text_lengths, mels, out_lengths = batch
        out, _ = m.forward(params, stats, text, text_lengths, mels,
                           out_lengths, CFG, training=False)
        for b, L in enumerate(np.asarray(out_lengths)):
            np.testing.assert_array_equal(np.asarray(out.mel[b, L:]), 0.0)
            np.testing.assert_array_equal(
                np.asarray(out.gate_energies[b, L:]), 1e3)

    def test_scan_matches_stepwise_loop(self, params_stats, batch):
        """The lax.scan decoder must equal an explicit python step loop."""
        params, stats = params_stats
        text, text_lengths, mels, _ = batch
        memory, _ = m.encode(params, stats, text, text_lengths, CFG,
                             training=False)
        got_mel, got_gate, got_align = m.decode_teacher_forced(
            params, memory, text_lengths, mels, CFG, training=False)

        # explicit loop
        dp = params["decoder"]
        from tacotron2_tpu.ops.layers import dense, length_mask
        B, T_out, n_mels = mels.shape
        go = jnp.zeros((B, 1, n_mels))
        dec_in = jnp.concatenate([go, mels[:, :-1]], axis=1)
        prenet_out = m.prenet_apply(dp["prenet"], dec_in, None,
                                    deterministic=True)
        # scan path runs prenet with dropout off only when rng is None
        mask = length_mask(text_lengths, memory.shape[1])
        pmem = dense(dp["attention"]["memory"], memory)
        state = m.init_decoder_state(memory, CFG)
        mel_frames = []
        for t in range(T_out):
            state, (mel, gate, align) = m.decoder_step(
                dp, state, prenet_out[:, t], memory, pmem, mask, CFG,
                training=False)
            mel_frames.append(mel)
        expected = jnp.stack(mel_frames, axis=1)
        np.testing.assert_allclose(np.asarray(got_mel), np.asarray(expected),
                                   atol=1e-5)

    def test_deterministic_without_rng(self, params_stats, batch):
        params, stats = params_stats
        text, text_lengths, mels, out_lengths = batch
        o1, _ = m.forward(params, stats, text, text_lengths, mels,
                          out_lengths, CFG, training=False)
        o2, _ = m.forward(params, stats, text, text_lengths, mels,
                          out_lengths, CFG, training=False)
        np.testing.assert_array_equal(np.asarray(o1.mel_postnet),
                                      np.asarray(o2.mel_postnet))

    @pytest.mark.slow
    def test_training_dropout_changes_output(self, params_stats, batch):
        params, stats = params_stats
        text, text_lengths, mels, out_lengths = batch
        o1, _ = m.forward(params, stats, text, text_lengths, mels, out_lengths,
                          CFG, training=True, rng=jax.random.PRNGKey(1))
        o2, _ = m.forward(params, stats, text, text_lengths, mels, out_lengths,
                          CFG, training=True, rng=jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(o1.mel), np.asarray(o2.mel))


class TestAutoregressiveInference:
    def test_batched_gate_latch(self, params_stats, batch):
        params, stats = params_stats
        text, text_lengths, _, _ = batch
        res = m.infer(params, stats, text, text_lengths,
                      CFG.replace(prenet_dropout_at_inference=False))
        B, T, n_mels = res.mel.shape
        assert T == CFG.max_decoder_steps
        assert res.mel_lengths.shape == (B,)
        assert np.all(np.asarray(res.mel_lengths) >= 1)
        # outputs past each row's own length are masked
        for b in range(B):
            L = int(res.mel_lengths[b])
            np.testing.assert_array_equal(np.asarray(res.mel[b, L:]), 0.0)
            np.testing.assert_array_equal(
                np.asarray(res.gate_energies[b, L:]), 1e3)

    def test_prenet_dropout_active_by_default(self, params_stats, batch):
        """Reference quirk: inference prenet dropout stays on (model.py:99)."""
        params, stats = params_stats
        text, text_lengths, _, _ = batch
        r1 = m.infer(params, stats, text, text_lengths, CFG,
                     rng=jax.random.PRNGKey(1))
        r2 = m.infer(params, stats, text, text_lengths, CFG,
                     rng=jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(r1.mel), np.asarray(r2.mel))

    def test_deterministic_mode(self, params_stats, batch):
        params, stats = params_stats
        text, text_lengths, _, _ = batch
        cfg = CFG.replace(prenet_dropout_at_inference=False)
        r1 = m.infer(params, stats, text, text_lengths, cfg)
        r2 = m.infer(params, stats, text, text_lengths, cfg)
        np.testing.assert_array_equal(np.asarray(r1.mel), np.asarray(r2.mel))

    def test_matches_teacher_forcing_one_step(self, params_stats, batch):
        """Step 0 of inference (go-frame input) must equal step 0 of the
        teacher-forced scan — same math, different driver."""
        params, stats = params_stats
        text, text_lengths, mels, _ = batch
        cfg = CFG.replace(prenet_dropout_at_inference=False)
        memory, _ = m.encode(params, stats, text, text_lengths, cfg,
                             training=False)
        tf_mel, _, _ = m.decode_teacher_forced(
            params, memory, text_lengths, mels, cfg, training=False)
        ar_mel, _, _, _ = m.decode_autoregressive(
            params, memory, text_lengths, cfg, max_steps=1)
        np.testing.assert_allclose(np.asarray(ar_mel[:, 0]),
                                   np.asarray(tf_mel[:, 0]), atol=1e-5)
