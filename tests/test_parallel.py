"""Sharded training tests on the 8-virtual-CPU-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.parallel import (
    MODEL_AXIS, create_mesh, create_sharded_state, make_eval_step,
    make_train_step, tree_pspecs,
)
from tacotron2_tpu.training import Batch, create_train_state, train_step

CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=32, encoder_embedding_dim=32,
    encoder_n_convolutions=2, attention_rnn_dim=40, decoder_rnn_dim=48,
    prenet_dim=16, attention_dim=24, attention_location_n_filters=8,
    attention_location_kernel_size=15, postnet_embedding_dim=32,
    postnet_n_convolutions=3, n_mel_channels=16, max_decoder_steps=50,
    compute_dtype="float32",  # layout-equivalence at fp32 tolerance
)


def make_batch(B=8, T_in=10, T_out=16, seed=0):
    rng = np.random.RandomState(seed)
    text = rng.randint(1, 148, (B, T_in)).astype(np.int32)
    text_lengths = np.full((B,), T_in, np.int32)
    text_lengths[B // 2:] = T_in - 3
    for b, L in enumerate(text_lengths):
        text[b, L:] = 0
    mel = rng.randn(B, T_out, CFG.n_mel_channels).astype(np.float32) * 0.5
    mel_lengths = np.full((B,), T_out, np.int32)
    mel_lengths[B // 2:] = T_out - 5
    gate = np.zeros((B, T_out), np.float32)
    for b, L in enumerate(mel_lengths):
        mel[b, L:] = 0.0
        gate[b, L - 1:] = 1.0
    return Batch(jnp.asarray(text), jnp.asarray(text_lengths),
                 jnp.asarray(mel), jnp.asarray(gate),
                 jnp.asarray(mel_lengths))


def test_eight_virtual_devices():
    assert jax.device_count() == 8


class TestMesh:
    def test_default_mesh(self):
        mesh = create_mesh()
        assert mesh.shape == {"dp": 8, "mp": 1}

    def test_2d_mesh(self):
        mesh = create_mesh((4, 2))
        assert mesh.shape == {"dp": 4, "mp": 2}

    def test_subset_mesh_allowed(self):
        mesh = create_mesh((3, 2))
        assert mesh.shape == {"dp": 3, "mp": 2}

    def test_oversized_shape_rejected(self):
        with pytest.raises(ValueError):
            create_mesh((16, 1))


class TestShardingRules:
    def test_mp1_all_replicated(self):
        mesh = create_mesh((8, 1))
        state = create_train_state(jax.random.PRNGKey(0), CFG)
        specs = jax.tree.leaves(tree_pspecs(state.params, mesh))
        assert all(s == P() for s in specs)

    def test_mp2_shards_wide_kernels(self):
        mesh = create_mesh((4, 2))
        state = create_train_state(jax.random.PRNGKey(0), CFG)
        pspecs = tree_pspecs(state.params, mesh)
        assert pspecs["embedding"] == P(None, MODEL_AXIS)
        assert (pspecs["decoder"]["attention_rnn"]["wi"]
                == P(None, MODEL_AXIS))
        # biases stay replicated
        assert pspecs["decoder"]["projection"]["bias"] == P()


@pytest.mark.slow
class TestShardedTraining:
    def test_dp_step_runs_and_matches_single_device(self):
        """Data-parallel sharded step must equal the unsharded step."""
        mesh = create_mesh((8, 1))
        batch = make_batch(B=8)
        rng = jax.random.PRNGKey(7)

        state_sharded = create_sharded_state(jax.random.PRNGKey(0), CFG, mesh)
        sharded_step = make_train_step(CFG, mesh, state_sharded)
        new_sharded, metrics_sharded = sharded_step(state_sharded, batch, rng)

        state_single = create_train_state(jax.random.PRNGKey(0), CFG)
        new_single, metrics_single, _ = jax.jit(
            lambda s, b, r: train_step(s, b, r, CFG))(state_single, batch, rng)

        np.testing.assert_allclose(float(metrics_sharded.loss),
                                   float(metrics_single.loss), rtol=2e-5)
        # spot-check a parameter leaf after update
        a = np.asarray(new_sharded.params["decoder"]["gate"]["kernel"])
        b = np.asarray(new_single.params["decoder"]["gate"]["kernel"])
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_tp_step_runs_and_matches(self):
        """(dp=4, mp=2) tensor-sharded step: same math, different layout."""
        mesh = create_mesh((4, 2))
        batch = make_batch(B=8)
        rng = jax.random.PRNGKey(7)

        state_sharded = create_sharded_state(jax.random.PRNGKey(0), CFG, mesh)
        sharded_step = make_train_step(CFG, mesh, state_sharded)
        _, metrics = sharded_step(state_sharded, batch, rng)

        state_single = create_train_state(jax.random.PRNGKey(0), CFG)
        _, expected, _ = jax.jit(
            lambda s, b, r: train_step(s, b, r, CFG))(state_single, batch, rng)
        np.testing.assert_allclose(float(metrics.loss),
                                   float(expected.loss), rtol=2e-5)

    def test_dp_step_custom_vjp_decoder(self):
        """The custom-VJP decoder scan (models/decoder_vjp.py) composes
        with the GSPMD-sharded train step and matches the autodiff path."""
        cfg = CFG.replace(custom_vjp_decoder=True)
        cfg_ref = CFG.replace(custom_vjp_decoder=False)
        mesh = create_mesh((8, 1))
        batch = make_batch(B=8)
        rng = jax.random.PRNGKey(7)

        state = create_sharded_state(jax.random.PRNGKey(0), cfg, mesh)
        step = make_train_step(cfg, mesh, state)
        new_state, metrics = step(state, batch, rng)

        state_ref = create_train_state(jax.random.PRNGKey(0), cfg_ref)
        _, expected, _ = jax.jit(
            lambda s, b, r: train_step(s, b, r, cfg_ref))(
                state_ref, batch, rng)
        np.testing.assert_allclose(float(metrics.loss),
                                   float(expected.loss), rtol=2e-5)
        np.testing.assert_allclose(float(metrics.grad_norm),
                                   float(expected.grad_norm), rtol=2e-4)

    def test_eval_step_sharded(self):
        mesh = create_mesh((8, 1))
        batch = make_batch(B=8)
        state = create_sharded_state(jax.random.PRNGKey(0), CFG, mesh)
        eval_fn = make_eval_step(CFG, mesh, state)
        breakdown, output = eval_fn(state, batch)
        assert np.isfinite(float(breakdown.total))
        assert output.mel.shape == (8, 16, CFG.n_mel_channels)


@pytest.mark.slow
def test_dp_step_kernel_bf16_matches_single_device():
    """bf16 sharded step WITH the Pallas training-scan kernels engaged
    (fwd + bwd, interpret lowering) must match the single-device step
    running the same kernel program — GSPMD partitioning of the
    Mosaic calls may not change the math (VERDICT r4 #2). The fp32
    tests above cover layout equivalence of the XLA path; this covers
    the kernel path at bf16 tolerance."""
    from tacotron2_tpu.kernels import train_scan

    cfg = Tacotron2Config(
        n_symbols=40, symbols_embedding_dim=128, encoder_embedding_dim=128,
        encoder_n_convolutions=1, attention_rnn_dim=128, decoder_rnn_dim=128,
        prenet_dim=128, attention_dim=128, attention_location_n_filters=4,
        attention_location_kernel_size=7, n_mel_channels=16,
        compute_dtype="bfloat16", custom_vjp_decoder=True,
        pallas_train_scan=True, pallas_train_scan_bwd=True,
        batch_size=64, mesh_shape=(8, 1))
    T_in, T_out = 16, 8
    assert train_scan.supported(cfg, T_in, cfg.batch_size)
    assert train_scan.bwd_supported(cfg, T_in, cfg.batch_size)
    batch = make_batch(B=64, T_in=T_in, T_out=T_out)
    # gate targets in make_batch index n_symbols=148; clamp text ids
    batch = batch._replace(text=jnp.clip(batch.text, 0, cfg.n_symbols - 1))
    rng = jax.random.PRNGKey(7)

    mesh = create_mesh((8, 1))
    state_sharded = create_sharded_state(jax.random.PRNGKey(0), cfg, mesh)
    sharded_step = make_train_step(cfg, mesh, state_sharded)
    new_sharded, metrics_sharded = sharded_step(state_sharded, batch, rng)

    state_single = create_train_state(jax.random.PRNGKey(0), cfg)
    new_single, metrics_single, _ = jax.jit(
        lambda s, b, r: train_step(s, b, r, cfg))(state_single, batch, rng)

    np.testing.assert_allclose(float(metrics_sharded.loss),
                               float(metrics_single.loss), rtol=1e-3)
    a = np.asarray(new_sharded.params["decoder"]["gate"]["kernel"])
    b = np.asarray(new_single.params["decoder"]["gate"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-4)
