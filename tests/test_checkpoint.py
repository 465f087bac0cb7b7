"""Checkpoint save/resume/warm-start tests."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.training import create_train_state, train_step
from tacotron2_tpu.training.checkpoint import Checkpointer, warm_start

CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=16, encoder_embedding_dim=16,
    encoder_n_convolutions=2, attention_rnn_dim=20, decoder_rnn_dim=24,
    prenet_dim=8, attention_dim=12, attention_location_n_filters=4,
    attention_location_kernel_size=7, postnet_embedding_dim=16,
    postnet_n_convolutions=3, n_mel_channels=8, max_decoder_steps=20,
)


def _tiny_batch(seed=0):
    from tacotron2_tpu.training import Batch
    rng = np.random.RandomState(seed)
    text = rng.randint(1, 148, (2, 6)).astype(np.int32)
    mel = rng.randn(2, 8, CFG.n_mel_channels).astype(np.float32)
    gate = np.zeros((2, 8), np.float32)
    gate[:, -1] = 1.0
    return Batch(jnp.asarray(text), jnp.asarray([6, 4]), jnp.asarray(mel),
                 jnp.asarray(gate), jnp.asarray([8, 6]))


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    step = jax.jit(functools.partial(train_step, cfg=CFG))
    state, _, _ = step(state, _tiny_batch(), jax.random.PRNGKey(1))

    ckpt = Checkpointer(str(tmp_path))
    path = ckpt.save(state, wait=True)
    assert path is not None and path.endswith("checkpoint_1.npz")

    fresh = create_train_state(jax.random.PRNGKey(9), CFG)
    restored = ckpt.restore(fresh)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_resume_continues_identically(tmp_path):
    """Train 3 steps; checkpoint at 2; resume and re-run step 3 -> identical
    params (deterministic resume, reference train.py:196-201)."""
    batch = _tiny_batch()
    rng = jax.random.PRNGKey(5)
    step = jax.jit(functools.partial(train_step, cfg=CFG))

    state = create_train_state(jax.random.PRNGKey(0), CFG)
    ckpt = Checkpointer(str(tmp_path))
    for i in range(2):
        state, _, _ = step(state, batch, rng)
    ckpt.save(state, wait=True)
    state_after3, _, _ = step(state, batch, rng)

    resumed = ckpt.restore(create_train_state(jax.random.PRNGKey(7), CFG))
    resumed_after3, _, _ = step(resumed, batch, rng)
    for a, b in zip(jax.tree.leaves(state_after3.params),
                    jax.tree.leaves(resumed_after3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_and_gc(tmp_path):
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    ckpt = Checkpointer(str(tmp_path), keep=2)
    for step_num in (1, 2, 3):
        state = state._replace(step=jnp.asarray(step_num, jnp.int32))
        ckpt.save(state, wait=True)
    ckpts = ckpt.all_checkpoints()
    assert len(ckpts) == 2
    assert ckpt.latest().endswith("checkpoint_3.npz")


def test_warm_start_ignores_embedding(tmp_path):
    """Default ignore list keeps the fresh embedding (new symbol set) but
    transfers everything else (reference train.py:84-96)."""
    donor = create_train_state(jax.random.PRNGKey(0), CFG)
    fresh = create_train_state(jax.random.PRNGKey(1), CFG)
    merged = warm_start(fresh.params, donor.params, ["embedding"])
    np.testing.assert_array_equal(np.asarray(merged["embedding"]),
                                  np.asarray(fresh.params["embedding"]))
    np.testing.assert_array_equal(
        np.asarray(merged["decoder"]["gate"]["kernel"]),
        np.asarray(donor.params["decoder"]["gate"]["kernel"]))


def test_warm_start_tolerates_missing_keys():
    donor = {"decoder": {"gate": {"kernel": np.ones((2, 1))}}}
    fresh = {"embedding": np.zeros((4, 2)),
             "decoder": {"gate": {"kernel": np.zeros((2, 1)),
                                  "bias": np.zeros((1,))}}}
    merged = warm_start(fresh, donor, [])
    np.testing.assert_array_equal(merged["decoder"]["gate"]["kernel"],
                                  np.ones((2, 1)))
    np.testing.assert_array_equal(merged["decoder"]["gate"]["bias"],
                                  np.zeros((1,)))
