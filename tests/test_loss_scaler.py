"""Dynamic loss scaler tests (reference loss_scaler.py:31-80 semantics)."""

import numpy as np

import jax.numpy as jnp

from tacotron2_tpu.training.loss_scaler import (
    apply_or_skip, init_loss_scaler, scale_loss, unscale_and_check,
)


def test_initial_scale():
    s = init_loss_scaler()
    assert float(s.scale) == 2.0 ** 32
    assert float(scale_loss(s, jnp.asarray(2.0))) == 2.0 * 2 ** 32


def test_overflow_halves_and_skips():
    s = init_loss_scaler(1024.0)
    grads = {"w": jnp.asarray([1.0, jnp.inf])}
    _, ok, s2 = unscale_and_check(s, grads)
    assert not bool(ok)
    assert float(s2.scale) == 512.0
    assert int(s2.good_steps) == 0
    # skipped step produces zero updates
    upd = apply_or_skip({"w": jnp.ones(2)}, ok)
    np.testing.assert_array_equal(np.asarray(upd["w"]), 0.0)


def test_window_doubles():
    s = init_loss_scaler(256.0)
    grads = {"w": jnp.ones(3) * 256.0}
    for i in range(3):
        g, ok, s = unscale_and_check(s, grads, scale_window=3)
        assert bool(ok)
    assert float(s.scale) == 512.0
    assert int(s.good_steps) == 0
    np.testing.assert_allclose(np.asarray(g["w"]), 1.0)


def test_unscale_divides_by_scale():
    s = init_loss_scaler(8.0)
    g, ok, _ = unscale_and_check(s, {"w": jnp.asarray([16.0])})
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(g["w"]), 2.0)
