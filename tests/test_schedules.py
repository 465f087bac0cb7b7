"""Learning-rate schedule tests."""

import numpy as np

from tacotron2_tpu.training.schedules import (
    constant, exponential_decay, piecewise, warmup_exponential,
)


def test_constant():
    s = constant(1e-3)
    assert s(0) == s(10_000) == 1e-3


def test_exponential_decay():
    s = exponential_decay(1.0, decay_rate=0.5, decay_steps=100)
    assert s(0) == 1.0
    np.testing.assert_allclose(s(100), 0.5)
    np.testing.assert_allclose(s(200), 0.25)


def test_exponential_staircase_and_floor():
    s = exponential_decay(1.0, 0.1, 10, staircase=True, min_lr=0.05)
    assert s(9) == 1.0
    np.testing.assert_allclose(s(10), 0.1)
    assert s(1000) == 0.05  # floored


def test_warmup():
    s = warmup_exponential(1.0, warmup_steps=10)
    np.testing.assert_allclose(s(0), 0.1)
    np.testing.assert_allclose(s(4), 0.5)
    assert s(10) == 1.0
    assert s(50) == 1.0  # decay_rate default 1.0 = flat after warmup


def test_piecewise():
    s = piecewise([(0, 1e-3), (1000, 5e-4), (2000, 1e-4)])
    assert s(500) == 1e-3
    assert s(1000) == 5e-4
    assert s(5000) == 1e-4
