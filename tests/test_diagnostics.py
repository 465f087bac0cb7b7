"""Alignment/gate diagnostic metric tests."""

import numpy as np

from tacotron2_tpu.training.diagnostics import (
    alignment_diagnostics, gate_accuracy,
)


def _one_hot_path(path, T_in):
    a = np.zeros((len(path), T_in), np.float32)
    a[np.arange(len(path)), path] = 1.0
    return a


def test_perfect_diagonal():
    T_out, T_in = 20, 10
    path = np.round(np.linspace(0, T_in - 1, T_out)).astype(int)
    a = _one_hot_path(path, T_in)[None]
    d = alignment_diagnostics(a, np.array([T_in]), np.array([T_out]))
    assert d["alignment/sharpness"] == 1.0
    assert d["alignment/monotonicity"] == 1.0
    assert d["alignment/coverage"] == 1.0
    assert d["alignment/diagonal_deviation"] < 0.06


def test_collapsed_attention_scores_poorly():
    T_out, T_in = 20, 10
    a = _one_hot_path(np.zeros(T_out, int), T_in)[None]  # stuck at pos 0
    d = alignment_diagnostics(a, np.array([T_in]), np.array([T_out]))
    assert d["alignment/coverage"] == 0.1
    assert d["alignment/diagonal_deviation"] > 0.3


def test_diffuse_attention_low_sharpness():
    a = np.full((1, 10, 8), 1.0 / 8, np.float32)
    d = alignment_diagnostics(a, np.array([8]), np.array([10]))
    assert d["alignment/sharpness"] < 0.2


def test_gate_accuracy():
    energies = np.array([[-5.0, -5.0, 5.0, 99.0]])
    targets = np.array([[0.0, 0.0, 1.0, 1.0]])
    d = gate_accuracy(energies, targets, np.array([3]))  # last frame padded
    assert d["gate/accuracy"] == 1.0
    d2 = gate_accuracy(-energies, targets, np.array([3]))
    assert d2["gate/accuracy"] < 0.5
