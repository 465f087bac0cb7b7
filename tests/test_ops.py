"""NN primitive golden tests against torch CPU.

The reference model is built from torch primitives (nn.Linear, nn.Conv1d,
nn.BatchNorm1d, nn.LSTMCell, packed nn.LSTM — /root/reference/layers.py,
model.py). Rather than porting its code, we verify our JAX ops reproduce
those primitives' numerics directly, using torch (CPU) as the oracle.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from tacotron2_tpu.ops import (
    batchnorm, batchnorm_params, batchnorm_stats, bilstm, conv1d, dense,
    dropout, length_mask, lstm_cell, lstm_init_state, lstm_scan,
)
from tacotron2_tpu.ops import initializers
from tacotron2_tpu.ops.lstm import _reverse_by_length

ATOL = 2e-5


def _np(x):
    return np.asarray(x)


class TestDense:
    def test_matches_torch_linear(self):
        torch.manual_seed(0)
        lin = nn.Linear(64, 32)
        x = torch.randn(4, 7, 64)
        expected = lin(x).detach().numpy()

        params = {"kernel": jnp.asarray(lin.weight.detach().numpy().T),
                  "bias": jnp.asarray(lin.bias.detach().numpy())}
        got = _np(dense(params, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, expected, atol=ATOL)

    def test_no_bias(self):
        torch.manual_seed(1)
        lin = nn.Linear(16, 8, bias=False)
        x = torch.randn(5, 16)
        params = {"kernel": jnp.asarray(lin.weight.detach().numpy().T)}
        np.testing.assert_allclose(_np(dense(params, jnp.asarray(x.numpy()))),
                                   lin(x).detach().numpy(), atol=ATOL)


class TestConv1d:
    @pytest.mark.parametrize("k", [1, 5, 31])
    def test_matches_torch_same_padding(self, k):
        torch.manual_seed(k)
        conv = nn.Conv1d(8, 16, kernel_size=k, padding=(k - 1) // 2)
        x = torch.randn(3, 8, 40)  # torch: (B, C, T)
        expected = conv(x).detach().numpy()

        # torch weight (out, in, k) -> ours (k, in, out)
        w = conv.weight.detach().numpy().transpose(2, 1, 0)
        params = {"kernel": jnp.asarray(w),
                  "bias": jnp.asarray(conv.bias.detach().numpy())}
        x_jax = jnp.asarray(x.numpy().transpose(0, 2, 1))  # (B, T, C)
        got = _np(conv1d(params, x_jax)).transpose(0, 2, 1)
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_no_bias(self):
        torch.manual_seed(2)
        conv = nn.Conv1d(2, 32, kernel_size=31, padding=15, bias=False)
        x = torch.randn(2, 2, 50)
        w = conv.weight.detach().numpy().transpose(2, 1, 0)
        params = {"kernel": jnp.asarray(w)}
        got = _np(conv1d(params, jnp.asarray(x.numpy().transpose(0, 2, 1))))
        np.testing.assert_allclose(got.transpose(0, 2, 1),
                                   conv(x).detach().numpy(), atol=1e-4)


class TestBatchNorm:
    def test_train_mode_matches_torch(self):
        torch.manual_seed(3)
        bn = nn.BatchNorm1d(12)
        bn.train()
        x = torch.randn(6, 12, 20)
        expected = bn(x).detach().numpy()

        params = batchnorm_params(12)
        stats = batchnorm_stats(12)
        x_jax = jnp.asarray(x.numpy().transpose(0, 2, 1))
        got, new_stats = batchnorm(params, stats, x_jax, training=True)
        np.testing.assert_allclose(_np(got).transpose(0, 2, 1), expected,
                                   atol=1e-4)
        # running stats follow torch momentum convention (unbiased var)
        np.testing.assert_allclose(_np(new_stats["mean"]),
                                   bn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(_np(new_stats["var"]),
                                   bn.running_var.numpy(), atol=1e-4)

    def test_eval_mode_matches_torch(self):
        torch.manual_seed(4)
        bn = nn.BatchNorm1d(5)
        bn.train()
        for _ in range(3):
            bn(torch.randn(4, 5, 9))
        bn.eval()
        x = torch.randn(2, 5, 9)
        expected = bn(x).detach().numpy()

        params = {"scale": jnp.asarray(bn.weight.detach().numpy()),
                  "offset": jnp.asarray(bn.bias.detach().numpy())}
        stats = {"mean": jnp.asarray(bn.running_mean.numpy()),
                 "var": jnp.asarray(bn.running_var.numpy())}
        got, _ = batchnorm(params, stats,
                           jnp.asarray(x.numpy().transpose(0, 2, 1)),
                           training=False)
        np.testing.assert_allclose(_np(got).transpose(0, 2, 1), expected,
                                   atol=1e-5)


class TestLSTM:
    def _cell_params(self, cell):
        return {
            "wi": jnp.asarray(cell.weight_ih.detach().numpy().T),
            "wh": jnp.asarray(cell.weight_hh.detach().numpy().T),
            "bi": jnp.asarray(cell.bias_ih.detach().numpy()),
            "bh": jnp.asarray(cell.bias_hh.detach().numpy()),
        }

    def test_cell_matches_torch(self):
        torch.manual_seed(5)
        cell = nn.LSTMCell(24, 16)
        x = torch.randn(3, 24)
        h0, c0 = torch.randn(3, 16), torch.randn(3, 16)
        h1, c1 = cell(x, (h0, c0))

        params = self._cell_params(cell)
        got_h, got_c = lstm_cell(params, jnp.asarray(x.numpy()),
                                 (jnp.asarray(h0.numpy()), jnp.asarray(c0.numpy())))
        np.testing.assert_allclose(_np(got_h), h1.detach().numpy(), atol=ATOL)
        np.testing.assert_allclose(_np(got_c), c1.detach().numpy(), atol=ATOL)

    def test_scan_matches_torch_unrolled_cell(self):
        torch.manual_seed(6)
        cell = nn.LSTMCell(10, 8)
        xs = torch.randn(2, 12, 10)
        h = torch.zeros(2, 8)
        c = torch.zeros(2, 8)
        outs = []
        for t in range(12):
            h, c = cell(xs[:, t], (h, c))
            outs.append(h)
        expected = torch.stack(outs, dim=1).detach().numpy()

        params = self._cell_params(cell)
        got, (hT, cT) = lstm_scan(params, jnp.asarray(xs.numpy()))
        np.testing.assert_allclose(_np(got), expected, atol=ATOL)
        np.testing.assert_allclose(_np(hT), h.detach().numpy(), atol=ATOL)

    def test_reverse_by_length(self):
        xs = jnp.arange(12, dtype=jnp.float32).reshape(2, 6, 1)
        lengths = jnp.array([4, 6])
        rev = _reverse_by_length(xs, lengths)
        np.testing.assert_array_equal(_np(rev[0, :4, 0]), [3, 2, 1, 0])
        np.testing.assert_array_equal(_np(rev[1, :, 0]), [11, 10, 9, 8, 7, 6])

    def test_bilstm_matches_torch_packed(self):
        """The key fidelity trap: packed-sequence BiLSTM semantics
        (reference model.py:181-188)."""
        torch.manual_seed(7)
        B, T, D, H = 4, 15, 12, 6
        rnn = nn.LSTM(D, H, 1, batch_first=True, bidirectional=True)
        lengths = torch.tensor([15, 11, 7, 3])
        xs = torch.randn(B, T, D)
        packed = nn.utils.rnn.pack_padded_sequence(xs, lengths, batch_first=True)
        out_packed, _ = rnn(packed)
        expected, _ = nn.utils.rnn.pad_packed_sequence(out_packed,
                                                       batch_first=True)
        expected = expected.detach().numpy()

        fwd = {"wi": jnp.asarray(rnn.weight_ih_l0.detach().numpy().T),
               "wh": jnp.asarray(rnn.weight_hh_l0.detach().numpy().T),
               "bi": jnp.asarray(rnn.bias_ih_l0.detach().numpy()),
               "bh": jnp.asarray(rnn.bias_hh_l0.detach().numpy())}
        bwd = {"wi": jnp.asarray(rnn.weight_ih_l0_reverse.detach().numpy().T),
               "wh": jnp.asarray(rnn.weight_hh_l0_reverse.detach().numpy().T),
               "bi": jnp.asarray(rnn.bias_ih_l0_reverse.detach().numpy()),
               "bh": jnp.asarray(rnn.bias_hh_l0_reverse.detach().numpy())}
        got = _np(bilstm(fwd, bwd, jnp.asarray(xs.numpy()),
                         jnp.asarray(lengths.numpy())))
        np.testing.assert_allclose(got, expected, atol=ATOL)


class TestDropoutAndMask:
    def test_dropout_scaling(self):
        key = jax.random.PRNGKey(0)
        x = jnp.ones((1000, 100))
        y = dropout(key, x, 0.5)
        kept = _np(y) > 0
        assert abs(kept.mean() - 0.5) < 0.02
        np.testing.assert_allclose(_np(y)[kept], 2.0)

    def test_dropout_deterministic(self):
        x = jnp.ones((4, 4))
        np.testing.assert_array_equal(
            _np(dropout(jax.random.PRNGKey(0), x, 0.5, deterministic=True)),
            _np(x))

    def test_length_mask(self):
        m = _np(length_mask(jnp.array([1, 3]), 4))
        np.testing.assert_array_equal(
            m, [[True, False, False, False], [True, True, True, False]])


class TestInitializers:
    def test_xavier_bounds(self):
        key = jax.random.PRNGKey(0)
        w = initializers.dense_init(key, 100, 100, "relu")
        bound = np.sqrt(2.0) * np.sqrt(6.0 / 200)
        assert _np(jnp.abs(w)).max() <= bound
        assert _np(jnp.abs(w)).max() > bound * 0.95

    def test_embedding_bounds(self):
        key = jax.random.PRNGKey(0)
        w = initializers.embedding_init(key, 148, 512)
        val = np.sqrt(3.0) * np.sqrt(2.0 / (148 + 512))
        assert _np(jnp.abs(w)).max() <= val
