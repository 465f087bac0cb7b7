"""NN primitives: dense/conv/batchnorm/dropout, LSTM scans, initializers."""

from tacotron2_tpu.ops.layers import (
    batchnorm, batchnorm_params, batchnorm_stats, conv1d, conv1d_params,
    dense, dense_params, dropout, length_mask,
)
from tacotron2_tpu.ops.lstm import (
    bilstm, lstm_cell, lstm_init_state, lstm_params, lstm_scan,
)

__all__ = [
    "dense", "dense_params", "conv1d", "conv1d_params", "batchnorm",
    "batchnorm_params", "batchnorm_stats", "dropout", "length_mask",
    "lstm_cell", "lstm_init_state", "lstm_params", "lstm_scan", "bilstm",
]
