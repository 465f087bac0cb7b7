"""Parameter initializers.

Matches the reference's init scheme so that fresh training runs start from
the same distribution family: Xavier-uniform with per-layer nonlinearity
gains (/root/reference/layers.py:13-15,34-35) and the scaled-uniform
embedding init (/root/reference/model.py:466-468).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# torch.nn.init.calculate_gain values for the nonlinearities used here.
GAINS = {
    "linear": 1.0,
    "sigmoid": 1.0,
    "tanh": 5.0 / 3.0,
    "relu": math.sqrt(2.0),
}


def xavier_uniform(key: jax.Array, shape, fan_in: int, fan_out: int,
                   gain_for: str = "linear",
                   dtype=jnp.float32) -> jnp.ndarray:
    """Glorot-uniform: U(-a, a) with a = gain * sqrt(6 / (fan_in + fan_out))."""
    gain = GAINS[gain_for]
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def dense_init(key: jax.Array, in_dim: int, out_dim: int,
               gain_for: str = "linear", dtype=jnp.float32) -> jnp.ndarray:
    """(in, out) kernel for a dense layer."""
    return xavier_uniform(key, (in_dim, out_dim), in_dim, out_dim,
                          gain_for, dtype)


def conv1d_init(key: jax.Array, kernel_size: int, in_ch: int, out_ch: int,
                gain_for: str = "linear", dtype=jnp.float32) -> jnp.ndarray:
    """(k, in, out) kernel; torch fan counts include the kernel width."""
    fan_in = in_ch * kernel_size
    fan_out = out_ch * kernel_size
    return xavier_uniform(key, (kernel_size, in_ch, out_ch), fan_in, fan_out,
                          gain_for, dtype)


def embedding_init(key: jax.Array, n_symbols: int, dim: int,
                   dtype=jnp.float32) -> jnp.ndarray:
    """U(-v, v) with v = sqrt(3) * sqrt(2 / (n_symbols + dim))."""
    val = math.sqrt(3.0) * math.sqrt(2.0 / (n_symbols + dim))
    return jax.random.uniform(key, (n_symbols, dim), dtype, -val, val)


def lstm_uniform(key: jax.Array, shape, hidden_dim: int,
                 dtype=jnp.float32) -> jnp.ndarray:
    """torch LSTM/LSTMCell default: U(-1/sqrt(H), 1/sqrt(H)) for all params."""
    k = 1.0 / math.sqrt(hidden_dim)
    return jax.random.uniform(key, shape, dtype, -k, k)
