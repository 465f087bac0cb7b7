"""LSTM primitives: fused cell, time scans, length-aware BiLSTM.

TPU-native replacement for the reference's cuDNN LSTM surface
(nn.LSTMCell at /root/reference/model.py:222,231; packed BiLSTM at
model.py:169-188): a single fused gate matmul per step under ``lax.scan``.
Gate block order matches torch (input, forget, cell, output) so torch
checkpoints map over by transposing the stacked weights.

The bidirectional variant reproduces ``pack_padded_sequence`` semantics
without packing: the reverse pass scans a per-row length-reversed copy of
the sequence, so each row's backward state starts exactly at its own last
valid frame — and outputs beyond each row's length are zeroed, like
``pad_packed_sequence`` emits.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.ops import initializers
from tacotron2_tpu.ops.layers import length_mask

Params = Dict[str, jnp.ndarray]
State = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c)


def lstm_params(key: jax.Array, in_dim: int, hidden_dim: int) -> Params:
    """wi: (in, 4H), wh: (H, 4H), bi/bh: (4H,) — torch layout, transposed."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "wi": initializers.lstm_uniform(k1, (in_dim, 4 * hidden_dim), hidden_dim),
        "wh": initializers.lstm_uniform(k2, (hidden_dim, 4 * hidden_dim), hidden_dim),
        "bi": initializers.lstm_uniform(k3, (4 * hidden_dim,), hidden_dim),
        "bh": initializers.lstm_uniform(k4, (4 * hidden_dim,), hidden_dim),
    }


def lstm_init_state(batch: int, hidden_dim: int, dtype=jnp.float32) -> State:
    zeros = jnp.zeros((batch, hidden_dim), dtype)
    return zeros, zeros


def quantize_lstm_params(params: Params) -> Params:
    """Weight-only int8 serving form of an LSTM cell's parameters.

    The two gate matrices are stacked ([wi; wh], so one kernel call
    streams both) and quantized per output channel; biases are pre-summed.
    ``lstm_cell`` dispatches on the resulting {"w_q","scale","bias"} keys.
    """
    from tacotron2_tpu.kernels.int8_matmul import quantize_int8
    w = jnp.concatenate([params["wi"], params["wh"]], axis=0)
    w_q, scale = quantize_int8(w)
    return {"w_q": w_q, "scale": scale,
            "bias": params["bi"] + params["bh"]}


def _lstm_cell_int8(params: Params, x: jnp.ndarray, state: State) -> State:
    """Quantized-weight cell: int8 weight stream dequantized in-kernel
    (kernels/int8_matmul.py); halves the per-step HBM traffic that bounds
    B=1 autoregressive inference. Inference-only (no VJP)."""
    from tacotron2_tpu.kernels.int8_matmul import int8_matmul
    h, c = state
    xs = jnp.concatenate([x.astype(jnp.float32), h], axis=-1)
    gates = int8_matmul(xs, params["w_q"], params["scale"],
                        interpret=jax.default_backend() == "cpu")
    gates = gates + params["bias"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_h, new_c


def lstm_gates(params: Params, x: jnp.ndarray, h: jnp.ndarray,
               compute_dtype=None) -> jnp.ndarray:
    """Pre-activation gate block (B, 4H): the cell's two matmuls + biases.

    Exposed separately so the custom-VJP decoder scan
    (models/decoder_vjp.py) can save the gate pre-activations and hoist
    the weight-gradient matmuls out of the backward scan."""
    wi, wh = params["wi"], params["wh"]
    pet = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        h = h.astype(compute_dtype)
        wi = wi.astype(compute_dtype)
        wh = wh.astype(compute_dtype)
        pet = compute_dtype  # bf16 out keeps grad transpose well-typed;
        # the fp32 bias-add below upcasts, and (h, c) stay fp32 in the carry
    return (
        jnp.dot(x, wi, preferred_element_type=pet)
        + jnp.dot(h, wh, preferred_element_type=pet)
        + params["bi"] + params["bh"]
    )


def lstm_apply_gates(gates: jnp.ndarray, c: jnp.ndarray) -> State:
    """Elementwise half of the cell: gates (B, 4H) + old c -> (h, c)."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_h, new_c


def lstm_cell(params: Params, x: jnp.ndarray, state: State,
              compute_dtype=None) -> State:
    """One LSTM step. x: (B, in); state: ((B, H), (B, H)).

    One fused matmul computes all four gate blocks; fp32 accumulation.
    Dispatches to the int8 weight-only path when given quantized params
    (``quantize_lstm_params``).
    """
    if "w_q" in params:
        return _lstm_cell_int8(params, x, state)
    h, c = state
    gates = lstm_gates(params, x, h, compute_dtype)
    return lstm_apply_gates(gates, c)


def lstm_scan(params: Params, xs: jnp.ndarray, state: State | None = None,
              compute_dtype=None, unroll: int = 8
              ) -> Tuple[jnp.ndarray, State]:
    """Unidirectional LSTM over time. xs: (B, T, in) -> (B, T, H).

    ``unroll=8`` (round 5, measured): the per-step matmul is small
    (~0.2 GFLOP at B=128), so lax.scan dispatch overhead dominates —
    unrolling cut the encoder fwd+bwd from 13.0 to 10.9 ms on chip.
    MEASURED REFUTATION (round 5): hoisting the input projection out of
    the scan (the cuDNN trick) LOST throughput here — 715.9k (f32
    stack) / 721.3k (bf16 stack) vs 729.5k with the fused per-step
    cell: the materialized (B, T, 4H) projection stack costs more HBM
    traffic than the in-scan matmul costs compute, and XLA overlaps the
    fused matmuls fine at unroll=8. Keep the fused cell.
    """
    B = xs.shape[0]
    H = params["wh"].shape[0]
    if state is None:
        state = lstm_init_state(B, H)

    def step(carry, x_t):
        new_state = lstm_cell(params, x_t, carry, compute_dtype)
        return new_state, new_state[0]

    final, hs = jax.lax.scan(step, state, xs.swapaxes(0, 1),
                             unroll=unroll)
    return hs.swapaxes(0, 1), final


def _reverse_by_length(xs: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each row within its own valid prefix: out[b, t] = xs[b, L_b-1-t]
    for t < L_b (positions past L_b hold clamped junk — callers mask)."""
    T = xs.shape[1]
    t = jnp.arange(T)[None, :]
    idx = jnp.clip(lengths[:, None] - 1 - t, 0, T - 1)
    return jnp.take_along_axis(xs, idx[:, :, None], axis=1)


def bilstm(fwd_params: Params, bwd_params: Params, xs: jnp.ndarray,
           lengths: jnp.ndarray, compute_dtype=None,
           cfg=None) -> jnp.ndarray:
    """Bidirectional LSTM with per-row lengths. (B, T, in) -> (B, T, 2H).

    Matches torch's packed BiLSTM (reference model.py:181-188): the backward
    direction starts from each row's true last frame, and all outputs at
    t >= length are zero.

    With a ``cfg`` whose ``pallas_encoder_lstm`` is on and the shape in
    the kernel envelope, both directions run through the weights-resident
    fused scans (kernels/encoder_lstm.py — round 5: the lax.scan path is
    dispatch-overhead-bound at ~8% MFU); identical length semantics,
    values to bf16 round-off.
    """
    mask = length_mask(lengths, xs.shape[1])[:, :, None]
    xs_rev = _reverse_by_length(xs, lengths)

    use_kernel = False
    if cfg is not None and getattr(cfg, "pallas_encoder_lstm", False) \
            and compute_dtype == jnp.bfloat16 \
            and "w_q" not in fwd_params:
        from tacotron2_tpu.kernels import encoder_lstm
        use_kernel = encoder_lstm.supported(cfg, xs.shape[0]) \
            and fwd_params["wi"].shape[0] == xs.shape[2]
    if use_kernel:
        from tacotron2_tpu.kernels import encoder_lstm
        fwd_out, bwd_scan = encoder_lstm.bilstm_scans(
            fwd_params, bwd_params, xs, xs_rev, cfg)
    else:
        fwd_out, _ = lstm_scan(fwd_params, xs, compute_dtype=compute_dtype)
        bwd_scan, _ = lstm_scan(bwd_params, xs_rev,
                                compute_dtype=compute_dtype)

    bwd_out = _reverse_by_length(bwd_scan, lengths)
    out = jnp.concatenate([fwd_out, bwd_out], axis=-1)
    return jnp.where(mask, out, jnp.zeros_like(out))
