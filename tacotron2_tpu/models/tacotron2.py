"""Tacotron 2, TPU-native.

Functional re-design of the reference model (/root/reference/model.py):

- Parameters are a pytree; every component is a pure function of
  ``(params, inputs, rng)``. Batchnorm running statistics live in a separate
  ``stats`` pytree threaded through training steps.
- The autoregressive decoder is a single fused step function run under
  ``lax.scan`` for teacher forcing (reference: Python while loop,
  model.py:405-411) and under ``lax.while_loop`` with a per-row gate latch
  for inference (reference stops the whole batch on the first gate crossing,
  model.py:443 — here each row stops independently, making inference
  batchable).
- Activations are channels-last ``(B, T, C)``; mel tensors are ``(B, T, 80)``
  throughout (the reference uses ``(B, 80, T)`` — transpose at the boundary
  if exporting).

Fidelity notes (traps from the reference, all preserved):
- prenet dropout is ACTIVE at inference (model.py:99) unless
  ``config.prenet_dropout_at_inference=False``;
- the BiLSTM never reads padding (packed-sequence semantics, model.py:181);
- attention energies at padded positions are masked to -inf before softmax
  (model.py:79-80);
- masked outputs: mel -> 0, gate energy -> 1e3 past each row's mel length
  (model.py:487-497).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.ops import initializers
from tacotron2_tpu.ops.layers import (
    batchnorm, batchnorm_params, batchnorm_stats, conv1d, conv1d_params,
    dense, dense_params, dropout, length_mask,
)
from tacotron2_tpu.ops.lstm import bilstm, lstm_cell, lstm_params

Params = Dict
MASKED_GATE_ENERGY = 1e3  # reference model.py:495


# ======================================================================
# Initialization
# ======================================================================

def init_params(key: jax.Array, cfg: Tacotron2Config) -> Tuple[Params, Params]:
    """Build (params, stats) pytrees with reference-matching init."""
    keys = iter(jax.random.split(key, 64))
    nk = lambda: next(keys)
    e = cfg.encoder_embedding_dim
    a = cfg.attention_rnn_dim
    d = cfg.decoder_rnn_dim
    n_mels = cfg.n_mel_channels * cfg.n_frames_per_step

    params = {
        "embedding": initializers.embedding_init(
            nk(), cfg.n_symbols, cfg.symbols_embedding_dim),
        "encoder": {
            "convs": [
                {"conv": conv1d_params(nk(), cfg.encoder_kernel_size, e, e,
                                       gain_for="relu"),
                 "bn": batchnorm_params(e)}
                for _ in range(cfg.encoder_n_convolutions)
            ],
            "lstm_fwd": lstm_params(nk(), e, e // 2),
            "lstm_bwd": lstm_params(nk(), e, e // 2),
        },
        "decoder": {
            "prenet": [
                dense_params(nk(), n_mels, cfg.prenet_dim, bias=False),
                dense_params(nk(), cfg.prenet_dim, cfg.prenet_dim, bias=False),
            ],
            "attention_rnn": lstm_params(nk(), cfg.prenet_dim + e, a),
            "attention": {
                "query": dense_params(nk(), a, cfg.attention_dim, bias=False,
                                      gain_for="tanh"),
                "memory": dense_params(nk(), e, cfg.attention_dim, bias=False,
                                       gain_for="tanh"),
                "v": dense_params(nk(), cfg.attention_dim, 1, bias=False),
                "location_conv": conv1d_params(
                    nk(), cfg.attention_location_kernel_size, 2,
                    cfg.attention_location_n_filters, bias=False),
                "location_dense": dense_params(
                    nk(), cfg.attention_location_n_filters, cfg.attention_dim,
                    bias=False, gain_for="tanh"),
            },
            "decoder_rnn": lstm_params(nk(), a + e, d),
            "projection": dense_params(nk(), d + e, n_mels),
            "gate": dense_params(nk(), d + e, 1, gain_for="sigmoid"),
        },
        "postnet": _postnet_init(nk, cfg),
    }

    stats = {
        "encoder": {"convs": [batchnorm_stats(e)
                              for _ in range(cfg.encoder_n_convolutions)]},
        "postnet": {"convs": [
            batchnorm_stats(cfg.postnet_embedding_dim
                            if i < cfg.postnet_n_convolutions - 1
                            else cfg.n_mel_channels)
            for i in range(cfg.postnet_n_convolutions)]},
    }
    return params, stats


def _postnet_init(nk, cfg: Tacotron2Config) -> Params:
    """5-layer conv stack: mel->512 (tanh), 512->512 (tanh) x3, 512->mel."""
    p = cfg.postnet_embedding_dim
    k = cfg.postnet_kernel_size
    layers = [{"conv": conv1d_params(nk(), k, cfg.n_mel_channels, p,
                                     gain_for="tanh"),
               "bn": batchnorm_params(p)}]
    for _ in range(cfg.postnet_n_convolutions - 2):
        layers.append({"conv": conv1d_params(nk(), k, p, p, gain_for="tanh"),
                       "bn": batchnorm_params(p)})
    layers.append({"conv": conv1d_params(nk(), k, p, cfg.n_mel_channels,
                                         gain_for="linear"),
                   "bn": batchnorm_params(cfg.n_mel_channels)})
    return {"convs": layers}


# ======================================================================
# Encoder
# ======================================================================

def encode(params: Params, stats: Params, text: jnp.ndarray,
           text_lengths: jnp.ndarray, cfg: Tacotron2Config, *,
           training: bool, rng: Optional[jax.Array] = None,
           compute_dtype=None) -> Tuple[jnp.ndarray, Params]:
    """text (B, T_in) int32 -> encoder memory (B, T_in, 512).

    3x [conv5 -> batchnorm -> relu -> dropout(0.5)] then length-aware BiLSTM
    (reference Encoder, model.py:149-201).
    """
    x = params["embedding"][text]  # (B, T, 512)
    new_conv_stats = []
    for i, layer in enumerate(params["encoder"]["convs"]):
        x = conv1d(layer["conv"], x, compute_dtype=compute_dtype)
        x, s = batchnorm(layer["bn"], stats["encoder"]["convs"][i], x,
                         training=training)
        new_conv_stats.append(s)
        if compute_dtype is not None:
            # keep the post-BN elementwise chain (relu/dropout) in the
            # compute dtype: at f32 it is memory-bound over the full
            # activation tensor (round 5; same finding as the postnet)
            x = x.astype(compute_dtype)
        x = jax.nn.relu(x)
        key = jax.random.fold_in(rng, i) if rng is not None else None
        x = dropout(key, x, 0.5, deterministic=not training)
    memory = bilstm(params["encoder"]["lstm_fwd"], params["encoder"]["lstm_bwd"],
                    x, text_lengths, compute_dtype=compute_dtype, cfg=cfg)
    new_stats = {"encoder": {"convs": new_conv_stats}}
    return memory, new_stats


# ======================================================================
# Decoder
# ======================================================================

class DecoderState(NamedTuple):
    """Explicit carry for the decoder scan — the reference's mutable module
    attributes (model.py:270-289) made functional."""
    att_h: jnp.ndarray       # (B, attention_rnn_dim)
    att_c: jnp.ndarray
    dec_h: jnp.ndarray       # (B, decoder_rnn_dim)
    dec_c: jnp.ndarray
    att_weights: jnp.ndarray      # (B, T_in)
    att_weights_cum: jnp.ndarray  # (B, T_in)
    att_context: jnp.ndarray      # (B, encoder_embedding_dim)


def init_decoder_state(memory: jnp.ndarray, cfg: Tacotron2Config) -> DecoderState:
    B, T_in, e = memory.shape
    f32 = jnp.float32
    return DecoderState(
        att_h=jnp.zeros((B, cfg.attention_rnn_dim), f32),
        att_c=jnp.zeros((B, cfg.attention_rnn_dim), f32),
        dec_h=jnp.zeros((B, cfg.decoder_rnn_dim), f32),
        dec_c=jnp.zeros((B, cfg.decoder_rnn_dim), f32),
        att_weights=jnp.zeros((B, T_in), f32),
        att_weights_cum=jnp.zeros((B, T_in), f32),
        att_context=jnp.zeros((B, e), f32),
    )


def prenet_apply(params: Params, x: jnp.ndarray, rng: Optional[jax.Array],
                 deterministic: bool = False,
                 compute_dtype=None) -> jnp.ndarray:
    """2x [dense -> relu -> dropout(0.5)]. Dropout is active by default even
    at inference — a deliberate reference quirk (model.py:99)."""
    for i, layer in enumerate(params):
        x = jax.nn.relu(dense(layer, x, compute_dtype=compute_dtype))
        key = jax.random.fold_in(rng, i) if rng is not None else None
        x = dropout(key, x, 0.5, deterministic=deterministic)
    return x


def _attention_energies(p: Params, att_hidden: jnp.ndarray,
                        processed_memory: jnp.ndarray,
                        att_weights: jnp.ndarray,
                        att_weights_cum: jnp.ndarray,
                        compute_dtype=None) -> jnp.ndarray:
    """energies = v . tanh(W_q q + W_loc conv([w; w_cum]) + W_m memory)
    (reference model.py:43-63). Split out so the training scan can
    rematerialize it: its (B, T_in, att_dim) tanh residuals are the largest
    per-step activations saved for the backward pass (2x 4 MB/step at
    B=128 vs the ~1 MB of everything else) — recomputing these few small
    ops is cheaper than streaming them to/from HBM."""
    weights_cat = jnp.stack([att_weights, att_weights_cum], axis=-1)  # (B,T,2)
    loc = conv1d(p["location_conv"], weights_cat, compute_dtype=compute_dtype)
    loc = dense(p["location_dense"], loc, compute_dtype=compute_dtype)
    query = dense(p["query"], att_hidden, compute_dtype=compute_dtype)[:, None, :]
    energies = dense(p["v"], jnp.tanh(query + loc + processed_memory),
                     compute_dtype=compute_dtype)[..., 0]  # (B, T_in)
    # softmax and the attention-weight state stay fp32 regardless of the
    # compute dtype — cheap, and keeps the scan carry dtype stable.
    return energies.astype(jnp.float32)


def _attention_weights(p: Params, att_hidden: jnp.ndarray,
                       processed_memory: jnp.ndarray,
                       att_weights: jnp.ndarray,
                       att_weights_cum: jnp.ndarray,
                       mask: Optional[jnp.ndarray],
                       compute_dtype=None,
                       remat_energies: bool = False) -> jnp.ndarray:
    """Masked softmax over the attention energies (reference
    model.py:79-81: masked_fill(-inf) then softmax). The single source of
    truth for the mask-fill value and softmax axis — used by the forward
    (``_attention``) and rematerialized inside the custom-VJP backward
    (models/decoder_vjp.py), which must stay bit-identical to it."""
    energy_fn = (jax.checkpoint(_attention_energies, static_argnums=(5,))
                 if remat_energies else _attention_energies)
    energies = energy_fn(p, att_hidden, processed_memory,
                         att_weights, att_weights_cum, compute_dtype)
    if mask is not None:
        energies = jnp.where(mask, energies, -jnp.inf)
    return jax.nn.softmax(energies, axis=1)


def _attention(p: Params, att_hidden: jnp.ndarray, memory: jnp.ndarray,
               processed_memory: jnp.ndarray, att_weights: jnp.ndarray,
               att_weights_cum: jnp.ndarray, mask: Optional[jnp.ndarray],
               compute_dtype=None,
               remat_energies: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Location-sensitive additive attention (reference model.py:29-86)."""
    weights = _attention_weights(p, att_hidden, processed_memory,
                                 att_weights, att_weights_cum, mask,
                                 compute_dtype, remat_energies)
    if compute_dtype is not None:
        context = jnp.einsum("bt,bte->be", weights.astype(compute_dtype),
                             memory.astype(compute_dtype),
                             preferred_element_type=jnp.float32)
    else:
        context = jnp.einsum("bt,bte->be", weights,
                             memory.astype(jnp.float32))
    return context, weights


def decoder_core(params: Params, state: DecoderState, prenet_out: jnp.ndarray,
                 memory: jnp.ndarray, processed_memory: jnp.ndarray,
                 mask: Optional[jnp.ndarray], cfg: Tacotron2Config, *,
                 training: bool, rng: Optional[jax.Array] = None,
                 compute_dtype=None) -> DecoderState:
    """The sequential part of one decoder frame (reference Decoder.decode,
    model.py:340-379 minus the output heads): attention LSTM -> attention ->
    decoder LSTM. Everything the next step depends on lives in the returned
    state; the mel/gate heads (``decoder_head``) are pure functions of it."""
    dp = params
    cell_input = jnp.concatenate([prenet_out, state.att_context], axis=-1)
    att_h, att_c = lstm_cell(dp["attention_rnn"], cell_input,
                             (state.att_h, state.att_c), compute_dtype)
    if training and rng is not None:
        att_h = dropout(jax.random.fold_in(rng, 0), att_h,
                        cfg.p_attention_dropout)

    att_context, att_weights = _attention(
        dp["attention"], att_h, memory, processed_memory,
        state.att_weights, state.att_weights_cum, mask, compute_dtype,
        remat_energies=training and cfg.remat_attention_energies)
    att_weights_cum = state.att_weights_cum + att_weights

    dec_input = jnp.concatenate([att_h, att_context], axis=-1)
    dec_h, dec_c = lstm_cell(dp["decoder_rnn"], dec_input,
                             (state.dec_h, state.dec_c), compute_dtype)
    if training and rng is not None:
        dec_h = dropout(jax.random.fold_in(rng, 1), dec_h,
                        cfg.p_decoder_dropout)

    return DecoderState(att_h, att_c, dec_h, dec_c,
                        att_weights, att_weights_cum, att_context)


def decoder_head(dp: Params, dec_h: jnp.ndarray, att_context: jnp.ndarray,
                 compute_dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mel projection + stop gate from the decoder LSTM output
    (reference model.py:373-378). Works on any leading batch/time shape, so
    teacher forcing applies it to ALL steps in one batched matmul outside
    the scan — the sequential chain never waits on these heads."""
    proj_input = jnp.concatenate([dec_h, att_context], axis=-1)
    mel_frame = dense(dp["projection"], proj_input, compute_dtype=compute_dtype)
    gate_energy = dense(dp["gate"], proj_input, compute_dtype=compute_dtype)[..., 0]
    return mel_frame, gate_energy


def decoder_step(params: Params, state: DecoderState, prenet_out: jnp.ndarray,
                 memory: jnp.ndarray, processed_memory: jnp.ndarray,
                 mask: Optional[jnp.ndarray], cfg: Tacotron2Config, *,
                 training: bool, rng: Optional[jax.Array] = None,
                 compute_dtype=None,
                 ) -> Tuple[DecoderState, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """One full autoregressive frame (reference Decoder.decode,
    model.py:340-379): core + output heads. Inference paths use this (the
    gate decides stopping per step); teacher forcing scans ``decoder_core``
    and runs ``decoder_head`` once over all steps."""
    new_state = decoder_core(params, state, prenet_out, memory,
                             processed_memory, mask, cfg, training=training,
                             rng=rng, compute_dtype=compute_dtype)
    mel_frame, gate_energy = decoder_head(
        params, new_state.dec_h, new_state.att_context, compute_dtype)
    return new_state, (mel_frame, gate_energy, new_state.att_weights)


def decode_teacher_forced(params: Params, memory: jnp.ndarray,
                          memory_lengths: jnp.ndarray, mels: jnp.ndarray,
                          cfg: Tacotron2Config, *, training: bool,
                          rng: Optional[jax.Array] = None,
                          compute_dtype=None,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Teacher-forced decoding (reference Decoder.forward, model.py:381-416).

    mels: (B, T_out, n_mels) ground-truth frames. Returns
    (mel_outputs (B, T_out, n_mels), gate_energies (B, T_out),
    alignments (B, T_out, T_in)).
    """
    dp = params["decoder"]
    B, T_out, n_mels = mels.shape
    r = cfg.n_frames_per_step
    if T_out % r:
        raise ValueError(f"T_out={T_out} not a multiple of "
                         f"n_frames_per_step={r} (pad in the collate)")
    T_steps = T_out // r
    # Reduction factor r: each decoder step consumes/emits a GROUP of r
    # frames (the reference declares n_frames_per_step but hardcodes r=1,
    # hparams.py:56 "currently only 1 is supported"; here r>1 works and
    # cuts decoder sequential steps by r — see PERFORMANCE.md).
    grouped = mels.reshape(B, T_steps, n_mels * r)
    go = jnp.zeros((B, 1, n_mels * r), mels.dtype)
    # inputs to steps 0..T_steps-1 are [go, group_0, ..., group_{T-2}]
    decoder_inputs = jnp.concatenate([go, grouped[:, :-1]], axis=1)

    prenet_rng = jax.random.fold_in(rng, 100) if rng is not None else None
    prenet_out = prenet_apply(dp["prenet"], decoder_inputs, prenet_rng,
                              deterministic=False,  # always on (model.py:99)
                              compute_dtype=compute_dtype)

    mask = length_mask(memory_lengths, memory.shape[1])
    processed_memory = dense(dp["attention"]["memory"], memory,
                             compute_dtype=compute_dtype)
    state = init_decoder_state(memory, cfg)

    scan_rng = jax.random.fold_in(rng, 200) if rng is not None else None

    if cfg.custom_vjp_decoder:
        from tacotron2_tpu.models import decoder_vjp
        core_params = {
            "attention_rnn": dp["attention_rnn"],
            "attention": {k: dp["attention"][k]
                          for k in ("query", "v", "location_conv",
                                    "location_dense")},
            "decoder_rnn": dp["decoder_rnn"],
        }
        dec_hs, ctxs, aligns = decoder_vjp.core_scan(
            core_params, prenet_out.swapaxes(0, 1), memory,
            processed_memory, mask, scan_rng, cfg, training)
        mel_outputs, gate_energies = decoder_head(dp, dec_hs, ctxs,
                                                  compute_dtype)
        alignments = aligns
    else:
        mel_outputs, gate_energies, alignments = _decode_tf_xla(
            dp, state, prenet_out, memory, processed_memory, mask, cfg,
            training=training, scan_rng=scan_rng,
            compute_dtype=compute_dtype)
    # (T_steps, B, n_mels*r) -> (B, T_out, n_mels); gate/alignment values
    # are per group-step, repeated r times to per-frame resolution
    mel_outputs = mel_outputs.swapaxes(0, 1).reshape(B, T_out, n_mels)
    gate_energies = jnp.repeat(gate_energies.swapaxes(0, 1), r, axis=1)
    alignments = jnp.repeat(alignments.swapaxes(0, 1), r, axis=1)
    return mel_outputs, gate_energies, alignments


def _decode_tf_xla(dp: Params, state: DecoderState, prenet_out: jnp.ndarray,
                   memory: jnp.ndarray, processed_memory: jnp.ndarray,
                   mask: jnp.ndarray, cfg: Tacotron2Config, *,
                   training: bool, scan_rng: Optional[jax.Array],
                   compute_dtype=None,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Plain-autodiff teacher-forced scan (heads in-step); returns
    time-major (T_steps, B, ...) stacks."""
    T_steps = prenet_out.shape[1]

    def step(carry, xs):
        t, prenet_t = xs
        rng_t = (jax.random.fold_in(scan_rng, t)
                 if scan_rng is not None else None)
        new_state, outs = decoder_step(
            dp, carry, prenet_t, memory, processed_memory, mask, cfg,
            training=training, rng=rng_t, compute_dtype=compute_dtype)
        # NOTE: hoisting the mel/gate heads out of the scan (one batched
        # matmul over all steps) was measured SLOWER (219 vs 200 ms/step,
        # PERFORMANCE.md): the wide (T,B,1536) scan-output writes cost more
        # than the two small in-step matmuls they replace.
        return new_state, outs

    if cfg.remat_decoder:
        step = jax.checkpoint(step)
    elif cfg.decoder_remat_policy:
        step = jax.checkpoint(
            step, policy=getattr(jax.checkpoint_policies,
                                 cfg.decoder_remat_policy))

    xs = (jnp.arange(T_steps), prenet_out.swapaxes(0, 1))
    _, (mel_outputs, gate_energies, alignments) = jax.lax.scan(
        step, state, xs, unroll=cfg.decoder_scan_unroll,
        _split_transpose=cfg.decoder_scan_split_transpose)
    return mel_outputs, gate_energies, alignments


class InferenceResult(NamedTuple):
    mel: jnp.ndarray          # (B, T, n_mels) — decoder output
    mel_postnet: jnp.ndarray  # (B, T, n_mels) — decoder + postnet residual
    gate_energies: jnp.ndarray  # (B, T)
    alignments: jnp.ndarray   # (B, T, T_in)
    mel_lengths: jnp.ndarray  # (B,) frames produced per row


def decode_autoregressive(params: Params, memory: jnp.ndarray,
                          memory_lengths: Optional[jnp.ndarray],
                          cfg: Tacotron2Config, *,
                          rng: Optional[jax.Array] = None,
                          max_steps: Optional[int] = None,
                          compute_dtype=None,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched autoregressive inference with per-row gate stopping.

    Unlike the reference (model.py:435-449, which breaks the whole batch on
    the first scalar gate crossing — effectively B=1 only), every row latches
    its own stop at sigmoid(gate) > threshold; the loop exits when all rows
    have stopped or at ``max_decoder_steps``. Static shapes: outputs are
    (B, max_steps, ...) buffers plus per-row lengths.
    """
    dp = params["decoder"]
    B, T_in, _ = memory.shape
    r = cfg.n_frames_per_step
    n_mels = cfg.n_mel_channels * r  # one decoder step emits a group of r
    T_max = max_steps or cfg.max_decoder_steps

    mask = (length_mask(memory_lengths, T_in)
            if memory_lengths is not None else None)
    processed_memory = dense(dp["attention"]["memory"], memory,
                             compute_dtype=compute_dtype)

    mel_buf = jnp.zeros((T_max, B, n_mels), jnp.float32)
    gate_buf = jnp.full((T_max, B), MASKED_GATE_ENERGY, jnp.float32)
    align_buf = jnp.zeros((T_max, B, T_in), jnp.float32)

    init = (0,
            init_decoder_state(memory, cfg),
            jnp.zeros((B, n_mels), jnp.float32),   # previous mel frame
            jnp.zeros((B,), bool),                  # finished latch
            jnp.zeros((B,), jnp.int32),             # per-row length
            mel_buf, gate_buf, align_buf)

    prenet_deterministic = not cfg.prenet_dropout_at_inference or rng is None

    def cond(carry):
        t, _, _, finished, *_ = carry
        return jnp.logical_and(t < T_max, ~jnp.all(finished))

    def body(carry):
        t, state, prev_mel, finished, lengths, mels, gates, aligns = carry
        step_rng = (jax.random.fold_in(rng, t) if rng is not None else None)
        prenet_out = prenet_apply(dp["prenet"], prev_mel, step_rng,
                                  deterministic=prenet_deterministic,
                                  compute_dtype=compute_dtype)
        state, (mel, gate, align) = decoder_step(
            dp, state, prenet_out, memory, processed_memory, mask, cfg,
            training=False, rng=None, compute_dtype=compute_dtype)

        mels = mels.at[t].set(jnp.where(finished[:, None], 0.0, mel))
        gates = gates.at[t].set(jnp.where(finished, MASKED_GATE_ENERGY, gate))
        aligns = aligns.at[t].set(jnp.where(finished[:, None], 0.0, align))

        # reference semantics: the crossing frame IS emitted, then stop
        lengths = jnp.where(finished, lengths, t + 1)
        finished = jnp.logical_or(
            finished, jax.nn.sigmoid(gate) > cfg.gate_threshold)
        return (t + 1, state, mel, finished, lengths, mels, gates, aligns)

    (_, _, _, _, lengths, mel_buf, gate_buf, align_buf) = jax.lax.while_loop(
        cond, body, init)

    # ungroup to per-frame resolution: (T_max, B, n_mels*r) ->
    # (B, T_max*r, n_mels); gate/alignments repeat within each group;
    # lengths are decoder steps -> frames
    mel_frames = (mel_buf.swapaxes(0, 1)
                  .reshape(B, T_max * r, cfg.n_mel_channels))
    gate_frames = jnp.repeat(gate_buf.swapaxes(0, 1), r, axis=1)
    align_frames = jnp.repeat(align_buf.swapaxes(0, 1), r, axis=1)
    return mel_frames, gate_frames, align_frames, lengths * r


def infer_fused(params: Params, stats: Params, text: jnp.ndarray,
                text_lengths: jnp.ndarray, cfg: Tacotron2Config, *,
                packed=None, max_steps: Optional[int] = None,
                chunk_steps: int = 64,
                compute_dtype=None,
                rng: Optional[jax.Array] = None) -> "InferenceResult":
    """``infer`` through the fused Pallas decoder chunk kernel
    (kernels/decoder_step.py) — B=1; ~4.5x the XLA decode at B=1
    (PERFORMANCE.md). ``packed`` is the reusable ``pack_decoder_params``
    result (built on the fly if omitted; pass it in for serving so the
    packing cost is paid once). ``rng`` + prenet_dropout_at_inference
    reproduce the reference's inference-time prenet dropout
    (model.py:99) inside the kernel via streamed keep masks (round 3);
    rng=None runs the deterministic prenet, like ``infer`` with rng=None.
    """
    from tacotron2_tpu.kernels import decoder_step as ds
    if compute_dtype is None:
        compute_dtype = cfg.jax_compute_dtype
    kdtype = compute_dtype or jnp.float32
    if packed is None:
        packed = ds.pack_decoder_params(params, cfg, dtype=kdtype)
    interpret = jax.default_backend() == "cpu"
    if not cfg.prenet_dropout_at_inference:
        rng = None
    # same key derivation as ``infer`` (split -> (enc_rng, pre_rng)), so
    # the fused path reproduces infer's dropout stream for the same seed
    pre_rng = jax.random.split(rng)[1] if rng is not None else None

    memory, _ = encode(params, stats, text, text_lengths, cfg,
                       training=False, rng=None,
                       compute_dtype=compute_dtype)
    processed = dense(params["decoder"]["attention"]["memory"], memory,
                      compute_dtype=compute_dtype)
    mask = length_mask(text_lengths, memory.shape[1])
    mel, gate_energies, alignments, mel_lengths = \
        ds.decode_autoregressive_fused(
            packed, memory, processed, mask, cfg, max_steps=max_steps,
            chunk_steps=chunk_steps, dtype=kdtype, interpret=interpret,
            rng=pre_rng)
    residual, _ = postnet_apply(params, stats, mel, cfg, training=False,
                                rng=None, compute_dtype=compute_dtype)
    mel_postnet = mel + residual
    mel, mel_postnet, gate_energies = mask_outputs(
        mel, mel_postnet, gate_energies, mel_lengths)
    return InferenceResult(mel, mel_postnet, gate_energies, alignments,
                           mel_lengths)


def infer_batch_fused(params: Params, stats: Params, text: jnp.ndarray,
                      text_lengths: jnp.ndarray, cfg: Tacotron2Config, *,
                      packed=None, max_steps: Optional[int] = None,
                      chunk_steps: int = 64, compute_dtype=None,
                      rng: Optional[jax.Array] = None) -> "InferenceResult":
    """``infer`` through the BATCHED fused Pallas decoder
    (kernels/decoder_batch.py) — up to 32 rows (round 5; sublane tiles
    of 8) decode together with every decoder weight VMEM-resident;
    measured 2.1x the XLA batched decode at B=8 (PERFORMANCE.md round
    3; B=16/32 rows in BENCH_DETAILS round5_batch_serving). Same
    contract as ``infer``;
    ``packed`` is the reusable ``pack_batch_decoder_params`` result.
    ``rng`` + prenet_dropout_at_inference reproduce the reference's
    inference-time prenet dropout (model.py:99) per row.
    """
    from tacotron2_tpu.kernels import decoder_batch as db
    if compute_dtype is None:
        compute_dtype = cfg.jax_compute_dtype
    kdtype = compute_dtype or jnp.float32
    if packed is None:
        packed = db.pack_batch_decoder_params(params, cfg, dtype=kdtype)
    interpret = jax.default_backend() == "cpu"
    if not cfg.prenet_dropout_at_inference:
        rng = None
    # same key derivation as ``infer`` (split -> (enc_rng, pre_rng))
    pre_rng = jax.random.split(rng)[1] if rng is not None else None

    memory, _ = encode(params, stats, text, text_lengths, cfg,
                       training=False, rng=None,
                       compute_dtype=compute_dtype)
    processed = dense(params["decoder"]["attention"]["memory"], memory,
                      compute_dtype=compute_dtype)
    mask = length_mask(text_lengths, memory.shape[1])
    mel, gate_energies, alignments, mel_lengths = \
        db.decode_autoregressive_batch(
            packed, memory, processed, mask, cfg, max_steps=max_steps,
            chunk_steps=chunk_steps, dtype=kdtype, interpret=interpret,
            rng=pre_rng)
    residual, _ = postnet_apply(params, stats, mel, cfg, training=False,
                                rng=None, compute_dtype=compute_dtype)
    mel_postnet = mel + residual
    mel, mel_postnet, gate_energies = mask_outputs(
        mel, mel_postnet, gate_energies, mel_lengths)
    return InferenceResult(mel, mel_postnet, gate_energies, alignments,
                           mel_lengths)


def quantize_for_serving(params: Params) -> Params:
    """int8 weight-only serving form of the model parameters.

    Quantizes the two decoder LSTM cells — 35.7 of the ~36 MB/step weight
    stream that bounds B=1 inference (PERFORMANCE.md roofline) — leaving
    everything else (projections, attention, encoder: run once per
    utterance or tiny) in full precision. The result drops into every
    inference entry point (infer / decode_autoregressive / decode_chunk /
    serving); training paths reject it (no VJP for the int8 kernel).
    """
    from tacotron2_tpu.ops.lstm import quantize_lstm_params
    dp = dict(params["decoder"])
    dp["attention_rnn"] = quantize_lstm_params(dp["attention_rnn"])
    dp["decoder_rnn"] = quantize_lstm_params(dp["decoder_rnn"])
    out = dict(params)
    out["decoder"] = dp
    return out


class StreamCarry(NamedTuple):
    """Resumable autoregressive decoder state for chunked (streaming)
    inference — everything ``decode_autoregressive``'s while-loop carries,
    minus the output buffers (the caller accumulates chunk outputs)."""
    t: jnp.ndarray            # () int32 — decoder steps taken so far
    state: DecoderState
    prev_mel: jnp.ndarray     # (B, n_mels * r) — last raw frame group
    finished: jnp.ndarray     # (B,) bool — per-row gate latch
    lengths: jnp.ndarray      # (B,) int32 — decoder steps per row


def init_stream_carry(memory: jnp.ndarray,
                      cfg: Tacotron2Config) -> StreamCarry:
    B = memory.shape[0]
    n = cfg.n_mel_channels * cfg.n_frames_per_step
    return StreamCarry(
        t=jnp.zeros((), jnp.int32),
        state=init_decoder_state(memory, cfg),
        prev_mel=jnp.zeros((B, n), jnp.float32),
        finished=jnp.zeros((B,), bool),
        lengths=jnp.zeros((B,), jnp.int32))


def decode_chunk(params: Params, carry: StreamCarry, memory: jnp.ndarray,
                 processed_memory: jnp.ndarray,
                 mask: Optional[jnp.ndarray], cfg: Tacotron2Config, *,
                 chunk_steps: int, rng: Optional[jax.Array] = None,
                 compute_dtype=None,
                 ) -> Tuple[StreamCarry,
                            Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Run ``chunk_steps`` autoregressive decoder steps from ``carry``.

    Step-for-step identical to ``decode_autoregressive`` (same RNG
    derivation: prenet key = fold_in(rng, global_step)), but resumable:
    calling this repeatedly and concatenating the chunk outputs reproduces
    the offline buffers exactly. Chunk outputs are already masked for
    finished rows (mel/align -> 0, gate -> MASKED_GATE_ENERGY), in
    per-frame resolution: mel (B, chunk_steps*r, n_mels),
    gate (B, chunk_steps*r), align (B, chunk_steps*r, T_in).
    """
    dp = params["decoder"]
    r = cfg.n_frames_per_step
    prenet_deterministic = not cfg.prenet_dropout_at_inference or rng is None

    def body(c: StreamCarry, _):
        step_rng = (jax.random.fold_in(rng, c.t) if rng is not None else None)
        prenet_out = prenet_apply(dp["prenet"], c.prev_mel, step_rng,
                                  deterministic=prenet_deterministic,
                                  compute_dtype=compute_dtype)
        state, (mel, gate, align) = decoder_step(
            dp, c.state, prenet_out, memory, processed_memory, mask, cfg,
            training=False, rng=None, compute_dtype=compute_dtype)
        mel_out = jnp.where(c.finished[:, None], 0.0, mel)
        gate_out = jnp.where(c.finished, MASKED_GATE_ENERGY, gate)
        align_out = jnp.where(c.finished[:, None], 0.0, align)
        lengths = jnp.where(c.finished, c.lengths, c.t + 1)
        finished = jnp.logical_or(
            c.finished, jax.nn.sigmoid(gate) > cfg.gate_threshold)
        return (StreamCarry(c.t + 1, state, mel, finished, lengths),
                (mel_out, gate_out, align_out))

    carry, (mels, gates, aligns) = jax.lax.scan(
        body, carry, None, length=chunk_steps)
    B = memory.shape[0]
    mels = mels.swapaxes(0, 1).reshape(B, chunk_steps * r,
                                       cfg.n_mel_channels)
    gates = jnp.repeat(gates.swapaxes(0, 1), r, axis=1)
    aligns = jnp.repeat(aligns.swapaxes(0, 1), r, axis=1)
    return carry, (mels, gates, aligns)


# ======================================================================
# Postnet
# ======================================================================

def postnet_apply(params: Params, stats: Params, mels: jnp.ndarray,
                  cfg: Tacotron2Config, *, training: bool,
                  rng: Optional[jax.Array] = None,
                  compute_dtype=None) -> Tuple[jnp.ndarray, Params]:
    """5x [conv5 -> batchnorm (-> tanh)] with dropout(0.5) after every layer
    (reference Postnet, model.py:103-146). Returns the residual to add."""
    x = mels
    layers = params["postnet"]["convs"]
    new_stats = []
    for i, layer in enumerate(layers):
        x = conv1d(layer["conv"], x, compute_dtype=compute_dtype)
        x, s = batchnorm(layer["bn"], stats["postnet"]["convs"][i], x,
                         training=training)
        new_stats.append(s)
        if compute_dtype is not None:
            # post-BN tanh/dropout in the compute dtype: the f32 chain
            # was memory-bound (dropout alone +4.8 ms of the 18.2 ms
            # postnet fwd+bwd at B=128/T=512 — round-5 decomposition)
            x = x.astype(compute_dtype)
        if i < len(layers) - 1:
            x = jnp.tanh(x)
        key = jax.random.fold_in(rng, i) if rng is not None else None
        x = dropout(key, x, 0.5, deterministic=not training)
    return x, {"postnet": {"convs": new_stats}}


# ======================================================================
# Full model
# ======================================================================

class ForwardOutput(NamedTuple):
    mel: jnp.ndarray            # (B, T_out, n_mels)
    mel_postnet: jnp.ndarray    # (B, T_out, n_mels)
    gate_energies: jnp.ndarray  # (B, T_out)
    alignments: jnp.ndarray     # (B, T_out, T_in)


def mask_outputs(mel: jnp.ndarray, mel_postnet: jnp.ndarray,
                 gate_energies: jnp.ndarray, output_lengths: jnp.ndarray,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """parse_output equivalent (reference model.py:487-497): zero mels and
    pin gate energies to 1e3 past each row's mel length."""
    valid = length_mask(output_lengths, mel.shape[1])  # (B, T)
    mel = jnp.where(valid[:, :, None], mel, 0.0)
    mel_postnet = jnp.where(valid[:, :, None], mel_postnet, 0.0)
    gate_energies = jnp.where(valid, gate_energies, MASKED_GATE_ENERGY)
    return mel, mel_postnet, gate_energies


def forward(params: Params, stats: Params, text: jnp.ndarray,
            text_lengths: jnp.ndarray, mels: jnp.ndarray,
            output_lengths: jnp.ndarray, cfg: Tacotron2Config, *,
            training: bool, rng: Optional[jax.Array] = None,
            compute_dtype=None) -> Tuple[ForwardOutput, Params]:
    """Teacher-forced forward pass (reference Tacotron2.forward,
    model.py:499-515). mels: (B, T_out, n_mels) targets."""
    enc_rng = dec_rng = post_rng = None
    if rng is not None:
        enc_rng, dec_rng, post_rng = jax.random.split(rng, 3)

    memory, enc_stats = encode(params, stats, text, text_lengths, cfg,
                               training=training, rng=enc_rng,
                               compute_dtype=compute_dtype)
    mel_out, gate_energies, alignments = decode_teacher_forced(
        params, memory, text_lengths, mels, cfg, training=training,
        rng=dec_rng, compute_dtype=compute_dtype)
    residual, post_stats = postnet_apply(params, stats, mel_out, cfg,
                                         training=training, rng=post_rng,
                                         compute_dtype=compute_dtype)
    mel_postnet = mel_out + residual

    if cfg.mask_padding:
        mel_out, mel_postnet, gate_energies = mask_outputs(
            mel_out, mel_postnet, gate_energies, output_lengths)

    new_stats = {**enc_stats, **post_stats}
    return ForwardOutput(mel_out, mel_postnet, gate_energies,
                         alignments), new_stats


def infer(params: Params, stats: Params, text: jnp.ndarray,
          text_lengths: jnp.ndarray, cfg: Tacotron2Config, *,
          rng: Optional[jax.Array] = None, max_steps: Optional[int] = None,
          compute_dtype=None) -> InferenceResult:
    """Batched text -> mel inference (reference Tacotron2.inference,
    model.py:517-529, made batch-safe)."""
    enc_rng = pre_rng = None
    if rng is not None:
        enc_rng, pre_rng = jax.random.split(rng)

    memory, _ = encode(params, stats, text, text_lengths, cfg,
                       training=False, rng=enc_rng,
                       compute_dtype=compute_dtype)
    mel, gate_energies, alignments, mel_lengths = decode_autoregressive(
        params, memory, text_lengths, cfg, rng=pre_rng, max_steps=max_steps,
        compute_dtype=compute_dtype)
    residual, _ = postnet_apply(params, stats, mel, cfg, training=False,
                                rng=None, compute_dtype=compute_dtype)
    mel_postnet = mel + residual
    mel, mel_postnet, gate_energies = mask_outputs(
        mel, mel_postnet, gate_energies, mel_lengths)
    return InferenceResult(mel, mel_postnet, gate_energies, alignments,
                           mel_lengths)
