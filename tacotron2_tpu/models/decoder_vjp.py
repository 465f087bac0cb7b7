"""Custom-VJP teacher-forced decoder scan with hoisted weight gradients.

Why this exists: the headline train step is dominated by the backward pass
of the 512-step decoder scan (PERFORMANCE.md: ~58% of step time). Under
plain autodiff, every backward step computes per-step weight-gradient
matmuls for the two LSTM cells — contractions over the batch dimension
only (K=B=128), which badly under-fill the MXU and, worse, sit on the
sequential critical path of the reverse scan.

This module reimplements the scan's VJP by hand the way cuDNN's RNN
backward does it:

- the backward scan computes ONLY the sequential data-gradient chain and
  *stacks* the per-step gate cotangents ``dga``/``dgd``;
- after the scan, each LSTM weight gradient is ONE large matmul with
  contraction T*B (e.g. (768, 65536) @ (65536, 4096)) — MXU-efficient and
  off the critical path;
- the attention block's backward is delegated to ``jax.vjp`` per step
  (its weight gradients already contract over B*T_in per step, and its
  parameters are tiny), so its math is autodiff-exact;
- attention energies are rematerialized (never saved), like the
  ``remat_attention_energies`` option of the XLA path.

Numerics: the forward pass reuses the exact primitives of the XLA path
(``ops.lstm.lstm_gates``/``lstm_apply_gates``, ``tacotron2._attention``,
``ops.layers.dropout`` with identical key derivation), so forward values
match ``decode_teacher_forced`` bit-for-bit in fp32 and up to dot-order
in bf16. Gradients are verified against autodiff in
tests/test_decoder_vjp.py (fp32 at atol 1e-5 relative scale; bf16 at a
loose tolerance). In the bf16 path the backward deliberately downcasts
cotangents at the matmul boundaries — dga/dgd, d_ctx (both in-scan for
d_w_from_ctx and as the stacked (T, B, E) output), and the hoisted dW /
d_mem einsum inputs are bf16 with fp32 accumulation — mirroring where
autodiff's bf16 forward puts its casts; elementwise backward math
(LSTM-gate activations, dropout masks, softmax VJP) stays fp32.

Reference behavior covered: the teacher-forced decoder loop
(/root/reference/model.py:381-416) including per-step attention
(model.py:340-379) and the dropout quirks (p_attention_dropout /
p_decoder_dropout on the LSTM outputs, model.py:352-371).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.ops.layers import dropout
from tacotron2_tpu.ops.lstm import lstm_apply_gates, lstm_gates

_FLOAT0 = jax.dtypes.float0


class _Residuals(NamedTuple):
    """Per-step stacks saved by the forward scan (time-major, (T, B, ...)).

    Storage dtype: gate pre-activations and hidden states in the compute
    dtype (their consumers cast to it anyway); cell states and attention
    weights in fp32 (used by fp32 elementwise backward math)."""
    ga: jnp.ndarray       # (T, B, 4*A) attention-LSTM gate pre-activations
    gd: jnp.ndarray       # (T, B, 4*D) decoder-LSTM gate pre-activations
    att_h: jnp.ndarray    # (T, B, A) post-dropout attention-LSTM h
    dec_h: jnp.ndarray    # (T, B, D) post-dropout decoder-LSTM h
    att_c: jnp.ndarray    # (T, B, A) fp32
    dec_c: jnp.ndarray    # (T, B, D) fp32
    ctx: jnp.ndarray      # (T, B, E) fp32 attention context
    w: jnp.ndarray        # (T, B, T_in) fp32 attention weights


def _shift(stack: jnp.ndarray) -> jnp.ndarray:
    """stack[t] -> value at t-1, with the (all-zero) initial state at t=0."""
    zero = jnp.zeros_like(stack[:1])
    return jnp.concatenate([zero, stack[:-1]], axis=0)


def _storage_dtype(compute_dtype):
    return compute_dtype if compute_dtype is not None else jnp.float32


def _lstm_gates_bwd(gates: jnp.ndarray, c_prev: jnp.ndarray,
                    c_new: jnp.ndarray, dh: jnp.ndarray, dc_in: jnp.ndarray,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """VJP of ``lstm_apply_gates``: (dh, dc_in) -> (dgates, dc_prev).

    Activations are recomputed from the saved pre-activations (fp32);
    ``c_new`` is the saved exact cell state, so tanh(c_new) matches the
    forward bit-for-bit."""
    gates = gates.astype(jnp.float32)
    i_, f_, g_, o_ = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i_)
    f = jax.nn.sigmoid(f_)
    g = jnp.tanh(g_)
    o = jax.nn.sigmoid(o_)
    tc = jnp.tanh(c_new)
    do = dh * tc
    dc = dc_in + dh * o * (1.0 - tc * tc)
    di = dc * g
    df = dc * c_prev
    dg = dc * i
    dc_prev = dc * f
    dgates = jnp.concatenate([
        di * i * (1.0 - i),
        df * f * (1.0 - f),
        dg * (1.0 - g * g),
        do * o * (1.0 - o),
    ], axis=-1)
    return dgates, dc_prev


def _dropout_bwd(key: jax.Array, rate: float, d: jnp.ndarray) -> jnp.ndarray:
    """VJP of ops.layers.dropout: regenerate the keep mask from the same
    key (deterministic) and scale the cotangent."""
    keep = jax.random.bernoulli(key, 1.0 - rate, d.shape)
    return jnp.where(keep, d / (1.0 - rate), jnp.zeros_like(d))


def core_scan(dp_core, prenet_steps, memory, processed, mask, scan_rng,
              cfg: Tacotron2Config, training: bool,
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the teacher-forced decoder core over all steps.

    Args:
      dp_core: {"attention_rnn", "attention" (query/v/location_conv/
        location_dense), "decoder_rnn"} parameter subtree.
      prenet_steps: (T, B, prenet_dim) time-major prenet outputs.
      memory: (B, T_in, E) encoder memory (fp32).
      processed: (B, T_in, att_dim) pre-projected memory.
      mask: (B, T_in) bool validity mask.
      scan_rng: raw PRNG key array for the in-scan dropout (ignored unless
        ``training``); key derivation matches decode_teacher_forced
        (key_t = fold_in(scan_rng, t); fold_in(key_t, 0)=attention LSTM,
        fold_in(key_t, 1)=decoder LSTM).
      training: statically enables the LSTM-output dropouts.

    Returns (dec_h_stack (T,B,D), ctx_stack (T,B,E), align_stack (T,B,T_in));
    the mel/gate heads are applied by the caller over the full stacks.
    """
    dropout_active = bool(training) and scan_rng is not None
    if scan_rng is None:
        scan_rng = jnp.zeros((2,), jnp.uint32)  # placeholder, unused
    fn = _make_core_scan(cfg, dropout_active)
    return fn(dp_core, prenet_steps, memory, processed, mask, scan_rng)


def _make_core_scan(cfg: Tacotron2Config, dropout_active: bool):
    """Build the custom-VJP scan for a static (cfg, dropout_active)."""
    from tacotron2_tpu.models.tacotron2 import (  # deferred: no cycle
        DecoderState, _attention, _attention_weights, init_decoder_state,
    )

    compute_dtype = cfg.jax_compute_dtype
    sdt = _storage_dtype(compute_dtype)
    unroll = cfg.decoder_scan_unroll
    p_att, p_dec = cfg.p_attention_dropout, cfg.p_decoder_dropout

    # ------------------------------------------------------------ forward
    def _forward(dp, prenet_steps, memory, processed, mask, scan_rng):
        state = init_decoder_state(memory, cfg)
        T = prenet_steps.shape[0]

        def step(s: DecoderState, xs):
            t, prenet_t = xs
            xa = jnp.concatenate([prenet_t, s.att_context], axis=-1)
            ga = lstm_gates(dp["attention_rnn"], xa, s.att_h, compute_dtype)
            att_h, att_c = lstm_apply_gates(ga, s.att_c)
            if dropout_active:
                key_t = jax.random.fold_in(scan_rng, t)
                att_h = dropout(jax.random.fold_in(key_t, 0), att_h, p_att)
            ctx, w = _attention(dp["attention"], att_h, memory, processed,
                                s.att_weights, s.att_weights_cum, mask,
                                compute_dtype)
            wcum = s.att_weights_cum + w
            xd = jnp.concatenate([att_h, ctx], axis=-1)
            gd = lstm_gates(dp["decoder_rnn"], xd, s.dec_h, compute_dtype)
            dec_h, dec_c = lstm_apply_gates(gd, s.dec_c)
            if dropout_active:
                dec_h = dropout(jax.random.fold_in(key_t, 1), dec_h, p_dec)
            new_s = DecoderState(att_h, att_c, dec_h, dec_c, w, wcum, ctx)
            emit = _Residuals(ga.astype(sdt), gd.astype(sdt),
                              att_h.astype(sdt), dec_h.astype(sdt),
                              att_c, dec_c, ctx.astype(jnp.float32), w)
            return new_s, emit

        xs = (jnp.arange(T), prenet_steps)
        _, res = jax.lax.scan(step, state, xs, unroll=unroll)
        return (res.dec_h, res.ctx, res.w), res

    @jax.custom_vjp
    def scan_fn(dp, prenet_steps, memory, processed, mask, scan_rng):
        out, _ = _forward(dp, prenet_steps, memory, processed, mask,
                          scan_rng)
        return out

    def fwd(dp, prenet_steps, memory, processed, mask, scan_rng):
        out, res = _forward(dp, prenet_steps, memory, processed, mask,
                            scan_rng)
        saved = (dp, prenet_steps, memory, processed, mask, scan_rng, res)
        return out, saved

    # ----------------------------------------------------------- backward
    def bwd(saved, cotangents):
        dp, prenet_steps, memory, processed, mask, scan_rng, res = saved
        d_dec_h_out, d_ctx_out, d_align_out = cotangents
        T, B, _ = prenet_steps.shape
        T_in = memory.shape[1]
        A = dp["attention_rnn"]["wh"].shape[0]
        D = dp["decoder_rnn"]["wh"].shape[0]
        E = memory.shape[2]
        f32 = jnp.float32
        attp = dp["attention"]

        # shifted (value at t-1) views of the saved stacks
        att_c_prev = _shift(res.att_c)
        dec_c_prev = _shift(res.dec_c)
        w_prev = _shift(res.w)
        wcum_prev = jnp.cumsum(res.w, axis=0) - res.w  # exclusive prefix sum
        ctx_prev = _shift(res.ctx)

        # The context bmm (ctx = sum_i w_i mem_i) is differentiated by
        # hand so `memory` never enters the per-step VJP: its per-step
        # cotangent is a (B, T_in, E) outer product (33 MB at B=128) whose
        # materialize+accumulate traffic dominated the reverse scan. Since
        # ctx is LINEAR in memory, d_mem = sum_t w_t (x) d_ctx_t hoists to
        # ONE post-scan einsum over the saved attention weights and the
        # stacked context cotangents. The energies+softmax block (whose
        # weight/processed-memory grads are small) stays autodiff-exact.
        def attn_weights_fn(att_p, att_h, w_p, wc_p, proc):
            # the forward's masked softmax, verbatim — shared helper so the
            # rematerialized backward can never diverge from _attention
            return _attention_weights(att_p, att_h, proc, w_p, wc_p, mask,
                                      compute_dtype)

        zero_attp = jax.tree.map(lambda x: jnp.zeros_like(x), attp)
        mem_c = (memory.astype(compute_dtype) if compute_dtype is not None
                 else memory.astype(f32))

        def step(carry, xs):
            (d_att_h, d_att_c, d_dec_h, d_dec_c, d_w, d_wcum, d_ctx,
             d_proc_acc, d_attp_acc) = carry
            (t, ga_t, gd_t, att_h_t, att_c_t, att_c_p, dec_c_t, dec_c_p,
             w_t, w_p, wc_p, d_dec_h_out_t, d_ctx_out_t, d_align_t) = xs

            if dropout_active:
                key_t = jax.random.fold_in(scan_rng, t)

            # decoder LSTM (output dropout, then gates)
            d_dec_h_total = d_dec_h + d_dec_h_out_t.astype(f32)
            if dropout_active:
                d_dec_h_total = _dropout_bwd(jax.random.fold_in(key_t, 1),
                                             p_dec, d_dec_h_total)
            dgd, d_dec_c_prev = _lstm_gates_bwd(gd_t, dec_c_p, dec_c_t,
                                                d_dec_h_total, d_dec_c)
            dgd_c = dgd.astype(sdt)
            wi_d = dp["decoder_rnn"]["wi"].astype(sdt)
            wh_d = dp["decoder_rnn"]["wh"].astype(sdt)
            dxd = jnp.dot(dgd_c, wi_d.T, preferred_element_type=f32)
            d_dec_h_prev = jnp.dot(dgd_c, wh_d.T, preferred_element_type=f32)
            d_att_h_from_xd = dxd[:, :A]
            d_ctx_total = d_ctx + d_ctx_out_t.astype(f32) + dxd[:, A:]

            # context bmm backward (hand-written; see block comment above)
            d_w_from_ctx = jnp.einsum(
                "be,bte->bt", d_ctx_total.astype(mem_c.dtype), mem_c,
                preferred_element_type=f32)

            # energies + softmax backward, autodiff-exact
            d_w_total = (d_w + d_wcum + d_align_t.astype(f32)
                         + d_w_from_ctx.astype(f32))
            _, attn_vjp = jax.vjp(attn_weights_fn, attp, att_h_t, w_p,
                                  wc_p, processed)
            (d_attp, d_att_h_from_attn, d_w_prev, d_wcum_prev,
             d_proc) = attn_vjp(d_w_total)

            # attention LSTM
            d_att_h_total = (d_att_h + d_att_h_from_xd
                             + d_att_h_from_attn.astype(f32))
            if dropout_active:
                d_att_h_total = _dropout_bwd(jax.random.fold_in(key_t, 0),
                                             p_att, d_att_h_total)
            dga, d_att_c_prev = _lstm_gates_bwd(ga_t, att_c_p, att_c_t,
                                                d_att_h_total, d_att_c)
            dga_c = dga.astype(sdt)
            wi_a = dp["attention_rnn"]["wi"].astype(sdt)
            wh_a = dp["attention_rnn"]["wh"].astype(sdt)
            dxa = jnp.dot(dga_c, wi_a.T, preferred_element_type=f32)
            d_att_h_prev = jnp.dot(dga_c, wh_a.T, preferred_element_type=f32)
            P = prenet_steps.shape[-1]
            d_prenet_t = dxa[:, :P]
            d_ctx_prev = dxa[:, P:]

            new_carry = (
                d_att_h_prev, d_att_c_prev, d_dec_h_prev, d_dec_c_prev,
                d_w_prev.astype(f32),
                d_wcum + d_wcum_prev.astype(f32),
                d_ctx_prev,
                d_proc_acc + d_proc.astype(f32),
                jax.tree.map(jnp.add, d_attp_acc, d_attp),
            )
            # d_ctx stacked in the storage dtype: halves the (T, B, E)
            # stack's HBM footprint; the bf16 path already feeds bf16-cast
            # d_ctx into the d_w_from_ctx einsum above, so numerics match.
            return new_carry, (dga_c, dgd_c, d_prenet_t,
                               d_ctx_total.astype(sdt))

        carry0 = (
            jnp.zeros((B, A), f32), jnp.zeros((B, A), f32),
            jnp.zeros((B, D), f32), jnp.zeros((B, D), f32),
            jnp.zeros((B, T_in), f32), jnp.zeros((B, T_in), f32),
            jnp.zeros((B, E), f32),
            jnp.zeros((B, T_in, processed.shape[-1]), f32),
            zero_attp,
        )
        xs = (jnp.arange(T), res.ga, res.gd, res.att_h, res.att_c,
              att_c_prev, res.dec_c, dec_c_prev, res.w, w_prev, wcum_prev,
              d_dec_h_out, d_ctx_out, d_align_out)
        carry, (dga_stack, dgd_stack, d_prenet, dctx_stack) = jax.lax.scan(
            step, carry0, xs, reverse=True, unroll=unroll)
        (_, _, _, _, _, _, _, d_proc_acc, d_attp_acc) = carry

        # hoisted memory gradient: ctx_t = sum_i w_ti mem_ie is linear, so
        # d_mem = sum_t w_t (x) d_ctx_t — one batched matmul (contraction T)
        # instead of a 33 MB accumulator riding the reverse scan. Inputs in
        # the storage dtype, fp32 accumulation (like the dW einsums below).
        d_mem_acc = jnp.einsum("tbi,tbe->bie", res.w.astype(sdt), dctx_stack,
                               preferred_element_type=f32)

        # hoisted weight gradients: one big matmul each, contraction T*B
        att_h_prev = _shift(res.att_h)
        dec_h_prev = _shift(res.dec_h)
        xa_stack = jnp.concatenate(
            [prenet_steps.astype(sdt), ctx_prev.astype(sdt)], axis=-1)
        dWi_a = jnp.einsum("tbi,tbg->ig", xa_stack, dga_stack,
                           preferred_element_type=f32).astype(f32)
        dWh_a = jnp.einsum("tbh,tbg->hg", att_h_prev.astype(sdt), dga_stack,
                           preferred_element_type=f32).astype(f32)
        db_a = jnp.sum(dga_stack.astype(f32), axis=(0, 1))

        xd_stack = jnp.concatenate(
            [res.att_h.astype(sdt), res.ctx.astype(sdt)], axis=-1)
        dWi_d = jnp.einsum("tbi,tbg->ig", xd_stack, dgd_stack,
                           preferred_element_type=f32).astype(f32)
        dWh_d = jnp.einsum("tbh,tbg->hg", dec_h_prev, dgd_stack,
                           preferred_element_type=f32).astype(f32)
        db_d = jnp.sum(dgd_stack.astype(f32), axis=(0, 1))

        d_dp = {
            "attention_rnn": {"wi": dWi_a, "wh": dWh_a,
                              "bi": db_a, "bh": db_a},
            "attention": d_attp_acc,
            "decoder_rnn": {"wi": dWi_d, "wh": dWh_d,
                            "bi": db_d, "bh": db_d},
        }
        d_memory = d_mem_acc.astype(memory.dtype)
        d_processed = d_proc_acc.astype(processed.dtype)
        d_prenet = d_prenet.astype(prenet_steps.dtype)
        d_mask = np.zeros(mask.shape, dtype=_FLOAT0)
        d_rng = np.zeros(scan_rng.shape, dtype=_FLOAT0)
        return (d_dp, d_prenet, d_memory, d_processed, d_mask, d_rng)

    scan_fn.defvjp(fwd, bwd)
    return scan_fn
