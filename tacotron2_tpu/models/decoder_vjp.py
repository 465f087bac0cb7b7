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


_warned_fallback = set()


def _warn_fallback(cfg, t_in: int, batch: int) -> None:
    """One-time (per shape) notice that the requested Pallas training-scan
    kernel fell back to the XLA scan — the silent-fallback design makes
    the ~10-15% throughput difference otherwise hard to notice
    (ADVICE r2). Trace-time only: runs during jit tracing, never per step.
    """
    key = (t_in, batch, cfg.compute_dtype)
    if key in _warned_fallback:
        return
    _warned_fallback.add(key)
    import logging
    logging.getLogger(__name__).warning(
        "pallas_train_scan=True but the kernel envelope rejects "
        "T_in=%d, batch=%d, compute_dtype=%s (see kernels/train_scan."
        "supported); falling back to the XLA scan for this shape.",
        t_in, batch, cfg.compute_dtype)


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
    """Build the custom-VJP scan for a static (cfg, dropout_active).

    ``cfg.decoder_interleave`` = N splits the batch into N independent
    sub-chains processed inside ONE scan step (forward and backward): a
    single chain's per-step critical path leaves the MXU idle during the
    LSTM activations/attention softmax, and N independent chains give the
    scheduler matmuls to run in those gaps. Dropout masks are drawn at
    full batch width and row-sliced per chain, and splitting a matmul's
    row dimension is bitwise-identical per row, so results match N=1
    exactly (tests/test_decoder_vjp.py::test_interleave_*)."""
    from tacotron2_tpu.models.tacotron2 import (  # deferred: no cycle
        DecoderState, _attention, _attention_weights, init_decoder_state,
    )

    compute_dtype = cfg.jax_compute_dtype
    sdt = _storage_dtype(compute_dtype)
    unroll = cfg.decoder_scan_unroll
    p_att, p_dec = cfg.p_attention_dropout, cfg.p_decoder_dropout
    n_il = max(1, cfg.decoder_interleave)

    def _chunk_slices(B: int):
        if B % n_il:
            raise ValueError(f"batch {B} not divisible by "
                             f"decoder_interleave={n_il}")
        Bc = B // n_il
        return [slice(i * Bc, (i + 1) * Bc) for i in range(n_il)]

    def _step_keep_masks(scan_rng, t, B, A, D):
        """Full-batch dropout keep masks for step t — drawn exactly like
        ops.layers.dropout would for the full batch, then row-sliced per
        chain, so any interleave factor sees the same masks."""
        key_t = jax.random.fold_in(scan_rng, t)
        keep_att = (jax.random.bernoulli(jax.random.fold_in(key_t, 0),
                                         1.0 - p_att, (B, A))
                    if p_att > 0.0 else None)
        keep_dec = (jax.random.bernoulli(jax.random.fold_in(key_t, 1),
                                         1.0 - p_dec, (B, D))
                    if p_dec > 0.0 else None)
        return keep_att, keep_dec

    # ------------------------------------------------------------ forward
    def _forward(dp, prenet_steps, memory, processed, mask, scan_rng,
                 keep=None, emit_feat=False):
        """Returns (res_chunks, feat): feat is the forward kernel's
        streamed post-tanh energies stack when emit_feat (consumed by
        the backward kernel instead of rematerializing), else None."""
        if cfg.pallas_train_scan:
            from tacotron2_tpu.kernels import train_scan
            if n_il == 1 and train_scan.supported(
                    cfg, memory.shape[1], prenet_steps.shape[1]):
                if emit_feat:
                    outs, feat = train_scan.forward_residuals(
                        dp, prenet_steps, memory, processed, mask,
                        scan_rng, cfg, dropout_active, keep=keep,
                        emit_feat=True)
                    return (_Residuals(*outs),), feat
                outs = train_scan.forward_residuals(
                    dp, prenet_steps, memory, processed, mask, scan_rng,
                    cfg, dropout_active, keep=keep)
                return (_Residuals(*outs),), None
            # warn on ANY fallback, including decoder_interleave > 1
            # (supported() also rejects it, so it reports the reason)
            _warn_fallback(cfg, memory.shape[1], prenet_steps.shape[1])
        return _forward_xla(dp, prenet_steps, memory, processed, mask,
                            scan_rng), None

    def _forward_xla(dp, prenet_steps, memory, processed, mask, scan_rng):
        T, B, _ = prenet_steps.shape
        A = dp["attention_rnn"]["wh"].shape[0]
        D = dp["decoder_rnn"]["wh"].shape[0]
        sls = _chunk_slices(B)
        mem_c = [memory[s] for s in sls]
        proc_c = [processed[s] for s in sls]
        mask_c = [None if mask is None else mask[s] for s in sls]
        states = tuple(init_decoder_state(memory[s], cfg) for s in sls)

        def chunk_step(s: DecoderState, prenet_t, mem, proc, msk,
                       keep_att, keep_dec):
            xa = jnp.concatenate([prenet_t, s.att_context], axis=-1)
            ga = lstm_gates(dp["attention_rnn"], xa, s.att_h, compute_dtype)
            att_h, att_c = lstm_apply_gates(ga, s.att_c)
            if keep_att is not None:
                att_h = jnp.where(keep_att, att_h / (1.0 - p_att),
                                  jnp.zeros_like(att_h))
            ctx, w = _attention(dp["attention"], att_h, mem, proc,
                                s.att_weights, s.att_weights_cum, msk,
                                compute_dtype)
            wcum = s.att_weights_cum + w
            xd = jnp.concatenate([att_h, ctx], axis=-1)
            gd = lstm_gates(dp["decoder_rnn"], xd, s.dec_h, compute_dtype)
            dec_h, dec_c = lstm_apply_gates(gd, s.dec_c)
            if keep_dec is not None:
                dec_h = jnp.where(keep_dec, dec_h / (1.0 - p_dec),
                                  jnp.zeros_like(dec_h))
            new_s = DecoderState(att_h, att_c, dec_h, dec_c, w, wcum, ctx)
            emit = _Residuals(ga.astype(sdt), gd.astype(sdt),
                              att_h.astype(sdt), dec_h.astype(sdt),
                              att_c, dec_c, ctx.astype(jnp.float32), w)
            return new_s, emit

        def step(ss, xs):
            t, prenet_t = xs
            keep_att = keep_dec = None
            if dropout_active:
                keep_att, keep_dec = _step_keep_masks(scan_rng, t, B, A, D)
            new_ss, emits = [], []
            for i, s in enumerate(sls):
                ns, em = chunk_step(
                    ss[i], prenet_t[s], mem_c[i], proc_c[i], mask_c[i],
                    None if keep_att is None else keep_att[s],
                    None if keep_dec is None else keep_dec[s])
                new_ss.append(ns)
                emits.append(em)
            return tuple(new_ss), tuple(emits)

        xs = (jnp.arange(T), prenet_steps)
        _, res_chunks = jax.lax.scan(step, states, xs, unroll=unroll)
        return res_chunks

    def _cat(parts, axis=1):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis)

    @jax.custom_vjp
    def scan_fn(dp, prenet_steps, memory, processed, mask, scan_rng):
        res_chunks, _ = _forward(dp, prenet_steps, memory, processed,
                                 mask, scan_rng)
        return (_cat([r.dec_h for r in res_chunks]),
                _cat([r.ctx for r in res_chunks]),
                _cat([r.w for r in res_chunks]))

    def _bwd_kernel_engages(prenet_steps, memory):
        """Whether the BACKWARD kernel will run for this shape (round 5:
        the fwd->bwd extras — shared keep masks, streamed feat — only
        pay off when the backward kernel consumes them)."""
        if not cfg.pallas_train_scan or not cfg.pallas_train_scan_bwd \
                or n_il != 1:
            return False
        from tacotron2_tpu.kernels import train_scan
        return train_scan.bwd_supported(
            cfg, memory.shape[1], prenet_steps.shape[1])

    def _kernel_keep_masks(prenet_steps, memory, scan_rng):
        """Generate the kernel paths' dropout keep masks ONCE (round 5):
        the forward streams them in and the backward needs the identical
        stacks — threading them through the residuals saves the backward
        re-derivation at zero extra HBM traffic (the stacks are kernel
        operands either way)."""
        if not dropout_active:
            return None
        from tacotron2_tpu.kernels import train_scan
        T_steps, B = prenet_steps.shape[0], prenet_steps.shape[1]
        return train_scan.keep_masks(
            scan_rng, T_steps, B,
            train_scan.scan_dims(cfg, memory.shape[1]),
            cfg.p_attention_dropout, cfg.p_decoder_dropout)

    def fwd(dp, prenet_steps, memory, processed, mask, scan_rng):
        bwd_kernel = _bwd_kernel_engages(prenet_steps, memory)
        keep = _kernel_keep_masks(prenet_steps, memory, scan_rng) \
            if bwd_kernel else None
        emit_feat = False
        if bwd_kernel and cfg.pallas_stream_feat:
            from tacotron2_tpu.kernels import train_scan
            emit_feat = train_scan.feat_stream_fits(
                train_scan.scan_dims(cfg, memory.shape[1]),
                prenet_steps.shape[1])
        res_chunks, feat = _forward(dp, prenet_steps, memory, processed,
                                    mask, scan_rng, keep=keep,
                                    emit_feat=emit_feat)
        out = (_cat([r.dec_h for r in res_chunks]),
               _cat([r.ctx for r in res_chunks]),
               _cat([r.w for r in res_chunks]))
        saved = (dp, prenet_steps, memory, processed, mask, scan_rng,
                 res_chunks, keep, feat)
        return out, saved

    # ----------------------------------------------------------- backward
    def bwd(saved, cotangents):
        (dp, prenet_steps, memory, processed, mask, scan_rng,
         res_chunks, keep, feat) = saved
        d_dec_h_out, d_ctx_out, d_align_out = cotangents
        T, B, P = prenet_steps.shape
        T_in = memory.shape[1]
        A = dp["attention_rnn"]["wh"].shape[0]
        D = dp["decoder_rnn"]["wh"].shape[0]
        E = memory.shape[2]
        f32 = jnp.float32
        attp = dp["attention"]
        sls = _chunk_slices(B)
        Bc = B // n_il

        # per-chunk shifted (value at t-1) views of the saved stacks
        def chunk_shifts(res):
            return (_shift(res.att_c), _shift(res.dec_c), _shift(res.w),
                    jnp.cumsum(res.w, axis=0) - res.w,  # exclusive prefix
                    _shift(res.ctx))
        shifts = [chunk_shifts(r) for r in res_chunks]

        # The context bmm (ctx = sum_i w_i mem_i) is differentiated by
        # hand so `memory` never enters the per-step VJP: its per-step
        # cotangent is a (B, T_in, E) outer product (33 MB at B=128) whose
        # materialize+accumulate traffic dominated the reverse scan. Since
        # ctx is LINEAR in memory, d_mem = sum_t w_t (x) d_ctx_t hoists to
        # ONE post-scan einsum over the saved attention weights and the
        # stacked context cotangents. The energies+softmax block (whose
        # weight/processed-memory grads are small) stays autodiff-exact.
        def make_attn_weights_fn(msk):
            def attn_weights_fn(att_p, att_h, w_p, wc_p, proc):
                # the forward's masked softmax, verbatim — shared helper so
                # the rematerialized backward can't diverge from _attention
                return _attention_weights(att_p, att_h, proc, w_p, wc_p,
                                          msk, compute_dtype)
            return attn_weights_fn

        zero_attp = jax.tree.map(lambda x: jnp.zeros_like(x), attp)
        mem_cd = (memory.astype(compute_dtype) if compute_dtype is not None
                  else memory.astype(f32))
        mem_chunks = [mem_cd[s] for s in sls]
        proc_chunks = [processed[s] for s in sls]
        mask_chunks = [None if mask is None else mask[s] for s in sls]

        # Each LSTM's two data-gradient dots (dg @ wi.T and dg @ wh.T)
        # share their left operand, so they fuse into ONE matmul along the
        # output dimension: the weight concat+transpose is loop-invariant
        # (hoisted out of the scan) and slicing the output columns back
        # apart is free — one MXU launch per cell per step instead of two,
        # bitwise-identical columns. (The analogous forward fusion was
        # measured SLOWER because it needs a runtime [x,h] concat each
        # step, PERFORMANCE.md; here the concat is static.)
        wT_d = jnp.concatenate([dp["decoder_rnn"]["wi"],
                                dp["decoder_rnn"]["wh"]],
                               axis=0).astype(sdt).T  # (4D, in_d + D)
        wT_a = jnp.concatenate([dp["attention_rnn"]["wi"],
                                dp["attention_rnn"]["wh"]],
                               axis=0).astype(sdt).T  # (4A, in_a + A)
        in_d = dp["decoder_rnn"]["wi"].shape[0]   # A + E
        in_a = dp["attention_rnn"]["wi"].shape[0]  # P + E

        def chunk_bwd_step(carry, xs_c, mem_c, proc_c, msk,
                           keep_att, keep_dec):
            (d_att_h, d_att_c, d_dec_h, d_dec_c, d_w, d_wcum, d_ctx,
             d_proc_acc, d_attp_acc) = carry
            (ga_t, gd_t, att_h_t, att_c_t, att_c_p, dec_c_t, dec_c_p,
             w_t, w_p, wc_p, d_dec_h_out_t, d_ctx_out_t, d_align_t) = xs_c

            # decoder LSTM (output dropout, then gates)
            d_dec_h_total = d_dec_h + d_dec_h_out_t.astype(f32)
            if keep_dec is not None:
                d_dec_h_total = jnp.where(
                    keep_dec, d_dec_h_total / (1.0 - p_dec),
                    jnp.zeros_like(d_dec_h_total))
            dgd, d_dec_c_prev = _lstm_gates_bwd(gd_t, dec_c_p, dec_c_t,
                                                d_dec_h_total, d_dec_c)
            dgd_c = dgd.astype(sdt)
            dxd_full = jnp.dot(dgd_c, wT_d, preferred_element_type=f32)
            dxd, d_dec_h_prev = dxd_full[:, :in_d], dxd_full[:, in_d:]
            d_att_h_from_xd = dxd[:, :A]
            d_ctx_total = d_ctx + d_ctx_out_t.astype(f32) + dxd[:, A:]

            # context bmm backward (hand-written; see block comment above)
            d_w_from_ctx = jnp.einsum(
                "be,bte->bt", d_ctx_total.astype(mem_c.dtype), mem_c,
                preferred_element_type=f32)

            # energies + softmax backward, autodiff-exact
            d_w_total = (d_w + d_wcum + d_align_t.astype(f32)
                         + d_w_from_ctx.astype(f32))
            _, attn_vjp = jax.vjp(make_attn_weights_fn(msk), attp, att_h_t,
                                  w_p, wc_p, proc_c)
            (d_attp, d_att_h_from_attn, d_w_prev, d_wcum_prev,
             d_proc) = attn_vjp(d_w_total)

            # attention LSTM
            d_att_h_total = (d_att_h + d_att_h_from_xd
                             + d_att_h_from_attn.astype(f32))
            if keep_att is not None:
                d_att_h_total = jnp.where(
                    keep_att, d_att_h_total / (1.0 - p_att),
                    jnp.zeros_like(d_att_h_total))
            dga, d_att_c_prev = _lstm_gates_bwd(ga_t, att_c_p, att_c_t,
                                                d_att_h_total, d_att_c)
            dga_c = dga.astype(sdt)
            dxa_full = jnp.dot(dga_c, wT_a, preferred_element_type=f32)
            dxa, d_att_h_prev = dxa_full[:, :in_a], dxa_full[:, in_a:]
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

        def step(carries, xs):
            t, xs_chunks, cot_chunks = xs
            keep_att = keep_dec = None
            if dropout_active:
                keep_att, keep_dec = _step_keep_masks(scan_rng, t, B, A, D)
            new_carries, emits = [], []
            for i, s in enumerate(sls):
                new_c, em = chunk_bwd_step(
                    carries[i], xs_chunks[i] + cot_chunks[i],
                    mem_chunks[i], proc_chunks[i], mask_chunks[i],
                    None if keep_att is None else keep_att[s],
                    None if keep_dec is None else keep_dec[s])
                new_carries.append(new_c)
                emits.append(em)
            return tuple(new_carries), tuple(emits)

        def chunk_carry0():
            return (
                jnp.zeros((Bc, A), f32), jnp.zeros((Bc, A), f32),
                jnp.zeros((Bc, D), f32), jnp.zeros((Bc, D), f32),
                jnp.zeros((Bc, T_in), f32), jnp.zeros((Bc, T_in), f32),
                jnp.zeros((Bc, E), f32),
                jnp.zeros((Bc, T_in, processed.shape[-1]), f32),
                zero_attp,
            )

        use_pallas_bwd = False
        if cfg.pallas_train_scan and cfg.pallas_train_scan_bwd \
                and n_il == 1:
            from tacotron2_tpu.kernels import train_scan
            # bwd_supported additionally requires the fp32 d_processed
            # accumulator (quality gate — see train_scan.bwd_supported)
            use_pallas_bwd = train_scan.bwd_supported(cfg, T_in, B)
        if use_pallas_bwd:
            # Fused reverse-grid kernel: computes the sequential
            # data-gradient chain with the transposed weights
            # VMEM-resident and emits the same per-step cotangent stacks
            # the hoisted einsums below consume; the attention parameter
            # gradients come back from its in-kernel d_band accumulator
            # (bilinear-fold chain rule) and d_q stack
            # (kernels/train_scan.py:backward_chain).
            (dga_st, dgd_st, dpre_st, dctx_st, d_proc_k,
             d_attp_k) = train_scan.backward_chain(
                dp, res_chunks[0], memory, processed, mask, scan_rng,
                d_dec_h_out, d_ctx_out, d_align_out, cfg, dropout_active,
                keep=keep, feat=feat)
            carries = ((None,) * 7 + (d_proc_k, d_attp_k),)
            emits = ((dga_st, dgd_st, dpre_st, dctx_st),)
        else:
            xs_chunks = tuple(
                (r.ga, r.gd, r.att_h, r.att_c, sh[0], r.dec_c, sh[1],
                 r.w, sh[2], sh[3])
                for r, sh in zip(res_chunks, shifts))
            cot_chunks = tuple(
                (d_dec_h_out[:, s], d_ctx_out[:, s], d_align_out[:, s])
                for s in sls)
            carries, emits = jax.lax.scan(
                step, tuple(chunk_carry0() for _ in sls),
                (jnp.arange(T), xs_chunks, cot_chunks),
                reverse=True, unroll=unroll)

        # hoisted gradients, accumulated over chunks:
        # - d_mem: ctx_t = sum_i w_ti mem_ie is linear, so d_mem =
        #   sum_t w_t (x) d_ctx_t — one batched matmul (contraction T) per
        #   chunk instead of a 33 MB accumulator riding the reverse scan.
        # - each LSTM weight gradient is one big matmul per chunk with
        #   contraction T*Bc, summed over chunks. Inputs in the storage
        #   dtype, fp32 accumulation.
        dWi_a = dWh_a = db_a = dWi_d = dWh_d = db_d = None
        d_mem_parts, d_prenet_parts, d_proc_parts, d_attp_parts = \
            [], [], [], []
        add = lambda acc, x: x if acc is None else acc + x
        for i, (res, sh, carry, emit) in enumerate(
                zip(res_chunks, shifts, carries, emits)):
            dga_stack, dgd_stack, d_prenet_c, dctx_stack = emit
            ctx_prev = sh[4]
            d_mem_parts.append(jnp.einsum(
                "tbi,tbe->bie", res.w.astype(sdt), dctx_stack,
                preferred_element_type=f32))
            xa_stack = jnp.concatenate(
                [prenet_steps[:, sls[i]].astype(sdt),
                 ctx_prev.astype(sdt)], axis=-1)
            dWi_a = add(dWi_a, jnp.einsum(
                "tbi,tbg->ig", xa_stack, dga_stack,
                preferred_element_type=f32))
            dWh_a = add(dWh_a, jnp.einsum(
                "tbh,tbg->hg", _shift(res.att_h).astype(sdt), dga_stack,
                preferred_element_type=f32))
            db_a = add(db_a, jnp.sum(dga_stack.astype(f32), axis=(0, 1)))
            xd_stack = jnp.concatenate(
                [res.att_h.astype(sdt), res.ctx.astype(sdt)], axis=-1)
            dWi_d = add(dWi_d, jnp.einsum(
                "tbi,tbg->ig", xd_stack, dgd_stack,
                preferred_element_type=f32))
            dWh_d = add(dWh_d, jnp.einsum(
                "tbh,tbg->hg", _shift(res.dec_h).astype(sdt), dgd_stack,
                preferred_element_type=f32))
            db_d = add(db_d, jnp.sum(dgd_stack.astype(f32), axis=(0, 1)))
            d_prenet_parts.append(d_prenet_c)
            d_proc_parts.append(carry[7])
            d_attp_parts.append(carry[8])

        d_attp_acc = d_attp_parts[0]
        for part in d_attp_parts[1:]:
            d_attp_acc = jax.tree.map(jnp.add, d_attp_acc, part)

        d_dp = {
            "attention_rnn": {"wi": dWi_a.astype(f32),
                              "wh": dWh_a.astype(f32),
                              "bi": db_a, "bh": db_a},
            "attention": d_attp_acc,
            "decoder_rnn": {"wi": dWi_d.astype(f32),
                            "wh": dWh_d.astype(f32),
                            "bi": db_d, "bh": db_d},
        }
        d_memory = _cat(d_mem_parts, axis=0).astype(memory.dtype)
        d_processed = _cat(d_proc_parts, axis=0).astype(processed.dtype)
        d_prenet = _cat(d_prenet_parts, axis=1).astype(prenet_steps.dtype)
        d_mask = np.zeros(mask.shape, dtype=_FLOAT0)
        d_rng = np.zeros(scan_rng.shape, dtype=_FLOAT0)
        return (d_dp, d_prenet, d_memory, d_processed, d_mask, d_rng)

    scan_fn.defvjp(fwd, bwd)
    return scan_fn
