"""Pallas TPU kernel: BATCHED fused autoregressive decoder chunk (B <= 32).

The round-1/2 fused serving kernel (kernels/decoder_step.py) is B=1 by
construction: its attention state lives sublane-major as two lanes of a
(T_pad, 128) buffer, which makes the location conv a chain of sublane
rolls — elegant for one row, O(B) for a batch. Round 2's B=8 serving
measurement therefore compared the XLA batched decode against a
B=1-shaped kernel (VERDICT r2 #6). This kernel is the genuinely batched
counterpart: up to 8 rows (one fp32 sublane tile) decode together with
every decoder weight VMEM-resident, using the T-MAJOR tiled attention
layout of the training kernels (kernels/train_scan.py):

- attention weights/cumulative live as (8, T_pad) lane vectors;
- the location conv + query for each 64-position tile is ONE MXU matmul
  ``[w_window ; wcum_window ; q] @ band`` against the same windowed
  banded-Toeplitz constant the training kernels use (shared across
  tiles, size independent of T_in);
- energies reduce with the v-folded block-diagonal selector; softmax is
  a lane reduction; the context is a lane-slice multiply-reduce against
  the (8, T_pad*e) memory.

Per-row gate latching, reduction-factor frame groups, and the streamed
prenet-dropout keep masks follow decoder_step.py semantics (reference
model.py:340-379 and the model.py:99 inference-dropout quirk).

Envelope: batch <= 32 (rows padded to sublane tiles of 8 — round 5
extended the round-4 B<=8 single-tile form); (prenet_dim, encoder_embedding_dim,
attention_rnn_dim, decoder_rnn_dim, attention_dim) multiples of 128;
n_mel_channels * n_frames_per_step < 128; T_in <= 512.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.kernels import train_scan
from tacotron2_tpu.kernels.decoder_step import (GATE_MASK,
                                                gate_logit_threshold)
from tacotron2_tpu.kernels.train_scan import CS, TT, WOFF


class BatchDecoderParams(NamedTuple):
    """Packed device-resident weights (``pack_batch_decoder_params``).
    The core (w1/b1/w2/b2/wq/band/selv) is the training kernels' resident
    layout — T_in-independent, reusable across utterances."""
    pre1: jnp.ndarray   # (n, p)
    pre2: jnp.ndarray   # (p, p)
    w1: jnp.ndarray     # (p + e + a, 4a)
    b1: jnp.ndarray     # (1, 4a) fp32
    w2: jnp.ndarray     # (a + e + d, 4d)
    b2: jnp.ndarray     # (1, 4d) fp32
    wq: jnp.ndarray     # (a, datt)
    band: jnp.ndarray   # (2*CS + datt, TT*datt) windowed Toeplitz + qsel
    selv: jnp.ndarray   # (TT*datt, TT) v-folded energy selector
    wpe: jnp.ndarray    # (d + e, 128): mel cols 0:n, gate col n
    bpe: jnp.ndarray    # (1, 128) fp32


def batch_supported(cfg: Tacotron2Config, t_in: int, batch: int) -> bool:
    n = cfg.n_mel_channels * cfg.n_frames_per_step
    dims = train_scan.scan_dims(cfg, t_in)
    aligned = all(x % 128 == 0 for x in
                  (dims.p, dims.e, dims.a, dims.d, dims.datt))
    return (aligned and n < 128 and batch <= 32 and dims.t_pad <= 512
            and dims.ks % 2 == 1 and dims.ks <= 2 * WOFF + 1)


def pack_batch_decoder_params(params, cfg: Tacotron2Config,
                              dtype=jnp.bfloat16) -> BatchDecoderParams:
    dp = params["decoder"]
    core = {
        "attention_rnn": dp["attention_rnn"],
        "decoder_rnn": dp["decoder_rnn"],
        "attention": {k: dp["attention"][k]
                      for k in ("query", "v", "location_conv",
                                "location_dense")},
    }
    dims = train_scan.scan_dims(cfg, TT)  # band/selv are T_in-independent
    w1, b1, w2, b2, wq, band, selv = train_scan.pack_weights(
        core, dims, dtype)

    n = cfg.n_mel_channels * cfg.n_frames_per_step
    d, e = cfg.decoder_rnn_dim, cfg.encoder_embedding_dim
    f32 = np.float32
    wpe = np.zeros((d + e, 128), f32)
    wpe[:, 0:n] = np.asarray(dp["projection"]["kernel"], f32)
    wpe[:, n] = np.asarray(dp["gate"]["kernel"], f32)[:, 0]
    bpe = np.zeros((1, 128), f32)
    bpe[0, 0:n] = np.asarray(dp["projection"]["bias"], f32)
    bpe[0, n] = float(np.asarray(dp["gate"]["bias"], f32)[0])

    return BatchDecoderParams(
        pre1=jnp.asarray(dp["prenet"][0]["kernel"], dtype),
        pre2=jnp.asarray(dp["prenet"][1]["kernel"], dtype),
        w1=w1, b1=b1, w2=w2, b2=b2, wq=wq, band=band, selv=selv,
        wpe=jnp.asarray(wpe, dtype), bpe=jnp.asarray(bpe))


def _make_kernel(dims, n: int, gate_logit: float, dropout: bool, dtype,
                 rows: int = 8):
    d = dims
    T = d.t_pad
    W = d.w_win
    f32 = jnp.float32

    def kernel(*refs):
        it = iter(refs)
        (pre1, pre2, w1, b1, w2, b2, wq, band, selv, wpe, bpe,
         proc, mem, emask) = (next(it) for _ in range(14))
        kp1_r = next(it) if dropout else None
        kp2_r = next(it) if dropout else None
        (h1i, c1i, h2i, c2i, wi, wci, ctxi, previ, flagsi) = \
            (next(it) for _ in range(9))
        (frames_o, align_o, h1o, c1o, h2o, c2o, wo, wco, ctxo, prevo,
         flagso) = (next(it) for _ in range(11))
        (x1, x2, x3, cat, wsp, wcsp, efull) = \
            (next(it) for _ in range(7))

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h1o[:] = h1i[:]
            c1o[:] = c1i[:]
            h2o[:] = h2i[:]
            c2o[:] = c2i[:]
            ctxo[:] = ctxi[:]
            prevo[:] = previ[:]
            flagso[:] = flagsi[:]
            wsp[:] = jnp.zeros_like(wsp)
            wcsp[:] = jnp.zeros_like(wcsp)
            wsp[:, WOFF:WOFF + T] = wi[:]
            wcsp[:, WOFF:WOFF + T] = wci[:]
            cat[:] = jnp.zeros_like(cat)

        fin_col = (flagso[:, 0:1] > 0).astype(f32)        # (rows, 1)
        t0 = flagso[0, 2]

        # ---- prenet (2x dense+relu; optional streamed dropout masks,
        # fold_in(fold_in(rng, t), layer) derivation — model.py:99) ----
        pm = prevo[:, 0:n].astype(dtype)
        a1 = jax.nn.relu(jnp.dot(pm, pre1[:],
                                 preferred_element_type=f32))
        if dropout:
            a1 = a1 * (kp1_r[0] * 2.0)
        a2 = jax.nn.relu(jnp.dot(a1.astype(dtype), pre2[:],
                                 preferred_element_type=f32))
        if dropout:
            a2 = a2 * (kp2_r[0] * 2.0)

        # ---- attention LSTM ----
        x1[:, 0:d.p] = a2.astype(dtype)
        x1[:, d.p:d.p + d.e] = ctxo[:].astype(dtype)
        x1[:, d.p + d.e:d.k1] = h1o[:].astype(dtype)
        g1 = jnp.dot(x1[:], w1[:], preferred_element_type=f32) + b1[0]
        c1n = (jax.nn.sigmoid(g1[:, d.a:2 * d.a]) * c1o[:]
               + jax.nn.sigmoid(g1[:, 0:d.a])
               * jnp.tanh(g1[:, 2 * d.a:3 * d.a]))
        h1n = jax.nn.sigmoid(g1[:, 3 * d.a:4 * d.a]) * jnp.tanh(c1n)

        # ---- location attention (t-major windowed tiles) ----
        q = jnp.dot(h1n.astype(dtype), wq[:], preferred_element_type=f32)
        cat[:, 2 * CS:2 * CS + d.datt] = q.astype(dtype)
        for i in range(d.n_tiles):
            cat[:, 0:W] = wsp[:, i * TT:i * TT + W].astype(dtype)
            cat[:, CS:CS + W] = wcsp[:, i * TT:i * TT + W].astype(dtype)
            m = jnp.dot(cat[:], band[:], preferred_element_type=f32)
            feat = jnp.tanh(
                m + proc[:, i * d.ttd:(i + 1) * d.ttd].astype(f32))
            efull[:, i * TT:(i + 1) * TT] = jnp.dot(
                feat.astype(dtype), selv[:], preferred_element_type=f32)
        e_m = efull[:] + emask[:]
        mx = jnp.max(e_m, axis=1, keepdims=True)
        ex = jnp.exp(e_m - mx)
        wnew = ex / jnp.sum(ex, axis=1, keepdims=True)     # (rows, T)
        # Context via a fully unrolled lane-slice multiply-accumulate.
        # Deliberate tradeoff (ADVICE r3): at T=512 this emits ~2*T
        # small VPU ops into the Mosaic program — larger compile time /
        # program size than a matmul formulation, but the MXU
        # alternative (replicate wnew across e lanes with a (TT, TT*e)
        # selector, log-tree lane reduction) costs ~4.3 GF-equivalent
        # MXU time per step at M=8 (~20 us at peak) vs single-digit us
        # for this loop (the whole B=8 step measured ~5 us/step at
        # T=128, PERFORMANCE.md round 3), and per-row matvecs cannot
        # ride the MXU without a lane->sublane relayout of memory. The
        # batch_supported T_in <= 512 cap bounds the unroll.
        ctx = jnp.zeros((rows, d.e), f32)
        for tt in range(T):
            ctx = ctx + wnew[:, tt:tt + 1] * mem[:, tt * d.e:
                                                 (tt + 1) * d.e].astype(f32)

        # ---- decoder LSTM ----
        x2[:, 0:d.a] = h1n.astype(dtype)
        x2[:, d.a:d.a + d.e] = ctx.astype(dtype)
        x2[:, d.a + d.e:d.k2] = h2o[:].astype(dtype)
        g2 = jnp.dot(x2[:], w2[:], preferred_element_type=f32) + b2[0]
        c2n = (jax.nn.sigmoid(g2[:, d.d:2 * d.d]) * c2o[:]
               + jax.nn.sigmoid(g2[:, 0:d.d])
               * jnp.tanh(g2[:, 2 * d.d:3 * d.d]))
        h2n = jax.nn.sigmoid(g2[:, 3 * d.d:4 * d.d]) * jnp.tanh(c2n)

        # ---- mel + gate projection (packed) ----
        x3[:, 0:d.d] = h2n.astype(dtype)
        x3[:, d.d:d.d + d.e] = ctx.astype(dtype)
        out = jnp.dot(x3[:], wpe[:], preferred_element_type=f32) + bpe[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        live = jnp.where(lane <= n, out, 0.0)
        dead = jnp.where(lane == n, GATE_MASK, 0.0)
        frames_o[0] = jnp.where(fin_col > 0, dead, live)
        align_o[0] = jnp.where(fin_col > 0, 0.0, wnew)

        gate = out[:, n:n + 1]                             # (rows, 1)
        lens = flagso[:, 1:2]
        new_len = jnp.where(fin_col > 0, lens,
                            jnp.zeros_like(lens) + t0 + t + 1)
        new_fin = jnp.where(
            jnp.logical_or(fin_col > 0, gate > gate_logit), 1, 0)
        lane_f = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        flagso[:] = jnp.where(
            lane_f == 0, new_fin,
            jnp.where(lane_f == 1, new_len,
                      jnp.where(lane_f == 2, t0, 0)))
        prevo[:] = jnp.where(lane < n, out, 0.0)

        # state updates
        h1o[:] = h1n
        c1o[:] = c1n
        h2o[:] = h2n
        c2o[:] = c2n
        ctxo[:] = ctx
        wsp[:, WOFF:WOFF + T] = wnew
        wcsp[:, WOFF:WOFF + T] = wcsp[:, WOFF:WOFF + T] + wnew
        wo[:] = wnew
        wco[:] = wcsp[:, WOFF:WOFF + T]

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "n", "chunk_steps",
                                             "gate_logit", "interpret",
                                             "dtype", "dropout", "rows"))
def _batch_chunk_call(fp: BatchDecoderParams, proc_flat, mem_flat, emask,
                      h1, c1, h2, c2, w0, wc0, ctx, prev, flags, kp1, kp2,
                      dims, n: int, chunk_steps: int, gate_logit: float,
                      interpret: bool, dtype, dropout: bool,
                      rows: int = 8):
    d = dims
    f32 = jnp.float32
    kern = _make_kernel(d, n, gate_logit, dropout, dtype, rows=rows)

    const = lambda shape: pl.BlockSpec(
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    in_specs = [const(x.shape) for x in
                (fp.pre1, fp.pre2, fp.w1, fp.b1, fp.w2, fp.b2, fp.wq,
                 fp.band, fp.selv, fp.wpe, fp.bpe, proc_flat, mem_flat,
                 emask)]
    inputs = [fp.pre1, fp.pre2, fp.w1, fp.b1, fp.w2, fp.b2, fp.wq,
              fp.band, fp.selv, fp.wpe, fp.bpe, proc_flat, mem_flat,
              emask]
    if dropout:
        mask_spec = pl.BlockSpec((1, rows, d.p), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [mask_spec, mask_spec]
        inputs += [kp1, kp2]
    in_specs += [const(x.shape) for x in
                 (h1, c1, h2, c2, w0, wc0, ctx, prev, flags)]
    inputs += [h1, c1, h2, c2, w0, wc0, ctx, prev, flags]

    outs = [
        jax.ShapeDtypeStruct((chunk_steps, rows, 128), f32),    # frames
        jax.ShapeDtypeStruct((chunk_steps, rows, d.t_pad), f32),  # align
        jax.ShapeDtypeStruct((rows, d.a), f32),     # h1
        jax.ShapeDtypeStruct((rows, d.a), f32),     # c1
        jax.ShapeDtypeStruct((rows, d.d), f32),     # h2
        jax.ShapeDtypeStruct((rows, d.d), f32),     # c2
        jax.ShapeDtypeStruct((rows, d.t_pad), f32),  # w
        jax.ShapeDtypeStruct((rows, d.t_pad), f32),  # w_cum
        jax.ShapeDtypeStruct((rows, d.e), f32),     # ctx
        jax.ShapeDtypeStruct((rows, 128), f32),     # prev
        jax.ShapeDtypeStruct((rows, 128), jnp.int32),  # flags
    ]
    out_specs = [
        pl.BlockSpec((1, rows, 128), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows, d.t_pad), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [const(o.shape) for o in outs[2:]]

    scratch = [
        pltpu.VMEM((rows, d.k1), dtype), pltpu.VMEM((rows, d.k2), dtype),
        pltpu.VMEM((rows, d.d + d.e), dtype),
        pltpu.VMEM((rows, d.cat_w), dtype),
        pltpu.VMEM((rows, d.t_pad + 2 * WOFF), f32),
        pltpu.VMEM((rows, d.t_pad + 2 * WOFF), f32),
        pltpu.VMEM((rows, d.t_pad), f32),
    ]
    return pl.pallas_call(
        kern,
        grid=(chunk_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=outs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(*inputs)


def decode_chunk_batch(fp: BatchDecoderParams, carry, memory: jnp.ndarray,
                       processed_memory: jnp.ndarray,
                       mask: Optional[jnp.ndarray],
                       cfg: Tacotron2Config, *, chunk_steps: int,
                       dtype=jnp.bfloat16, interpret: bool = False,
                       rng: Optional[jax.Array] = None):
    """Batched drop-in for ``tacotron2.decode_chunk`` (B <= 8). Same
    carry/return contract. ``rng`` enables the reference's inference
    prenet dropout via streamed keep masks (same derivation as the XLA
    path, with each row sharing the step's mask exactly like the XLA
    decode draws one (B, p) mask per step — NOTE: the XLA mask is drawn
    at width B, so batch-width parity holds only for the same B)."""
    from tacotron2_tpu.models.tacotron2 import StreamCarry, DecoderState

    B, t_in, e = memory.shape
    assert B <= 32, "batched fused decoder covers B <= 32 (sublane tiles)"
    d = train_scan.scan_dims(cfg, t_in)
    n = cfg.n_mel_channels * cfg.n_frames_per_step
    r = cfg.n_frames_per_step
    f32 = jnp.float32

    rows = -(-B // 8) * 8            # 8/16/24/32 sublane-tile rows
    pad_b = rows - B
    padB = lambda x: jnp.pad(x.astype(f32), ((0, pad_b),) +
                             ((0, 0),) * (x.ndim - 1))
    mem8 = jnp.pad(memory, ((0, pad_b), (0, 0), (0, 0)))
    proc8 = jnp.pad(processed_memory, ((0, pad_b), (0, 0), (0, 0)))
    if mask is None:
        mask = jnp.ones((B, t_in), bool)
    mask8 = jnp.pad(mask, ((0, pad_b), (0, 0)))  # pad rows all-invalid
    mem_flat, proc_flat, emask = train_scan.pack_batch(
        mem8, proc8, mask8, d, dtype)

    s = carry.state
    T = d.t_pad
    padT = T - t_in
    w0 = jnp.pad(s.att_weights.astype(f32), ((0, pad_b), (0, padT)))
    wc0 = jnp.pad(s.att_weights_cum.astype(f32), ((0, pad_b), (0, padT)))
    h1, c1 = padB(s.att_h), padB(s.att_c)
    h2, c2 = padB(s.dec_h), padB(s.dec_c)
    ctx = padB(s.att_context)
    prev = jnp.pad(carry.prev_mel.astype(f32),
                   ((0, pad_b), (0, 128 - n)))
    flags = jnp.zeros((rows, 128), jnp.int32)
    fin0 = jnp.pad(carry.finished.astype(jnp.int32),
                   (0, pad_b), constant_values=1)  # pad rows: finished
    len0 = jnp.pad(carry.lengths, (0, pad_b))
    flags = flags.at[:, 0].set(fin0)
    flags = flags.at[:, 1].set(len0)
    flags = flags.at[:, 2].set(carry.t)

    if rng is not None:
        from tacotron2_tpu.kernels.decoder_step import _prenet_keep_masks
        kp1, kp2 = _prenet_keep_masks(rng, carry.t, chunk_steps, d.p, B,
                                      rows=rows)
    else:
        kp1 = kp2 = jnp.zeros((1,), f32)

    (frames, align_tc, h1o, c1o, h2o, c2o, wo, wco, ctxo, prevo,
     flagso) = _batch_chunk_call(
        fp, proc_flat, mem_flat, emask, h1, c1, h2, c2, w0, wc0, ctx,
        prev, flags, kp1, kp2, dims=d, n=n, chunk_steps=chunk_steps,
        gate_logit=gate_logit_threshold(cfg), interpret=interpret, dtype=dtype,
        dropout=rng is not None, rows=rows)

    mel = (frames[:, :B, :n].transpose(1, 0, 2)
           .reshape(B, chunk_steps * r, cfg.n_mel_channels))
    gate = jnp.repeat(frames[:, :B, n].T, r, axis=1)
    align = jnp.repeat(align_tc[:, :B, :t_in].transpose(1, 0, 2), r,
                       axis=1)

    new_state = DecoderState(
        att_h=h1o[:B], att_c=c1o[:B], dec_h=h2o[:B], dec_c=c2o[:B],
        att_weights=wo[:B, :t_in], att_weights_cum=wco[:B, :t_in],
        att_context=ctxo[:B])
    new_carry = StreamCarry(
        t=carry.t + chunk_steps,
        state=new_state,
        prev_mel=prevo[:B, :n],
        finished=flagso[:B, 0] > 0,
        lengths=flagso[:B, 1])
    return new_carry, (mel, gate, align)


def decode_autoregressive_batch(fp: BatchDecoderParams,
                                memory: jnp.ndarray,
                                processed_memory: jnp.ndarray,
                                mask: Optional[jnp.ndarray],
                                cfg: Tacotron2Config, *,
                                max_steps: Optional[int] = None,
                                chunk_steps: int = 64,
                                dtype=jnp.bfloat16,
                                interpret: bool = False,
                                rng: Optional[jax.Array] = None):
    """Full-utterance batched fused decode: ``lax.while_loop`` over fused
    chunks with early exit once EVERY row's gate latches. Same return
    contract as ``tacotron2.decode_autoregressive``."""
    from tacotron2_tpu.models import tacotron2 as m

    B, t_in, _ = memory.shape
    r = cfg.n_frames_per_step
    t_max = max_steps or cfg.max_decoder_steps
    n_chunks = -(-t_max // chunk_steps)
    cs = chunk_steps

    mel_buf = jnp.zeros((n_chunks, B, cs * r, cfg.n_mel_channels),
                        jnp.float32)
    gate_buf = jnp.full((n_chunks, B, cs * r), GATE_MASK, jnp.float32)
    align_buf = jnp.zeros((n_chunks, B, cs * r, t_in), jnp.float32)

    def cond(c):
        i, carry, *_ = c
        return jnp.logical_and(i < n_chunks,
                               jnp.logical_not(jnp.all(carry.finished)))

    def body(c):
        i, carry, mels, gates, aligns = c
        carry, (mel, gate, align) = decode_chunk_batch(
            fp, carry, memory, processed_memory, mask, cfg,
            chunk_steps=cs, dtype=dtype, interpret=interpret, rng=rng)
        return (i + 1, carry,
                mels.at[i].set(mel),
                gates.at[i].set(gate),
                aligns.at[i].set(align))

    init = (0, m.init_stream_carry(memory, cfg), mel_buf, gate_buf,
            align_buf)
    _, carry, mels, gates, aligns = jax.lax.while_loop(cond, body, init)

    mel_frames = (mels.transpose(1, 0, 2, 3)
                  .reshape(B, n_chunks * cs * r,
                           cfg.n_mel_channels)[:, :t_max * r])
    gate_frames = (gates.transpose(1, 0, 2)
                   .reshape(B, n_chunks * cs * r)[:, :t_max * r])
    align_frames = (aligns.transpose(1, 0, 2, 3)
                    .reshape(B, n_chunks * cs * r, t_in)[:, :t_max * r])
    lengths = jnp.minimum(carry.lengths, t_max) * r
    return mel_frames, gate_frames, align_frames, lengths
