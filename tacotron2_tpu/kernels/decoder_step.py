"""Pallas TPU kernel: fully fused autoregressive decoder chunk.

B=1 autoregressive decoding (the serving latency path) spends its time in
a chain of ~30 small XLA ops per frame — two LSTM cells, the
location-sensitive attention, prenet and projections — whose weights are
re-streamed from HBM every step (~36 MB/step in bf16, the roofline in
PERFORMANCE.md). This kernel runs a whole CHUNK of decoder steps in ONE
``pallas_call`` with ``grid=(chunk_steps,)``:

- every weight matrix is a kernel input with a CONSTANT index_map, so the
  Pallas pipeline fetches it into VMEM once and it stays resident for the
  whole chunk — per-step HBM weight traffic drops to zero;
- the recurrent state (LSTM h/c, attention weights/cumulative, context,
  previous frame, gate latch) lives in the output buffers, which also have
  constant index_maps and therefore persist in VMEM across grid steps;
- the whole per-step op chain (prenet -> attention LSTM -> location
  attention -> decoder LSTM -> mel/gate projection -> per-row gate latch)
  executes inside the kernel with no XLA scan bookkeeping between steps.

Semantics are step-for-step identical to ``tacotron2.decode_chunk`` with
a deterministic prenet (rng=None); the wrapper falls back is the caller's
job when prenet dropout at inference is wanted. B=1 only — the batch
dimension is padded to the 8-row f32 tile internally, and rows 1..7 carry
bounded garbage that is never read.

Layout choices (all transposeless):
- attention weights + cumulative weights live SUBLANE-major as the first
  two lanes of a (T_pad, 128) buffer, so the location conv is 31
  sublane-rolls + broadcast outer products, the softmax is a sublane
  reduction, and the context is a VPU multiply-reduce against the
  (T_pad, e) memory — no in-kernel transposes anywhere;
- the mel projection and gate layer are packed into one (d+e, 128) matrix
  (gate logit in lane n_mels*r), so one dot emits the whole frame;
- LSTM gate blocks are padded per-block to the 128-lane boundary so the
  i/f/g/o split stays slice-aligned for any hidden size.

Reference semantics: Decoder.decode (/root/reference/model.py:340-379)
with the per-row gate latch of decode_chunk (batched stopping that the
reference's B=1 ``while`` loop at model.py:435-449 cannot do).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tacotron2_tpu.config import Tacotron2Config

NEG = -1e30  # -inf stand-in: keeps garbage rows finite through softmax
GATE_MASK = 1e3  # MASKED_GATE_ENERGY (reference model.py:495)


def gate_logit_threshold(cfg: Tacotron2Config) -> float:
    """sigmoid(gate) > threshold as a logit comparison (shared by the
    fused decoders; keeps the thr<=0 / thr>=1 edge semantics in one
    place)."""
    thr = cfg.gate_threshold
    if thr <= 0.0:
        return -1e30
    if thr >= 1.0:
        return 1e30
    return math.log(thr) - math.log1p(-thr)


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


class FusedDims(NamedTuple):
    """Static layout of the fused kernel (one per (cfg, T_pad) pair)."""
    p: int      # prenet_dim
    e: int      # encoder_embedding_dim
    a: int      # attention_rnn_dim
    d: int      # decoder_rnn_dim
    n: int      # n_mel_channels * n_frames_per_step (frame group)
    D: int      # attention_dim, padded to 128 lanes
    ks: int     # location conv kernel size (odd)
    ap: int     # a padded to 128 (gate block stride)
    dp: int     # d padded to 128
    k1: int     # p + e + a padded to 128 (attention LSTM input rows)
    k2: int     # a + e + d padded to 128
    k3: int     # d + e padded to 128
    kr: int     # location kernel rows (2*ks padded to 8)
    t_pad: int  # padded encoder length (sublanes)


def fused_dims(cfg: Tacotron2Config, t_in: int) -> FusedDims:
    p, e = cfg.prenet_dim, cfg.encoder_embedding_dim
    a, d = cfg.attention_rnn_dim, cfg.decoder_rnn_dim
    n = cfg.n_mel_channels * cfg.n_frames_per_step
    if n >= 128:
        raise ValueError("frame group + gate must fit one 128 lane tile")
    return FusedDims(
        p=p, e=e, a=a, d=d, n=n,
        D=_pad128(cfg.attention_dim),
        ks=cfg.attention_location_kernel_size,
        ap=_pad128(a), dp=_pad128(d),
        k1=_pad128(p + e + a), k2=_pad128(a + e + d), k3=_pad128(d + e),
        kr=_pad8(2 * cfg.attention_location_kernel_size),
        t_pad=_pad8(t_in))


class FusedDecoderParams(NamedTuple):
    """Packed device-resident weights (see ``pack_decoder_params``)."""
    pre1: jnp.ndarray   # (n, p)
    pre2: jnp.ndarray   # (p, p)
    w1: jnp.ndarray     # (k1, 4*ap)  [prenet ; context ; h1] -> gates
    b1: jnp.ndarray     # (1, 4*ap)
    wq: jnp.ndarray     # (a, D)
    lock: jnp.ndarray   # (kr, D) combined location kernel: rows 2k+c
    v: jnp.ndarray      # (D, 128) energies vector in lane 0
    w2: jnp.ndarray     # (k2, 4*dp)  [h1 ; context ; h2] -> gates
    b2: jnp.ndarray     # (1, 4*dp)
    wpe: jnp.ndarray    # (k3, 128) mel cols 0:n, gate col n
    bpe: jnp.ndarray    # (1, 128)


def pack_decoder_params(params, cfg: Tacotron2Config,
                        dtype=jnp.bfloat16) -> FusedDecoderParams:
    """Repack the decoder pytree into the kernel's padded layout.

    ``dtype`` is the resident/matmul dtype of the big matrices (bfloat16
    for serving; float32 for exact-parity tests). Gate blocks of the LSTM
    weights are padded per block so i/f/g/o splits stay 128-aligned.
    """
    dims = fused_dims(cfg, 8)  # t_pad irrelevant for weights
    dp_ = params["decoder"]
    f32 = np.float32

    def split_pad_gates(w, h, hp):
        # (rows, 4h) -> (rows, 4hp) with each gate block padded to hp
        blocks = np.split(np.asarray(w, f32), 4, axis=1)
        return np.concatenate(
            [np.pad(b, ((0, 0), (0, hp - h))) for b in blocks], axis=1)

    d = dims
    # attention LSTM: input = [prenet(p) ; context(e)] rows, then h1(a)
    w1 = np.zeros((d.k1, 4 * d.ap), f32)
    wi1 = split_pad_gates(dp_["attention_rnn"]["wi"], d.a, d.ap)
    wh1 = split_pad_gates(dp_["attention_rnn"]["wh"], d.a, d.ap)
    w1[0:d.p + d.e] = wi1
    w1[d.p + d.e:d.p + d.e + d.a] = wh1
    b1 = (np.asarray(dp_["attention_rnn"]["bi"], f32)
          + np.asarray(dp_["attention_rnn"]["bh"], f32))
    b1 = split_pad_gates(b1[None, :], d.a, d.ap)

    # decoder LSTM: input = [h1(a) ; context(e)] rows, then h2(d)
    w2 = np.zeros((d.k2, 4 * d.dp), f32)
    wi2 = split_pad_gates(dp_["decoder_rnn"]["wi"], d.d, d.dp)
    wh2 = split_pad_gates(dp_["decoder_rnn"]["wh"], d.d, d.dp)
    w2[0:d.a + d.e] = wi2
    w2[d.a + d.e:d.a + d.e + d.d] = wh2
    b2 = (np.asarray(dp_["decoder_rnn"]["bi"], f32)
          + np.asarray(dp_["decoder_rnn"]["bh"], f32))
    b2 = split_pad_gates(b2[None, :], d.d, d.dp)

    att = dp_["attention"]
    D_real = np.asarray(att["query"]["kernel"], f32).shape[1]
    wq = np.zeros((d.a, d.D), f32)
    wq[:, :D_real] = np.asarray(att["query"]["kernel"], f32)
    # combined location kernel: conv (ks, 2, F) @ dense (F, D) -> (ks,2,D)
    ck = np.asarray(att["location_conv"]["kernel"], f32)   # (ks, 2, F)
    ld = np.asarray(att["location_dense"]["kernel"], f32)  # (F, D_real)
    m = np.einsum("kcf,fD->kcD", ck, ld)                   # (ks, 2, D_real)
    lock = np.zeros((d.kr, d.D), f32)
    lock[:2 * d.ks, :D_real] = m.reshape(2 * d.ks, D_real)
    v = np.zeros((d.D, 128), f32)
    v[:D_real, 0] = np.asarray(att["v"]["kernel"], f32)[:, 0]

    wpe = np.zeros((d.k3, 128), f32)
    wpe[0:d.d + d.e, 0:d.n] = np.asarray(dp_["projection"]["kernel"], f32)
    wpe[0:d.d + d.e, d.n] = np.asarray(dp_["gate"]["kernel"], f32)[:, 0]
    bpe = np.zeros((1, 128), f32)
    bpe[0, 0:d.n] = np.asarray(dp_["projection"]["bias"], f32)
    bpe[0, d.n] = float(np.asarray(dp_["gate"]["bias"], f32)[0])

    as_dev = lambda x: jnp.asarray(x, dtype)
    return FusedDecoderParams(
        pre1=as_dev(dp_["prenet"][0]["kernel"]),
        pre2=as_dev(dp_["prenet"][1]["kernel"]),
        w1=as_dev(w1), b1=jnp.asarray(b1),
        wq=as_dev(wq), lock=jnp.asarray(lock), v=as_dev(v),
        w2=as_dev(w2), b2=jnp.asarray(b2),
        wpe=as_dev(wpe), bpe=jnp.asarray(bpe))


def _make_kernel(dims: FusedDims, chunk: int, gate_logit: float, dtype,
                 dropout: bool):
    d = dims
    pad = (d.ks - 1) // 2

    def kernel(*refs):
        it = iter(refs)
        (pre1, pre2, w1, b1, wq, lock, v, proc, mem, maskc,
         w2, b2, wpe, bpe) = (next(it) for _ in range(14))
        kp1_r = next(it) if dropout else None
        kp2_r = next(it) if dropout else None
        (h1i, c1i, h2i, c2i, atti, ctxi, previ, flagsi,
         frames_o, align_o,
         h1o, c1o, h2o, c2o, atto, ctxo, prevo, flagso,
         x1, x2, x3) = (next(it) for _ in range(21))
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h1o[:] = h1i[:]
            c1o[:] = c1i[:]
            h2o[:] = h2i[:]
            c2o[:] = c2i[:]
            atto[:] = atti[:]
            ctxo[:] = ctxi[:]
            prevo[:] = previ[:]
            flagso[:] = flagsi[:]
            x1[:] = jnp.zeros_like(x1)
            x2[:] = jnp.zeros_like(x2)
            x3[:] = jnp.zeros_like(x3)

        fin = flagso[0, 0]
        length = flagso[0, 1]
        t0 = flagso[0, 2]
        fin_b = fin > 0

        # ---- prenet (2x dense+relu, no bias; optional streamed dropout
        # keep masks — the reference keeps prenet dropout ACTIVE at
        # inference, model.py:99, and the masks are precomputed outside
        # with the exact fold_in(fold_in(rng, t), layer) derivation of
        # the XLA path, so the pattern is bit-identical) ----
        pm = prevo[:, 0:d.n].astype(dtype)
        a1 = jax.nn.relu(jnp.dot(pm, pre1[:],
                                 preferred_element_type=jnp.float32))
        if dropout:
            a1 = a1 * (kp1_r[0] * 2.0)  # p=0.5: 1/(1-p) == exactly 2
        a2 = jax.nn.relu(jnp.dot(a1.astype(dtype), pre2[:],
                                 preferred_element_type=jnp.float32))
        if dropout:
            a2 = a2 * (kp2_r[0] * 2.0)

        # ---- attention LSTM ----
        x1[:, 0:d.p] = a2
        x1[0:1, d.p:d.p + d.e] = ctxo[0:1, :]
        x1[:, d.p + d.e:d.p + d.e + d.a] = h1o[:, 0:d.a]
        g1 = jnp.dot(x1[:].astype(dtype), w1[:],
                     preferred_element_type=jnp.float32) + b1[0]
        c1 = (jax.nn.sigmoid(g1[:, d.ap:2 * d.ap]) * c1o[:]
              + jax.nn.sigmoid(g1[:, 0:d.ap])
              * jnp.tanh(g1[:, 2 * d.ap:3 * d.ap]))
        h1 = jax.nn.sigmoid(g1[:, 3 * d.ap:4 * d.ap]) * jnp.tanh(c1)
        c1o[:] = c1
        h1o[:] = h1

        # ---- location-sensitive attention ----
        q = jnp.dot(h1[:, 0:d.a].astype(dtype), wq[:],
                    preferred_element_type=jnp.float32)       # (8, D)
        tau = jax.lax.broadcasted_iota(jnp.int32, (d.t_pad, 1), 0)
        loc = jnp.zeros((d.t_pad, d.D), jnp.float32)
        for k in range(d.ks):
            delta = k - pad
            rolled = pltpu.roll(atto[:], (-delta) % d.t_pad, axis=0)
            ok = jnp.logical_and(tau + delta >= 0, tau + delta < d.t_pad)
            att_c = jnp.where(ok, rolled[:, 0:1], 0.0)
            cum_c = jnp.where(ok, rolled[:, 1:2], 0.0)
            loc = (loc + att_c * lock[2 * k:2 * k + 1, :].astype(jnp.float32)
                   + cum_c * lock[2 * k + 1:2 * k + 2, :]
                   .astype(jnp.float32))
        feat = jnp.tanh(q[0:1, :] + loc + proc[:])
        e_col = jnp.dot(feat.astype(dtype), v[:],
                        preferred_element_type=jnp.float32)[:, 0:1]
        e_m = jnp.where(maskc[:] > 0, e_col, NEG)
        w_ = jnp.exp(e_m - jnp.max(e_m, axis=0, keepdims=True))
        attw = w_ / jnp.sum(w_, axis=0, keepdims=True)        # (t_pad, 1)
        cum = atto[:, 1:2] + attw
        lane_t = jax.lax.broadcasted_iota(jnp.int32, (d.t_pad, 128), 1)
        atto[:] = jnp.where(lane_t == 0, attw,
                            jnp.where(lane_t == 1, cum, 0.0))
        ctx = jnp.sum(mem[:] * attw, axis=0, keepdims=True)   # (1, e)
        sub_e = jax.lax.broadcasted_iota(jnp.int32, (8, d.e), 0)
        ctxo[:] = jnp.where(sub_e == 0, ctx, 0.0)

        # ---- decoder LSTM ----
        x2[:, 0:d.a] = h1[:, 0:d.a]
        x2[0:1, d.a:d.a + d.e] = ctx
        x2[:, d.a + d.e:d.a + d.e + d.d] = h2o[:, 0:d.d]
        g2 = jnp.dot(x2[:].astype(dtype), w2[:],
                     preferred_element_type=jnp.float32) + b2[0]
        c2 = (jax.nn.sigmoid(g2[:, d.dp:2 * d.dp]) * c2o[:]
              + jax.nn.sigmoid(g2[:, 0:d.dp])
              * jnp.tanh(g2[:, 2 * d.dp:3 * d.dp]))
        h2 = jax.nn.sigmoid(g2[:, 3 * d.dp:4 * d.dp]) * jnp.tanh(c2)
        c2o[:] = c2
        h2o[:] = h2

        # ---- mel + gate projection (packed) ----
        x3[:, 0:d.d] = h2[:, 0:d.d]
        x3[0:1, d.d:d.d + d.e] = ctx
        out = jnp.dot(x3[:].astype(dtype), wpe[:],
                      preferred_element_type=jnp.float32) + bpe[0]

        row = out[0:1, :]                                     # (1, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        live = jnp.where(jnp.logical_and(lane <= d.n, sub == 0), row, 0.0)
        dead = jnp.where(jnp.logical_and(lane == d.n, sub == 0),
                         GATE_MASK, 0.0)
        frames_o[0] = jnp.where(fin_b, dead, live)
        align_o[0] = jnp.where(fin_b, 0.0,
                               attw * jnp.ones((1, 128), jnp.float32))

        gate = out[0, d.n]
        new_len = jnp.where(fin_b, length, t0 + t + 1)
        new_fin = jnp.where(jnp.logical_or(fin_b, gate > gate_logit), 1, 0)
        lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        flagso[:] = jnp.where(
            lane_f == 0, new_fin,
            jnp.where(lane_f == 1, new_len,
                      jnp.where(lane_f == 2, t0, 0)))
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        prevo[:] = jnp.where(lane8 < d.n, out, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "chunk_steps",
                                              "gate_logit", "interpret",
                                              "dtype", "dropout"))
def _fused_chunk_call(fp: FusedDecoderParams, memory, processed, maskc,
                      h1, c1, h2, c2, attmat, ctx, prev, flags, kp1, kp2,
                      dims: FusedDims, chunk_steps: int, gate_logit: float,
                      interpret: bool, dtype, dropout: bool):
    kern = _make_kernel(dims, chunk_steps, gate_logit, dtype, dropout)
    d = dims

    const = lambda shape: pl.BlockSpec(shape, lambda t: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    outs = [
        jax.ShapeDtypeStruct((chunk_steps, 8, 128), jnp.float32),  # frames
        jax.ShapeDtypeStruct((chunk_steps, d.t_pad, 128),
                             jnp.float32),                         # align
        jax.ShapeDtypeStruct((8, d.ap), jnp.float32),   # h1
        jax.ShapeDtypeStruct((8, d.ap), jnp.float32),   # c1
        jax.ShapeDtypeStruct((8, d.dp), jnp.float32),   # h2
        jax.ShapeDtypeStruct((8, d.dp), jnp.float32),   # c2
        jax.ShapeDtypeStruct((d.t_pad, 128), jnp.float32),  # attmat
        jax.ShapeDtypeStruct((8, d.e), jnp.float32),    # ctx
        jax.ShapeDtypeStruct((8, 128), jnp.float32),    # prev
        jax.ShapeDtypeStruct((1, 128), jnp.int32),      # flags
    ]
    out_specs = [
        pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d.t_pad, 128), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        const((8, d.ap)), const((8, d.ap)),
        const((8, d.dp)), const((8, d.dp)),
        const((d.t_pad, 128)), const((8, d.e)), const((8, 128)),
        const((1, 128)),
    ]
    in_specs = [
        const(fp.pre1.shape), const(fp.pre2.shape),
        const(fp.w1.shape), const(fp.b1.shape),
        const(fp.wq.shape), const(fp.lock.shape), const(fp.v.shape),
        const(processed.shape), const(memory.shape), const(maskc.shape),
        const(fp.w2.shape), const(fp.b2.shape),
        const(fp.wpe.shape), const(fp.bpe.shape),
    ]
    inputs = [fp.pre1, fp.pre2, fp.w1, fp.b1, fp.wq, fp.lock, fp.v,
              processed, memory, maskc, fp.w2, fp.b2, fp.wpe, fp.bpe]
    if dropout:
        mask_spec = pl.BlockSpec((1, 8, dims.p), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [mask_spec, mask_spec]
        inputs += [kp1, kp2]
    in_specs += [
        const(h1.shape), const(c1.shape), const(h2.shape), const(c2.shape),
        const(attmat.shape), const(ctx.shape), const(prev.shape),
        const(flags.shape),
    ]
    inputs += [h1, c1, h2, c2, attmat, ctx, prev, flags]
    bytes_resident = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                         for a in (fp.w1, fp.w2, fp.wpe, fp.pre1, fp.pre2,
                                   fp.wq, fp.lock, fp.v, memory, processed))
    return pl.pallas_call(
        kern,
        grid=(chunk_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=outs,
        scratch_shapes=[
            pltpu.VMEM((8, d.k1), jnp.float32),
            pltpu.VMEM((8, d.k2), jnp.float32),
            pltpu.VMEM((8, d.k3), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * bytes_resident + 8 * 2 ** 20,
                                 120 * 2 ** 20)),
        interpret=interpret,
    )(*inputs)


def _prenet_keep_masks(rng, t0, chunk_steps: int, p: int, b: int = 1,
                       rows: int = 8):
    """(chunk, rows, p) fp32 0/1 keep masks for both prenet layers, drawn
    with EXACTLY the XLA path's key derivation (decode_chunk:
    key = fold_in(rng, t); prenet_apply: fold_in(key, layer)) at the
    XLA batch width ``b`` — bernoulli is drawn at shape (b, p), exactly
    what ``prenet_apply`` draws for a B=b decode — so the dropout
    pattern is bit-identical per row. Rows b..7 are zero (never read)."""
    def one(t):
        key_t = jax.random.fold_in(rng, t)
        k1 = jax.random.bernoulli(jax.random.fold_in(key_t, 0), 0.5,
                                  (b, p))
        k2 = jax.random.bernoulli(jax.random.fold_in(key_t, 1), 0.5,
                                  (b, p))
        return k1, k2
    k1, k2 = jax.vmap(one)(t0 + jnp.arange(chunk_steps))
    pad = lambda k: jnp.pad(k.astype(jnp.float32),
                            ((0, 0), (0, rows - b), (0, 0)))
    return pad(k1), pad(k2)


def decode_chunk_fused(fp: FusedDecoderParams, carry, memory: jnp.ndarray,
                       processed_memory: jnp.ndarray,
                       mask: Optional[jnp.ndarray],
                       cfg: Tacotron2Config, *, chunk_steps: int,
                       dtype=jnp.bfloat16, interpret: bool = False,
                       rng: Optional[jax.Array] = None):
    """Drop-in replacement for ``tacotron2.decode_chunk`` (B=1). Same
    carry/return contract; ``fp`` is the packed weights from
    ``pack_decoder_params`` (same dtype). ``rng`` enables the
    reference's inference-time prenet dropout (model.py:99) via
    precomputed keep masks streamed into the kernel — round 3; None
    keeps the deterministic prenet.
    """
    from tacotron2_tpu.models.tacotron2 import StreamCarry, DecoderState

    B, t_in, e = memory.shape
    assert B == 1, "fused decoder chunk is the B=1 serving path"
    d = fused_dims(cfg, t_in)
    r = cfg.n_frames_per_step
    f32 = jnp.float32

    padT = d.t_pad - t_in
    mem_p = jnp.pad(memory[0].astype(f32), ((0, padT), (0, 0)))
    proc_full = jnp.pad(processed_memory[0].astype(f32),
                        ((0, padT), (0, d.D - processed_memory.shape[2])))
    if mask is not None:
        maskc = jnp.pad(mask[0].astype(f32), (0, padT))[:, None]
    else:
        maskc = jnp.pad(jnp.ones((t_in,), f32), (0, padT))[:, None]

    s = carry.state
    pad_rows = lambda x, w: jnp.pad(x.astype(f32), ((0, 7), (0, w)))
    h1 = pad_rows(s.att_h, d.ap - d.a)
    c1 = pad_rows(s.att_c, d.ap - d.a)
    h2 = pad_rows(s.dec_h, d.dp - d.d)
    c2 = pad_rows(s.dec_c, d.dp - d.d)
    attmat = jnp.zeros((d.t_pad, 128), f32)
    attmat = attmat.at[:t_in, 0].set(s.att_weights[0].astype(f32))
    attmat = attmat.at[:t_in, 1].set(s.att_weights_cum[0].astype(f32))
    ctx = pad_rows(s.att_context, 0)
    prev = pad_rows(carry.prev_mel, 128 - d.n)
    flags = jnp.zeros((1, 128), jnp.int32)
    flags = flags.at[0, 0].set(carry.finished[0].astype(jnp.int32))
    flags = flags.at[0, 1].set(carry.lengths[0])
    flags = flags.at[0, 2].set(carry.t)

    gate_logit = gate_logit_threshold(cfg)

    if rng is not None:
        kp1, kp2 = _prenet_keep_masks(rng, carry.t, chunk_steps, d.p)
    else:
        kp1 = kp2 = jnp.zeros((1,), f32)  # unused placeholder

    (frames, align_tc, h1o, c1o, h2o, c2o, atto, ctxo, prevo,
     flagso) = _fused_chunk_call(
        fp, mem_p, proc_full, maskc, h1, c1, h2, c2, attmat, ctx, prev,
        flags, kp1, kp2, dims=d, chunk_steps=chunk_steps,
        gate_logit=gate_logit, interpret=interpret, dtype=dtype,
        dropout=rng is not None)

    mel = frames[:, 0, :d.n].reshape(1, chunk_steps * r,
                                     cfg.n_mel_channels)
    gate = jnp.repeat(frames[None, :, 0, d.n], r, axis=1)
    align = jnp.repeat(align_tc[None, :, :t_in, 0], r, axis=1)

    new_state = DecoderState(
        att_h=h1o[0:1, :d.a], att_c=c1o[0:1, :d.a],
        dec_h=h2o[0:1, :d.d], dec_c=c2o[0:1, :d.d],
        att_weights=atto[None, :t_in, 0],
        att_weights_cum=atto[None, :t_in, 1],
        att_context=ctxo[0:1, :])
    new_carry = StreamCarry(
        t=carry.t + chunk_steps,
        state=new_state,
        prev_mel=prevo[0:1, :d.n],
        finished=flagso[0, 0:1] > 0,
        lengths=flagso[0, 1:2])
    return new_carry, (mel, gate, align)


def decode_autoregressive_fused(fp: FusedDecoderParams, memory: jnp.ndarray,
                                processed_memory: jnp.ndarray,
                                mask: Optional[jnp.ndarray],
                                cfg: Tacotron2Config, *,
                                max_steps: Optional[int] = None,
                                chunk_steps: int = 64,
                                dtype=jnp.bfloat16,
                                interpret: bool = False,
                                rng: Optional[jax.Array] = None):
    """Full-utterance fused decode: ``lax.while_loop`` over fused chunks
    with early exit once the gate latches (chunk-granular), all inside one
    jittable function. Same return contract as
    ``tacotron2.decode_autoregressive``: (mel_frames (1, T_max*r, n_mels),
    gate_frames, align_frames, frame lengths).
    """
    from tacotron2_tpu.models import tacotron2 as m

    B, t_in, _ = memory.shape
    assert B == 1
    r = cfg.n_frames_per_step
    t_max = max_steps or cfg.max_decoder_steps
    n_chunks = -(-t_max // chunk_steps)
    cs = chunk_steps

    mel_buf = jnp.zeros((n_chunks, cs * r, cfg.n_mel_channels), jnp.float32)
    gate_buf = jnp.full((n_chunks, cs * r), GATE_MASK, jnp.float32)
    align_buf = jnp.zeros((n_chunks, cs * r, t_in), jnp.float32)

    def cond(c):
        i, carry, *_ = c
        return jnp.logical_and(i < n_chunks,
                               jnp.logical_not(jnp.all(carry.finished)))

    def body(c):
        i, carry, mels, gates, aligns = c
        carry, (mel, gate, align) = decode_chunk_fused(
            fp, carry, memory, processed_memory, mask, cfg,
            chunk_steps=cs, dtype=dtype, interpret=interpret, rng=rng)
        return (i + 1, carry,
                mels.at[i].set(mel[0]),
                gates.at[i].set(gate[0]),
                aligns.at[i].set(align[0]))

    init = (0, m.init_stream_carry(memory, cfg), mel_buf, gate_buf,
            align_buf)
    _, carry, mels, gates, aligns = jax.lax.while_loop(cond, body, init)

    # (n_chunks, cs*r, .) -> (1, T_max*r, .); chunks may overshoot t_max
    mel_frames = mels.reshape(1, n_chunks * cs * r,
                              cfg.n_mel_channels)[:, :t_max * r]
    gate_frames = gates.reshape(1, n_chunks * cs * r)[:, :t_max * r]
    align_frames = aligns.reshape(1, n_chunks * cs * r,
                                  t_in)[:, :t_max * r]
    lengths = jnp.minimum(carry.lengths, t_max) * r
    return mel_frames, gate_frames, align_frames, lengths
