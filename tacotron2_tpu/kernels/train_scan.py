"""Pallas TPU kernel: weights-resident teacher-forced decoder forward scan.

The training step's forward decoder scan re-streams every decoder weight
matrix from HBM on each of the ~512 sequential steps (~36 MB/step in
bf16) — at B=128 that stream is comparable to the step's MXU time, so the
XLA scan sits at max(weight-stream, compute) per step (PERFORMANCE.md).
This kernel runs the WHOLE forward scan as one ``pallas_call`` with
``grid=(T_steps,)``:

- every weight matrix has a constant ``index_map``, so the Pallas
  pipeline fetches it into VMEM once and it stays resident for all steps
  — per-step weight HBM traffic drops to zero;
- the recurrent state (LSTM h/c, attention weights/cumulative, context)
  lives in VMEM scratch, persisting across grid steps;
- per-step residual stacks stream out with ``index_map=(t, 0, 0)`` —
  exactly the ``_Residuals`` the custom-VJP backward
  (models/decoder_vjp.py) consumes, so this kernel drops in as the
  forward of the existing hand-written VJP.

Location-sensitive attention without transposes or 3D relayouts: the
per-step energies tensor ``tanh(q + loc + proc)`` lives FLAT as
``(B, attention_dim * T_pad)`` (lane ``d*T_pad + t``), produced by ONE
MXU matmul ``[w ; w_cum ; q] @ W_big`` where ``W_big`` stacks two banded
Toeplitz matrices (the k=31 location conv folded through the 32->128
location dense — conv over the T lane dim as a banded matmul) and a
query-replication selector. The masked-softmax energies then reduce over
``d`` with a second matmul against a v-folded block-diagonal selector.
This trades ~1.2 GFLOP/step of extra (structured-sparse) MXU work for a
layout in which every op is a plain matmul, lane slice, or lane-dim
reduction.

Numerics vs the XLA forward (``decoder_vjp._forward``): forward math is
the same op chain with fp32 accumulation where the XLA bf16 path
downcasts between its two LSTM gate dots, so values match to bf16
round-off (tests pin ~2e-2 absolute on unit-scale activations); dropout
keep masks are precomputed OUTSIDE with the identical
``fold_in(fold_in(rng, t), 0|1)`` key derivation, so the dropout pattern
is bit-identical to the XLA scan's.

Envelope: bf16 compute, B a multiple of 8, T_in <= 128, and (prenet_dim,
encoder_embedding_dim, attention_rnn_dim, decoder_rnn_dim,
attention_dim) all multiples of 128 (the default 256/512/1024/1024/128
config qualifies). ``supported()`` reports eligibility; callers fall
back to the XLA scan otherwise.

Reference behavior covered: the teacher-forced decoder loop
(/root/reference/model.py:381-416) including per-step attention
(model.py:340-379) and the LSTM-output dropouts (model.py:352-371).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tacotron2_tpu.config import Tacotron2Config

NEG = -1e30  # additive mask stand-in for -inf (keeps softmax finite)


class ScanDims(NamedTuple):
    """Static layout of the training-scan kernel."""
    p: int       # prenet_dim
    e: int       # encoder_embedding_dim
    a: int       # attention_rnn_dim
    d: int       # decoder_rnn_dim
    datt: int    # attention_dim
    ks: int      # location conv kernel size (odd)
    t_pad: int   # encoder length padded to a multiple of 128
    k1: int      # p + e + a (attention LSTM input rows)
    k2: int      # a + e + d (decoder LSTM input rows)


def scan_dims(cfg: Tacotron2Config, t_in: int) -> ScanDims:
    p, e = cfg.prenet_dim, cfg.encoder_embedding_dim
    a, d = cfg.attention_rnn_dim, cfg.decoder_rnn_dim
    return ScanDims(p=p, e=e, a=a, d=d, datt=cfg.attention_dim,
                    ks=cfg.attention_location_kernel_size,
                    t_pad=-(-t_in // 128) * 128,
                    k1=p + e + a, k2=a + e + d)


def supported(cfg: Tacotron2Config, t_in: int, batch: int) -> bool:
    """Whether this (cfg, shapes) combination fits the kernel envelope."""
    dims = scan_dims(cfg, t_in)
    aligned = all(x % 128 == 0 for x in
                  (dims.p, dims.e, dims.a, dims.d, dims.datt))
    # batch > 128 blows the VMEM budget (the per-step flat attention
    # tensors and residual-stream buffers scale with B): the Mosaic
    # compile crashes rather than falling back, so the envelope bounds it
    # (B=256 measured: remote_compile HTTP 500 for both fwd and bwd).
    return (cfg.jax_compute_dtype == jnp.bfloat16
            and cfg.decoder_interleave <= 1
            and aligned and dims.t_pad == 128
            and batch % 8 == 0 and batch <= 128
            and dims.ks % 2 == 1)


# ------------------------------------------------------------- packing

def _band_constants(dims: ScanDims):
    """Constant structure tensors (baked into the executable).

    E3[k] is the shifted identity placing conv tap k on its diagonal:
    band[tau, t] must pick K2[tau - t + pad], i.e. ones at
    t = tau - (k - pad)  ->  np.eye(T, k=pad - k).
    qsel replicates the query across every t within its d-block;
    eyeT is reused to fold v into the energy-reduction selector.
    """
    T = dims.t_pad
    pad = (dims.ks - 1) // 2
    E3 = np.stack([np.eye(T, k=pad - k, dtype=np.float32)
                   for k in range(dims.ks)])               # (ks, T, T)
    qsel = np.kron(np.eye(dims.datt, dtype=np.float32),
                   np.ones((1, T), np.float32))            # (datt, datt*T)
    eyeT = np.eye(T, dtype=np.float32)
    return jnp.asarray(E3), jnp.asarray(qsel), jnp.asarray(eyeT)


def pack_weights(core_params, dims: ScanDims, dtype=jnp.bfloat16):
    """Repack the decoder core pytree into the kernel's resident layout.

    Runs under jit inside the train step (cheap: ~0.5 GFLOP for the
    banded Toeplitz build). Not differentiated — the custom-VJP backward
    computes parameter gradients analytically from the residual stacks.
    """
    T = dims.t_pad
    arn, dcn = core_params["attention_rnn"], core_params["decoder_rnn"]
    att = core_params["attention"]
    f32 = jnp.float32

    w1 = jnp.concatenate([arn["wi"], arn["wh"]], axis=0).astype(dtype)
    b1 = (arn["bi"] + arn["bh"]).astype(f32)[None, :]
    w2 = jnp.concatenate([dcn["wi"], dcn["wh"]], axis=0).astype(dtype)
    b2 = (dcn["bi"] + dcn["bh"]).astype(f32)[None, :]
    wq = att["query"]["kernel"].astype(dtype)

    # conv (ks, 2, F) folded through dense (F, datt): K2 (ks, 2, datt)
    K2 = jnp.einsum("kcf,fD->kcD", att["location_conv"]["kernel"],
                    att["location_dense"]["kernel"])
    E3, qsel, eyeT = _band_constants(dims)
    # band_c[tau, d*T + t] = K2[tau - t + pad, c, d]
    bands = []
    for c in range(2):
        b3 = jnp.einsum("kab,kd->adb", E3, K2[:, c])   # (T, datt, T)
        bands.append(b3.reshape(T, dims.datt * T))
    wbig = jnp.concatenate([bands[0], bands[1], qsel],
                           axis=0).astype(dtype)       # (2T+datt, datt*T)
    # selv[d*T + t, t'] = v[d] * (t == t')
    v = att["v"]["kernel"][:, 0]                       # (datt,)
    selv = (v[:, None, None] * eyeT[None]).reshape(
        dims.datt * T, T).astype(dtype)
    return w1, b1, w2, b2, wq, wbig, selv


def pack_batch(memory, processed, mask, dims: ScanDims, dtype=jnp.bfloat16):
    """Flatten per-batch attention constants into the kernel lane layout."""
    B, t_in, _ = memory.shape
    T = dims.t_pad
    pt = T - t_in
    mem_flat = jnp.pad(memory, ((0, 0), (0, pt), (0, 0))).astype(
        dtype).reshape(B, T * dims.e)
    proc_flat = jnp.pad(processed, ((0, 0), (0, pt), (0, 0))).astype(
        dtype).transpose(0, 2, 1).reshape(B, dims.datt * T)
    if mask is None:
        mask = jnp.ones((B, t_in), bool)
    maskp = jnp.pad(mask, ((0, 0), (0, pt)))
    emask = jnp.where(maskp, 0.0, NEG).astype(jnp.float32)
    return mem_flat, proc_flat, emask


def keep_scale_masks(scan_rng, T_steps: int, B: int, dims: ScanDims,
                     p_att: float, p_dec: float):
    """(T, B, a)/(T, B, d) fp32 dropout scale masks (0 or 1/(1-p)),
    drawn with EXACTLY the key derivation of the in-scan XLA path
    (decoder_vjp._step_keep_masks), so the pattern is bit-identical."""
    def one(t):
        key_t = jax.random.fold_in(scan_rng, t)
        ka = jax.random.bernoulli(jax.random.fold_in(key_t, 0),
                                  1.0 - p_att, (B, dims.a))
        kd = jax.random.bernoulli(jax.random.fold_in(key_t, 1),
                                  1.0 - p_dec, (B, dims.d))
        return (jnp.where(ka, 1.0 / (1.0 - p_att), 0.0),
                jnp.where(kd, 1.0 / (1.0 - p_dec), 0.0))
    return jax.vmap(one)(jnp.arange(T_steps))


# -------------------------------------------------------------- kernel

def _make_kernel(dims: ScanDims, B: int, dropout: bool, dtype):
    d = dims
    T = d.t_pad
    f32 = jnp.float32

    def kernel(*refs):
        it = iter(refs)
        w1, b1, w2, b2, wq, wbig, selv, proc, mem, emask = \
            (next(it) for _ in range(10))
        prenet_r = next(it)
        katt_r = next(it) if dropout else None
        kdec_r = next(it) if dropout else None
        (ga_r, gd_r, atth_r, dech_r, attc_r, decc_r, ctx_r, w_r) = \
            (next(it) for _ in range(8))
        (x1, x2, cat, h1s, c1s, h2s, c2s, ws, wcs, ctxs) = \
            (next(it) for _ in range(10))

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h1s[:] = jnp.zeros_like(h1s)
            c1s[:] = jnp.zeros_like(c1s)
            h2s[:] = jnp.zeros_like(h2s)
            c2s[:] = jnp.zeros_like(c2s)
            ws[:] = jnp.zeros_like(ws)
            wcs[:] = jnp.zeros_like(wcs)
            ctxs[:] = jnp.zeros_like(ctxs)

        # ---- attention LSTM:  [prenet_t ; ctx ; h1] @ [wi ; wh] ----
        x1[:, 0:d.p] = prenet_r[0]
        x1[:, d.p:d.p + d.e] = ctxs[:].astype(dtype)
        x1[:, d.p + d.e:d.k1] = h1s[:].astype(dtype)
        g1 = jnp.dot(x1[:], w1[:], preferred_element_type=f32) + b1[0]
        c1n = (jax.nn.sigmoid(g1[:, d.a:2 * d.a]) * c1s[:]
               + jax.nn.sigmoid(g1[:, 0:d.a])
               * jnp.tanh(g1[:, 2 * d.a:3 * d.a]))
        h1n = jax.nn.sigmoid(g1[:, 3 * d.a:4 * d.a]) * jnp.tanh(c1n)
        h1d = h1n * katt_r[0] if dropout else h1n

        # ---- location-sensitive attention (flat (B, datt*T) layout) ----
        q = jnp.dot(h1d.astype(dtype), wq[:], preferred_element_type=f32)
        cat[:, 0:T] = ws[:].astype(dtype)
        cat[:, T:2 * T] = wcs[:].astype(dtype)
        cat[:, 2 * T:2 * T + d.datt] = q.astype(dtype)
        m = jnp.dot(cat[:], wbig[:], preferred_element_type=f32)
        feat = jnp.tanh(m + proc[:].astype(f32))
        e = jnp.dot(feat.astype(dtype), selv[:],
                    preferred_element_type=f32) + emask[:]
        mx = jnp.max(e, axis=1, keepdims=True)
        ex = jnp.exp(e - mx)
        wnew = ex / jnp.sum(ex, axis=1, keepdims=True)
        ctx = jnp.zeros((B, d.e), f32)
        for tt in range(T):
            ctx = ctx + wnew[:, tt:tt + 1] * mem[:, tt * d.e:
                                                 (tt + 1) * d.e].astype(f32)

        # ---- decoder LSTM:  [h1 ; ctx ; h2] @ [wi ; wh] ----
        x2[:, 0:d.a] = h1d.astype(dtype)
        x2[:, d.a:d.a + d.e] = ctx.astype(dtype)
        x2[:, d.a + d.e:d.k2] = h2s[:].astype(dtype)
        g2 = jnp.dot(x2[:], w2[:], preferred_element_type=f32) + b2[0]
        c2n = (jax.nn.sigmoid(g2[:, d.d:2 * d.d]) * c2s[:]
               + jax.nn.sigmoid(g2[:, 0:d.d])
               * jnp.tanh(g2[:, 2 * d.d:3 * d.d]))
        h2n = jax.nn.sigmoid(g2[:, 3 * d.d:4 * d.d]) * jnp.tanh(c2n)
        h2d = h2n * kdec_r[0] if dropout else h2n

        # ---- residual stacks out; state update ----
        ga_r[0] = g1.astype(dtype)
        gd_r[0] = g2.astype(dtype)
        atth_r[0] = h1d.astype(dtype)
        dech_r[0] = h2d.astype(dtype)
        attc_r[0] = c1n
        decc_r[0] = c2n
        ctx_r[0] = ctx
        w_r[0] = wnew
        h1s[:] = h1d
        c1s[:] = c1n
        h2s[:] = h2d
        c2s[:] = c2n
        ws[:] = wnew
        wcs[:] = wcs[:] + wnew
        ctxs[:] = ctx

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "dropout",
                                             "interpret"))
def _scan_call(w1, b1, w2, b2, wq, wbig, selv, proc_flat, mem_flat, emask,
               prenet_steps, katt, kdec, dims: ScanDims, dropout: bool,
               interpret: bool):
    d = dims
    T_steps, B, _ = prenet_steps.shape
    dtype = jnp.bfloat16
    f32 = jnp.float32
    kern = _make_kernel(d, B, dropout, dtype)

    const = lambda shape: pl.BlockSpec(
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    stream = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda t: (t, 0, 0), memory_space=pltpu.VMEM)

    in_specs = [const(w1.shape), const(b1.shape), const(w2.shape),
                const(b2.shape), const(wq.shape), const(wbig.shape),
                const(selv.shape), const(proc_flat.shape),
                const(mem_flat.shape), const(emask.shape),
                stream((B, d.p))]
    inputs = [w1, b1, w2, b2, wq, wbig, selv, proc_flat, mem_flat, emask,
              prenet_steps]
    if dropout:
        in_specs += [stream((B, d.a)), stream((B, d.d))]
        inputs += [katt, kdec]

    outs = [
        jax.ShapeDtypeStruct((T_steps, B, 4 * d.a), dtype),   # ga
        jax.ShapeDtypeStruct((T_steps, B, 4 * d.d), dtype),   # gd
        jax.ShapeDtypeStruct((T_steps, B, d.a), dtype),       # att_h
        jax.ShapeDtypeStruct((T_steps, B, d.d), dtype),       # dec_h
        jax.ShapeDtypeStruct((T_steps, B, d.a), f32),         # att_c
        jax.ShapeDtypeStruct((T_steps, B, d.d), f32),         # dec_c
        jax.ShapeDtypeStruct((T_steps, B, d.e), f32),         # ctx
        jax.ShapeDtypeStruct((T_steps, B, d.t_pad), f32),     # w
    ]
    out_specs = [stream(o.shape[1:]) for o in outs]

    scratch = [
        pltpu.VMEM((B, d.k1), dtype), pltpu.VMEM((B, d.k2), dtype),
        pltpu.VMEM((B, 2 * d.t_pad + d.datt), dtype),
        pltpu.VMEM((B, d.a), f32), pltpu.VMEM((B, d.a), f32),
        pltpu.VMEM((B, d.d), f32), pltpu.VMEM((B, d.d), f32),
        pltpu.VMEM((B, d.t_pad), f32), pltpu.VMEM((B, d.t_pad), f32),
        pltpu.VMEM((B, d.e), f32),
    ]
    return pl.pallas_call(
        kern,
        grid=(T_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=outs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(*inputs)


def forward_residuals(core_params, prenet_steps, memory, processed, mask,
                      scan_rng, cfg: Tacotron2Config, dropout_active: bool,
                      interpret: Optional[bool] = None):
    """Run the fused forward scan; returns the 8 time-major residual
    stacks (ga, gd, att_h, dec_h, att_c, dec_c, ctx, w) with w trimmed to
    the true T_in — the same values ``decoder_vjp._forward`` produces.

    ``prenet_steps``: (T_steps, B, prenet_dim) time-major (any dtype;
    cast to bf16). ``interpret`` defaults to True off-TPU (CPU tests).
    """
    dims = scan_dims(cfg, memory.shape[1])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T_steps, B, _ = prenet_steps.shape
    t_in = memory.shape[1]
    dtype = jnp.bfloat16

    w1, b1, w2, b2, wq, wbig, selv = pack_weights(core_params, dims, dtype)
    mem_flat, proc_flat, emask = pack_batch(memory, processed, mask, dims,
                                            dtype)
    if dropout_active:
        katt, kdec = keep_scale_masks(scan_rng, T_steps, B, dims,
                                      cfg.p_attention_dropout,
                                      cfg.p_decoder_dropout)
    else:
        katt = kdec = jnp.zeros((1,), jnp.float32)  # unused placeholder

    outs = _scan_call(w1, b1, w2, b2, wq, wbig, selv, proc_flat, mem_flat,
                      emask, prenet_steps.astype(dtype), katt, kdec,
                      dims, dropout_active, interpret)
    ga, gd, att_h, dec_h, att_c, dec_c, ctx, w = outs
    return ga, gd, att_h, dec_h, att_c, dec_c, ctx, w[..., :t_in]


# ===================================================================
# Backward data-gradient chain kernel
# ===================================================================
#
# Mirrors decoder_vjp's backward scan (chunk_bwd_step) as one reverse
# pallas_call with the transposed LSTM weights and the attention banded
# matrices VMEM-resident. Per step it computes ONLY the sequential
# data-gradient chain and emits per-step cotangent stacks (dga, dgd,
# d_prenet, d_ctx_total, d_q, d_M); every parameter gradient is hoisted
# outside into batched einsums over those stacks (attention_param_grads
# below + the existing LSTM dW hoists in decoder_vjp.bwd).

def pack_bwd_weights(core_params, dims: ScanDims, dtype=jnp.bfloat16):
    """Transposed/resident operands for the backward kernel."""
    w1, b1, w2, b2, wq, wbig, selv = pack_weights(core_params, dims, dtype)
    del b1, b2, selv
    T = dims.t_pad
    v = core_params["attention"]["v"]["kernel"][:, 0]
    vrep = jnp.repeat(v, T)[None, :].astype(jnp.float32)  # (1, datt*T)
    return (w1.T, w2.T, wq, wq.T, wbig, wbig.T, vrep)


def _make_bwd_kernel(dims: ScanDims, B: int, nsteps: int, dropout: bool,
                     dtype):
    d = dims
    T = d.t_pad
    f32 = jnp.float32

    def lstm_gates_bwd(gates, c_prev, c_new, dh, dc_in, H):
        g = gates[:].astype(f32) if hasattr(gates, "shape") else gates
        i_ = jax.nn.sigmoid(g[:, 0:H])
        f_ = jax.nn.sigmoid(g[:, H:2 * H])
        g_ = jnp.tanh(g[:, 2 * H:3 * H])
        o_ = jax.nn.sigmoid(g[:, 3 * H:4 * H])
        tc = jnp.tanh(c_new)
        do = dh * tc
        dc = dc_in + dh * o_ * (1.0 - tc * tc)
        di = dc * g_
        df = dc * c_prev
        dg = dc * i_
        dc_prev = dc * f_
        dgates = jnp.concatenate([
            di * i_ * (1.0 - i_), df * f_ * (1.0 - f_),
            dg * (1.0 - g_ * g_), do * o_ * (1.0 - o_)], axis=-1)
        return dgates, dc_prev

    def kernel(*refs):
        it = iter(refs)
        (wta, wtd, wq, wqt, wbig, wbigt, vrep, proc, mem) = \
            (next(it) for _ in range(9))
        (ga_r, gd_r, atth_r, attc_r, attc_p_r, decc_r, decc_p_r,
         w_r, w_p_r, wcum_p_r, ddh_r, dctx_o_r, dalign_r) = \
            (next(it) for _ in range(13))
        katt_r = next(it) if dropout else None
        kdec_r = next(it) if dropout else None
        (dga_o, dgd_o, dpre_o, dctx_o, dq_o, dm_o, dproc_o, dv_o) = \
            (next(it) for _ in range(8))
        (c_dah, c_dac, c_ddh, c_ddc, c_dw, c_dwc, c_dctx) = \
            (next(it) for _ in range(7))

        pid = pl.program_id(0)
        first = pid == 0            # processes t = nsteps-1 (chain start)
        last = pid == nsteps - 1    # processes t = 0

        @pl.when(first)
        def _():
            c_dah[:] = jnp.zeros_like(c_dah)
            c_dac[:] = jnp.zeros_like(c_dac)
            c_ddh[:] = jnp.zeros_like(c_ddh)
            c_ddc[:] = jnp.zeros_like(c_ddc)
            c_dw[:] = jnp.zeros_like(c_dw)
            c_dwc[:] = jnp.zeros_like(c_dwc)
            c_dctx[:] = jnp.zeros_like(c_dctx)
            dproc_o[:] = jnp.zeros_like(dproc_o)
            dv_o[:] = jnp.zeros_like(dv_o)

        # previous-step saved state; ALL-ZERO initial state at t=0
        zmask = jnp.where(last, 0.0, 1.0)
        attc_p = attc_p_r[0] * zmask
        decc_p = decc_p_r[0] * zmask
        w_p = w_p_r[0] * zmask
        wcum_p = wcum_p_r[0] * zmask

        # ---- decoder LSTM backward ----
        ddh_total = c_ddh[:] + ddh_r[0]
        if dropout:
            ddh_total = ddh_total * kdec_r[0]
        dgd, ddc_prev = lstm_gates_bwd(gd_r[0].astype(f32), decc_p,
                                       decc_r[0], ddh_total, c_ddc[:], d.d)
        dgd_c = dgd.astype(dtype)
        dxd = jnp.dot(dgd_c, wtd[:], preferred_element_type=f32)
        dctx_total = c_dctx[:] + dctx_o_r[0] + dxd[:, d.a:d.a + d.e]

        # ---- context bmm backward: d_w_from_ctx (VPU lane-slice loop)
        dctx_b = dctx_total
        vals = []
        for tt in range(T):
            vals.append(jnp.sum(
                dctx_b * mem[:, tt * d.e:(tt + 1) * d.e].astype(f32),
                axis=1, keepdims=True))
        dw_from_ctx = jnp.concatenate(vals, axis=1)           # (B, T)

        # ---- softmax backward (saved weights w_t) ----
        dw_total = c_dw[:] + c_dwc[:] + dalign_r[0] + dw_from_ctx
        w_t = w_r[0]
        s = jnp.sum(w_t * dw_total, axis=1, keepdims=True)
        de = w_t * (dw_total - s)                             # (B, T)

        # ---- energies backward (feat rematerialized) ----
        q = jnp.dot(atth_r[0], wq[:], preferred_element_type=f32)
        cat = jnp.concatenate([w_p.astype(dtype), wcum_p.astype(dtype),
                               q.astype(dtype)], axis=1)
        m = jnp.dot(cat, wbig[:], preferred_element_type=f32)
        feat = jnp.tanh(m + proc[:].astype(f32))
        de_rep = jnp.concatenate([de] * d.datt, axis=1)       # (B, datt*T)
        dfeat = de_rep * vrep[0]
        dm = dfeat * (1.0 - feat * feat)
        dm_c = dm.astype(dtype)
        dcat = jnp.dot(dm_c, wbigt[:], preferred_element_type=f32)
        dq = dcat[:, 2 * T:2 * T + d.datt]
        dah_attn = jnp.dot(dq.astype(dtype), wqt[:],
                           preferred_element_type=f32)
        dproc_o[:] = dproc_o[:] + dm
        dv_o[0:1, :] = dv_o[0:1, :] + jnp.sum(feat * de_rep, axis=0,
                                              keepdims=True)

        # ---- attention LSTM backward ----
        dah_total = c_dah[:] + dxd[:, 0:d.a] + dah_attn
        if dropout:
            dah_total = dah_total * katt_r[0]
        dga, dac_prev = lstm_gates_bwd(ga_r[0].astype(f32), attc_p,
                                       attc_r[0], dah_total, c_dac[:], d.a)
        dga_c = dga.astype(dtype)
        dxa = jnp.dot(dga_c, wta[:], preferred_element_type=f32)

        # ---- emits + carry update ----
        dga_o[0] = dga_c
        dgd_o[0] = dgd_c
        dpre_o[0] = dxa[:, 0:d.p]
        dctx_o[0] = dctx_total.astype(dtype)
        dq_o[0] = dq
        dm_o[0] = dm_c
        c_dah[:] = dxa[:, d.p + d.e:d.k1]
        c_dac[:] = dac_prev
        c_ddh[:] = dxd[:, d.a + d.e:d.k2]
        c_ddc[:] = ddc_prev
        c_dw[:] = dcat[:, 0:T]
        c_dwc[:] = c_dwc[:] + dcat[:, T:2 * T]
        c_dctx[:] = dxa[:, d.p:d.p + d.e]

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "dropout",
                                             "interpret"))
def _bwd_scan_call(wta, wtd, wq, wqt, wbig, wbigt, vrep, proc_flat,
                   mem_flat, ga, gd, atth, attc, decc, w, wcum_p,
                   ddh, dctx_out, dalign, katt, kdec,
                   dims: ScanDims, dropout: bool, interpret: bool):
    d = dims
    T_steps, B, _ = ga.shape
    dtype = jnp.bfloat16
    f32 = jnp.float32
    kern = _make_bwd_kernel(d, B, T_steps, dropout, dtype)

    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def rev(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda i: (T_steps - 1 - i, 0, 0),
                            memory_space=pltpu.VMEM)

    def rev_prev(shape):
        def imap(i):
            idx = T_steps - 2 - i
            return (idx * (idx >= 0), 0, 0)
        return pl.BlockSpec((1,) + shape, imap, memory_space=pltpu.VMEM)

    in_specs = [const(x.shape) for x in
                (wta, wtd, wq, wqt, wbig, wbigt, vrep, proc_flat,
                 mem_flat)]
    in_specs += [rev((B, 4 * d.a)), rev((B, 4 * d.d)), rev((B, d.a)),
                 rev((B, d.a)), rev_prev((B, d.a)),
                 rev((B, d.d)), rev_prev((B, d.d)),
                 rev((B, d.t_pad)), rev_prev((B, d.t_pad)),
                 rev((B, d.t_pad)),
                 rev((B, d.d)), rev((B, d.e)), rev((B, d.t_pad))]
    inputs = [wta, wtd, wq, wqt, wbig, wbigt, vrep, proc_flat, mem_flat,
              ga, gd, atth, attc, attc, decc, decc, w, w, wcum_p,
              ddh, dctx_out, dalign]
    if dropout:
        in_specs += [rev((B, d.a)), rev((B, d.d))]
        inputs += [katt, kdec]

    outs = [
        jax.ShapeDtypeStruct((T_steps, B, 4 * d.a), dtype),    # dga
        jax.ShapeDtypeStruct((T_steps, B, 4 * d.d), dtype),    # dgd
        jax.ShapeDtypeStruct((T_steps, B, d.p), f32),          # d_prenet
        jax.ShapeDtypeStruct((T_steps, B, d.e), dtype),        # d_ctx
        jax.ShapeDtypeStruct((T_steps, B, d.datt), f32),       # d_q
        jax.ShapeDtypeStruct((T_steps, B, d.datt * d.t_pad), dtype),  # d_M
        jax.ShapeDtypeStruct((B, d.datt * d.t_pad), f32),      # d_proc
        jax.ShapeDtypeStruct((8, d.datt * d.t_pad), f32),      # d_v acc
    ]
    out_specs = [rev(o.shape[1:]) for o in outs[:6]]
    out_specs += [const(outs[6].shape), const(outs[7].shape)]

    scratch = [
        pltpu.VMEM((B, d.a), f32), pltpu.VMEM((B, d.a), f32),
        pltpu.VMEM((B, d.d), f32), pltpu.VMEM((B, d.d), f32),
        pltpu.VMEM((B, d.t_pad), f32), pltpu.VMEM((B, d.t_pad), f32),
        pltpu.VMEM((B, d.e), f32),
    ]
    return pl.pallas_call(
        kern,
        grid=(T_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=outs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 2 ** 20),
        interpret=interpret,
    )(*inputs)


def backward_chain(core_params, res, memory, processed, mask, scan_rng,
                   d_dec_h_out, d_ctx_out, d_align_out,
                   cfg: Tacotron2Config, dropout_active: bool,
                   interpret: Optional[bool] = None):
    """Run the fused backward chain. ``res`` is the _Residuals tuple of
    time-major stacks from the forward. Cotangents are (T, B, ...)
    time-major. Returns (dga_stack, dgd_stack, d_prenet, dctx_stack,
    d_attp) where d_attp is the attention parameter gradient subtree —
    everything decoder_vjp.bwd needs beyond its own hoisted LSTM einsums.
    """
    dims = scan_dims(cfg, memory.shape[1])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    (ga, gd, att_h, dec_h, att_c, dec_c, ctx, w) = res
    T_steps, B, _ = ga.shape
    t_in = memory.shape[1]
    T = dims.t_pad
    dtype = jnp.bfloat16
    f32 = jnp.float32

    wta, wtd, wq, wqt, wbig, wbigt, vrep = pack_bwd_weights(
        core_params, dims, dtype)
    mem_flat, proc_flat, _ = pack_batch(memory, processed, mask, dims,
                                        dtype)
    padT = ((0, 0), (0, 0), (0, T - t_in))
    w_pad = jnp.pad(w, padT).astype(f32)
    wcum_prev = jnp.cumsum(w_pad, axis=0) - w_pad   # exclusive prefix
    dalign = jnp.pad(d_align_out.astype(f32), padT)

    if dropout_active:
        katt, kdec = keep_scale_masks(scan_rng, T_steps, B, dims,
                                      cfg.p_attention_dropout,
                                      cfg.p_decoder_dropout)
    else:
        katt = kdec = jnp.zeros((1,), f32)

    outs = _bwd_scan_call(
        wta, wtd, wq, wqt, wbig, wbigt, vrep, proc_flat, mem_flat,
        ga.astype(dtype), gd.astype(dtype), att_h.astype(dtype),
        att_c.astype(f32), dec_c.astype(f32), w_pad, wcum_prev,
        d_dec_h_out.astype(f32), d_ctx_out.astype(f32), dalign,
        katt, kdec, dims, dropout_active, interpret)
    (dga_st, dgd_st, dpre_st, dctx_st, dq_st, dm_st, dproc_acc,
     dv_acc) = outs

    d_processed = dproc_acc.reshape(B, dims.datt, T).transpose(
        0, 2, 1)[:, :t_in].astype(processed.dtype)
    d_attp = attention_param_grads(
        core_params, dims, att_h, w_pad, wcum_prev, dq_st, dm_st, dv_acc)
    return dga_st, dgd_st, dpre_st, dctx_st, d_processed, d_attp


def attention_param_grads(core_params, dims: ScanDims, att_h_stack,
                          w_prev_unshifted, wcum_prev, dq_st, dm_st,
                          dv_acc):
    """Hoisted attention parameter gradients from the emitted stacks.

    d_Wq from (att_h, d_q); d_v from the in-kernel accumulator; the
    location conv/dense gradients from the d_M stack via the chain
    d_loc -> (d_F, F) with the conv expressed over the T lane dim —
    chunked over decoder steps to bound the (T*B, T_in, F) transients.
    """
    from jax import lax
    T = dims.t_pad
    ks = dims.ks
    pad = (ks - 1) // 2
    f32 = jnp.float32
    T_steps, B, _ = att_h_stack.shape
    att = core_params["attention"]
    ck = att["location_conv"]["kernel"]          # (ks, 2, F)
    ld = att["location_dense"]["kernel"]         # (F, datt)
    nF = ck.shape[2]

    dWq = jnp.einsum("tbh,tbq->hq", att_h_stack.astype(jnp.bfloat16),
                     dq_st.astype(jnp.bfloat16),
                     preferred_element_type=f32)
    d_v = jnp.sum(dv_acc[0].reshape(dims.datt, T), axis=1)[:, None]

    # w_prev: value at t-1 (zero at t=0)
    w_prev = jnp.concatenate(
        [jnp.zeros_like(w_prev_unshifted[:1]), w_prev_unshifted[:-1]],
        axis=0)

    n_chunks = max(1, T_steps // 64)
    csz = T_steps // n_chunks
    d_ld = jnp.zeros((nF, dims.datt), f32)
    d_ck = jnp.zeros((ks, 2, nF), f32)
    for c in range(n_chunks):
        sl = slice(c * csz, (c + 1) * csz)
        x = csz * B
        dm = dm_st[sl].reshape(x, dims.datt, T)            # (x, datt, T)
        wcat = jnp.stack([w_prev[sl].reshape(x, T),
                          wcum_prev[sl].reshape(x, T)],
                         axis=-1).astype(jnp.bfloat16)     # (x, T, 2)
        F = lax.conv_general_dilated(
            wcat, ck.astype(jnp.bfloat16), (1,), [(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.bfloat16)           # (x, T, nF)
        d_ld = d_ld + jnp.einsum("xtf,xdt->fd", F,
                                 dm, preferred_element_type=f32)
        dF = jnp.einsum("xdt,fd->xtf", dm, ld.astype(jnp.bfloat16),
                        preferred_element_type=jnp.bfloat16)
        wcat_pad = jnp.pad(wcat, ((0, 0), (pad, pad), (0, 0)))
        for k in range(ks):
            d_ck = d_ck.at[k].add(jnp.einsum(
                "xtc,xtf->cf", wcat_pad[:, k:k + T], dF,
                preferred_element_type=f32))

    return {
        "query": {"kernel": dWq},
        "v": {"kernel": d_v},
        "location_conv": {"kernel": d_ck},
        "location_dense": {"kernel": d_ld},
    }
