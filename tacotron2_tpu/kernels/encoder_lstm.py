"""Pallas TPU kernels: weights-resident bidirectional encoder LSTM.

The encoder BiLSTM under ``lax.scan`` is dispatch-overhead-bound on the
chip (~8% MFU: the per-step gate matmul is only ~0.2 GFLOP at B=128 —
round-5 decomposition, BENCH_DETAILS round5_nondecoder_attack). These
kernels run BOTH directions' whole scans as single ``pallas_call``s with
``grid=(T,)``:

- the four gate matrices ([wi; wh] stacked per direction, ~3 MB bf16)
  have constant index_maps — fetched once, resident for all steps;
- both directions advance in the SAME grid step (the backward direction
  scans the caller-provided length-reversed input), so each step issues
  two independent 768x1024 matmuls that hide each other's latency;
- the recurrent state (h, c per direction) lives in f32 VMEM scratch;
- per-step residuals stream out exactly like the decoder training scan
  (kernels/train_scan.py): gate pre-activations (bf16) + cell states
  (f32) feed a reverse-grid backward kernel that computes only the
  sequential data-gradient chain; the weight gradients hoist outside
  into batched einsums.

Numerics match the XLA scan path (ops/lstm.py) to bf16 round-off: the
same bf16 gate matmul with f32 accumulation, f32 gate elementwise, and
f32 (h, c) carries.

Reference behavior covered: the packed-sequence BiLSTM encoder
(/root/reference/model.py:169-188) — length semantics (reverse starts at
each row's true last frame, outputs past length are zeroed) are handled
by the caller (models/tacotron2.encode -> ops/lstm semantics), which
passes the pre-reversed input and masks the concatenated output.

Envelope (``supported``): bf16 compute, hidden dim per direction a
multiple of 128, input dim a multiple of 128, trace-time batch a
multiple of 8 and <= 128. Other shapes fall back to the XLA scan.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tacotron2_tpu.config import Tacotron2Config


def supported(cfg: Tacotron2Config, batch: int) -> bool:
    e = cfg.encoder_embedding_dim
    h = e // 2
    return (cfg.jax_compute_dtype == jnp.bfloat16
            and e % 128 == 0 and h % 128 == 0
            and batch % 8 == 0 and batch <= 128)


class _Dims(NamedTuple):
    b: int      # batch rows
    n: int      # input dim (encoder_embedding_dim)
    h: int      # hidden per direction


def _pack_dir(params, dtype):
    w = jnp.concatenate([params["wi"], params["wh"]], axis=0).astype(dtype)
    bias = (params["bi"] + params["bh"]).astype(jnp.float32)[None, :]
    return w, bias


# ------------------------------------------------------------- forward

def _make_fwd_kernel(d: _Dims, dtype):
    f32 = jnp.float32
    B, N, H = d.b, d.n, d.h

    def cell(xcat, w, bias, c_s):
        g = jnp.dot(xcat, w, preferred_element_type=f32) + bias[0]
        cn = (jax.nn.sigmoid(g[:, H:2 * H]) * c_s
              + jax.nn.sigmoid(g[:, 0:H]) * jnp.tanh(g[:, 2 * H:3 * H]))
        hn = jax.nn.sigmoid(g[:, 3 * H:4 * H]) * jnp.tanh(cn)
        return g, hn, cn

    def kernel(wf, bf, wb, bb, xf_r, xr_r,
               gf_r, gb_r, hf_r, hb_r, cf_r, cb_r,
               xcat, hf_s, cf_s, hb_s, cb_s):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            hf_s[:] = jnp.zeros_like(hf_s)
            cf_s[:] = jnp.zeros_like(cf_s)
            hb_s[:] = jnp.zeros_like(hb_s)
            cb_s[:] = jnp.zeros_like(cb_s)

        xcat[:, 0:N] = xf_r[0]
        xcat[:, N:N + H] = hf_s[:].astype(dtype)
        g, hn, cn = cell(xcat[:], wf[:], bf, cf_s[:])
        gf_r[0] = g.astype(dtype)
        hf_r[0] = hn.astype(dtype)
        cf_r[0] = cn
        hf_s[:] = hn
        cf_s[:] = cn

        xcat[:, 0:N] = xr_r[0]
        xcat[:, N:N + H] = hb_s[:].astype(dtype)
        g, hn, cn = cell(xcat[:], wb[:], bb, cb_s[:])
        gb_r[0] = g.astype(dtype)
        hb_r[0] = hn.astype(dtype)
        cb_r[0] = cn
        hb_s[:] = hn
        cb_s[:] = cn

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "interpret"))
def _fwd_call(wf, bf, wb, bb, xs, xsr, dims: _Dims, interpret: bool):
    d = dims
    T = xs.shape[0]
    dtype = jnp.bfloat16
    f32 = jnp.float32
    B, N, H = d.b, d.n, d.h

    const = lambda shape: pl.BlockSpec(
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    stream = lambda width: pl.BlockSpec(
        (1, B, width), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)

    in_specs = [const(wf.shape), const(bf.shape), const(wb.shape),
                const(bb.shape), stream(N), stream(N)]
    outs = [
        jax.ShapeDtypeStruct((T, B, 4 * H), dtype),   # gates fwd
        jax.ShapeDtypeStruct((T, B, 4 * H), dtype),   # gates bwd-dir
        jax.ShapeDtypeStruct((T, B, H), dtype),       # h fwd
        jax.ShapeDtypeStruct((T, B, H), dtype),       # h bwd-dir
        jax.ShapeDtypeStruct((T, B, H), f32),         # c fwd
        jax.ShapeDtypeStruct((T, B, H), f32),         # c bwd-dir
    ]
    out_specs = [stream(o.shape[2]) for o in outs]
    scratch = [
        pltpu.VMEM((B, N + H), dtype),
        pltpu.VMEM((B, H), f32), pltpu.VMEM((B, H), f32),
        pltpu.VMEM((B, H), f32), pltpu.VMEM((B, H), f32),
    ]
    kern = _make_fwd_kernel(d, dtype)
    return pl.pallas_call(
        kern, grid=(T,), in_specs=in_specs, out_specs=out_specs,
        out_shape=outs, scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(wf, bf, wb, bb, xs.astype(dtype), xsr.astype(dtype))


# ------------------------------------------------------------ backward

def _make_bwd_kernel(d: _Dims, nsteps: int, dtype):
    f32 = jnp.float32
    B, N, H = d.b, d.n, d.h

    def gates_bwd(g, c_prev, c_new, dh, dc_in):
        g = g.astype(f32)
        i_ = jax.nn.sigmoid(g[:, 0:H])
        f_ = jax.nn.sigmoid(g[:, H:2 * H])
        g_ = jnp.tanh(g[:, 2 * H:3 * H])
        o_ = jax.nn.sigmoid(g[:, 3 * H:4 * H])
        tc = jnp.tanh(c_new)
        do = dh * tc
        dc = dc_in + dh * o_ * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dc * g_ * i_ * (1.0 - i_), dc * c_prev * f_ * (1.0 - f_),
            dc * i_ * (1.0 - g_ * g_), do * o_ * (1.0 - o_)], axis=-1)
        return dgates, dc * f_

    def kernel(wtf, wtb, gf_r, gb_r, cf_r, cb_r, cfp_r, cbp_r,
               dhf_r, dhb_r,
               dgf_o, dgb_o, dxf_o, dxb_o,
               c_dhf, c_dcf, c_dhb, c_dcb):
        t = pl.program_id(0)
        first = t == 0
        last = t == nsteps - 1

        @pl.when(first)
        def _():
            c_dhf[:] = jnp.zeros_like(c_dhf)
            c_dcf[:] = jnp.zeros_like(c_dcf)
            c_dhb[:] = jnp.zeros_like(c_dhb)
            c_dcb[:] = jnp.zeros_like(c_dcb)

        zmask = jnp.where(last, 0.0, 1.0)

        dh = c_dhf[:] + dhf_r[0]
        dg, dc_prev = gates_bwd(gf_r[0], cfp_r[0] * zmask, cf_r[0],
                                dh, c_dcf[:])
        dg_c = dg.astype(dtype)
        dx = jnp.dot(dg_c, wtf[:], preferred_element_type=f32)
        dgf_o[0] = dg_c
        dxf_o[0] = dx[:, 0:N]
        c_dhf[:] = dx[:, N:N + H]
        c_dcf[:] = dc_prev

        dh = c_dhb[:] + dhb_r[0]
        dg, dc_prev = gates_bwd(gb_r[0], cbp_r[0] * zmask, cb_r[0],
                                dh, c_dcb[:])
        dg_c = dg.astype(dtype)
        dx = jnp.dot(dg_c, wtb[:], preferred_element_type=f32)
        dgb_o[0] = dg_c
        dxb_o[0] = dx[:, 0:N]
        c_dhb[:] = dx[:, N:N + H]
        c_dcb[:] = dc_prev

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "interpret"))
def _bwd_call(wtf, wtb, gf, gb, cf, cb, dhf, dhb,
              dims: _Dims, interpret: bool):
    d = dims
    T = gf.shape[0]
    dtype = jnp.bfloat16
    f32 = jnp.float32
    B, N, H = d.b, d.n, d.h

    const = lambda shape: pl.BlockSpec(
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def rev(width):
        return pl.BlockSpec((1, B, width), lambda t: (T - 1 - t, 0, 0),
                            memory_space=pltpu.VMEM)

    def rev_prev(width):
        def imap(t):
            idx = T - 2 - t
            return (idx * (idx >= 0), 0, 0)
        return pl.BlockSpec((1, B, width), imap, memory_space=pltpu.VMEM)

    in_specs = [const(wtf.shape), const(wtb.shape),
                rev(4 * H), rev(4 * H), rev(H), rev(H),
                rev_prev(H), rev_prev(H), rev(H), rev(H)]
    outs = [
        jax.ShapeDtypeStruct((T, B, 4 * H), dtype),   # dgates fwd
        jax.ShapeDtypeStruct((T, B, 4 * H), dtype),   # dgates bwd-dir
        jax.ShapeDtypeStruct((T, B, N), f32),         # d_x fwd
        jax.ShapeDtypeStruct((T, B, N), f32),         # d_x bwd-dir
    ]
    out_specs = [rev(o.shape[2]) for o in outs]
    scratch = [pltpu.VMEM((B, H), f32) for _ in range(4)]
    kern = _make_bwd_kernel(d, T, dtype)
    return pl.pallas_call(
        kern, grid=(T,), in_specs=in_specs, out_specs=out_specs,
        out_shape=outs, scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(wtf, wtb, gf, gb, cf, cb, cf, cb, dhf, dhb)


# ------------------------------------------------------- custom VJP op

def _interp(cfg: Tacotron2Config) -> bool:
    if cfg.pallas_interpret is not None:
        return cfg.pallas_interpret
    return jax.default_backend() != "tpu"


def bilstm_scans(fwd_params, bwd_params, xs, xsr, cfg: Tacotron2Config):
    """Run both directions' LSTM scans through the fused kernels with a
    custom VJP. xs / xsr: (B, T, N) (xsr = per-row length-reversed xs,
    prepared by the caller). Returns (hf, hb_scan): (B, T, H) each —
    hb_scan in xsr's (reversed) time order, exactly like
    ``ops.lstm.lstm_scan`` on xsr. Differentiable in all three array
    args; the weight gradients hoist into batched einsums over the
    emitted per-step stacks (same pattern as models/decoder_vjp.py)."""
    d = _Dims(b=xs.shape[0], n=xs.shape[2],
              h=fwd_params["wh"].shape[0])
    interpret = _interp(cfg)
    return _scan_op(fwd_params, bwd_params, xs, xsr, d, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _scan_op(fp, bp, xs, xsr, d, interpret):
    out, _ = _scan_fwd(fp, bp, xs, xsr, d, interpret)
    return out


def _scan_fwd(fp, bp, xs, xsr, d, interpret):
    dtype = jnp.bfloat16
    wf, bf = _pack_dir(fp, dtype)
    wb, bb = _pack_dir(bp, dtype)
    xs_t = xs.swapaxes(0, 1)    # (T, B, N)
    xsr_t = xsr.swapaxes(0, 1)
    gf, gb, hf, hb, cf, cb = _fwd_call(wf, bf, wb, bb, xs_t, xsr_t,
                                       dims=d, interpret=interpret)
    out = (hf.swapaxes(0, 1).astype(jnp.float32),
           hb.swapaxes(0, 1).astype(jnp.float32))
    saved = (fp, bp, xs_t, xsr_t, gf, gb, hf, hb, cf, cb,
             jnp.zeros((), xs.dtype), jnp.zeros((), xsr.dtype))
    return out, saved


def _scan_bwd(d, interpret, saved, cots):
    f32 = jnp.float32
    dtype = jnp.bfloat16
    (fp, bp, xs_t, xsr_t, gf, gb, hf, hb, cf, cb, _, _) = saved
    dhf, dhb = cots
    dhf_t = dhf.swapaxes(0, 1).astype(f32)
    dhb_t = dhb.swapaxes(0, 1).astype(f32)

    wtf = jnp.concatenate([fp["wi"], fp["wh"]], axis=0).T.astype(dtype)
    wtb = jnp.concatenate([bp["wi"], bp["wh"]], axis=0).T.astype(dtype)
    dgf, dgb, dxf, dxb = _bwd_call(wtf, wtb, gf, gb, cf, cb,
                                   dhf_t, dhb_t, dims=d,
                                   interpret=interpret)

    def shift(stack):  # h_{t-1} stack: zeros at t=0
        return jnp.concatenate(
            [jnp.zeros_like(stack[:1]), stack[:-1]], axis=0)

    def dw_dir(params, x_t, h_st, dg):
        dWi = jnp.einsum("tbn,tbg->ng", x_t.astype(dtype), dg,
                         preferred_element_type=f32)
        dWh = jnp.einsum("tbh,tbg->hg", shift(h_st), dg,
                         preferred_element_type=f32)
        db = jnp.sum(dg.astype(f32), axis=(0, 1))
        return {"wi": dWi.astype(f32), "wh": dWh.astype(f32),
                "bi": db, "bh": db}

    d_fp = dw_dir(fp, xs_t, hf, dgf)
    d_bp = dw_dir(bp, xsr_t, hb, dgb)
    # cotangents must carry the PRIMAL dtypes (xs may be bf16 in the
    # encoder's post-BN chain) or upstream transpose rules mismatch
    d_xs = dxf.swapaxes(0, 1).astype(saved[10].dtype)
    d_xsr = dxb.swapaxes(0, 1).astype(saved[11].dtype)
    return d_fp, d_bp, d_xs, d_xsr


_scan_op.defvjp(_scan_fwd, _scan_bwd)
