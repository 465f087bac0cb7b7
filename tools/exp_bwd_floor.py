"""Round-4 experiment: what sets the backward training-scan kernel's
per-step time — the DMA/pipeline floor or the serialized compute?

Round 3 measured the backward kernel at ~156 us/step (~27% of bf16
peak) and eliminated streams-count, VPU loops, and the attention tiles
as causes (PERFORMANCE.md round-3 ablation), leaving "per-step
dependency serialization" as the hypothesis. This tool discriminates
directly: it times the EXACT pallas_call of the backward (and forward)
kernel with

  real  — the shipped kernel body;
  stub  — a trivial body behind the identical grid/BlockSpecs/streams
          (touches one element of every input block so no fetch can be
          elided, writes zeros to every output block), isolating the
          Mosaic pipeline + DMA floor;

If stub ~= real, the kernel is stream/pipeline-bound (fix: fewer or
narrower streams). If stub << real, the body's serial compute is the
cost (fix: restructure the op chain / help the scheduler).

Usage: python tools/exp_bwd_floor.py [T_STEPS]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.kernels import train_scan as ts

_kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
B = int(_kv.get("b", 128))
T_IN = int(_kv.get("tin", 128))
_nums = [a for a in sys.argv[1:] if a.isdigit()]
T_STEPS = int(_nums[0]) if _nums else 512


def sync(x):
    # transfer ONE element, not the array — the tunneled link makes a
    # full np.asarray of a (T,B,4a) stack a multi-minute stall
    return float(x.reshape(-1)[0])


def timeit(fn, reps=15, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn()
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def make_inputs(cfg, dims):
    from tacotron2_tpu.models import tacotron2
    params, _ = tacotron2.init_params(jax.random.PRNGKey(0), cfg)
    dp = params["decoder"]
    core = {
        "attention_rnn": dp["attention_rnn"],
        "attention": {k: dp["attention"][k]
                      for k in ("query", "v", "location_conv",
                                "location_dense")},
        "decoder_rnn": dp["decoder_rnn"],
    }
    # generate ON DEVICE: device_put of the ~2.6 GB residual stacks
    # through the tunneled link stalls for minutes
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 16))

    @jax.jit
    def gen():
        f = lambda *s: jax.random.normal(next(keys), s) * 0.1
        T = dims.t_pad
        memory = f(B, T_IN, dims.e)
        proc = f(B, T_IN, dims.datt)
        res = dict(
            ga=f(T_STEPS, B, 4 * dims.a), gd=f(T_STEPS, B, 4 * dims.d),
            atth=f(T_STEPS, B, dims.a), attc=f(T_STEPS, B, dims.a),
            decc=f(T_STEPS, B, dims.d),
            w=jax.random.uniform(next(keys), (T_STEPS, B, T)) / T,
            ddh=f(T_STEPS, B, dims.d), dctx=f(T_STEPS, B, dims.e),
            dalign=f(T_STEPS, B, T),
        )
        return memory, proc, res

    memory, proc, res = gen()
    return core, memory, proc, res


def stub_bwd_kernel_factory(dims, Bt, nsteps, dropout, p_att, p_dec, dtype):
    """Same ref signature as ts._make_bwd_kernel's kernel; trivial body."""
    n_in = 13 + 10 + (2 if dropout else 0)

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:n_in + 8]
        # touch one lane of every input block so the fetch is live
        acc = jnp.zeros((1, 1), jnp.float32)
        for r in ins:
            acc = acc + r[(0,) * (len(r.shape) - 1)][:1][None, :1].astype(
                jnp.float32)
        for o in outs:
            o[...] = jnp.zeros(o.shape, o.dtype) + acc[0, 0].astype(o.dtype)
    return kernel


def bwd_variant_kernel_factory(dims, B, nsteps, p_att, p_dec, dtype,
                               variant):
    """Round-5 ablation: the shipped backward body with ONE section
    replaced by a near-free stand-in (all streams and carries live).

    Variants: noctxbwd (T-iteration dw_from_ctx reduction loop),
    noattbwd (whole per-tile energies backward), norecompute (just the
    in-tile cat@band + tanh rematerialization), nolstm1bwd / nolstm2bwd
    (the transposed gate matmuls), novpugates (both lstm_gates_bwd
    transcendental chains).
    """
    d = dims
    T = d.t_pad
    W = d.w_win
    f32 = jnp.float32
    s_att = 1.0 / (1.0 - p_att) if p_att > 0 else 1.0
    s_dec = 1.0 / (1.0 - p_dec) if p_dec > 0 else 1.0
    CS, TT, WOFF = ts.CS, ts.TT, ts.WOFF

    def lstm_gates_bwd(g, c_prev, c_new, dh, dc_in, H):
        if variant == "novpugates":
            dgates = jnp.concatenate([dh, dh, dh, dh], axis=-1) \
                + c_new[:, :1] * 0.0 + c_prev[:, :1] * 0.0
            return dgates, dh + dc_in
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
        (wta, wtd, wq, wqt, band, bandt, rep1, vrep, proc, mem,
         attc_l, decc_l, w_l) = (next(it) for _ in range(13))
        (ga_r, gd_r, atth_r, attc_p_r, decc_p_r,
         w_p_r, wcum_p_r, ddh_r, dctx_o_r, dalign_r) = \
            (next(it) for _ in range(10))
        katt_r = next(it)
        kdec_r = next(it)
        (dga_o, dgd_o, dpre_o, dctx_o, dq_o, dband_o, dv_o, dproc_o) = \
            (next(it) for _ in range(8))
        (c_dah, c_dac, c_ddh, c_ddc, c_dw, c_dwc, c_dctx,
         cat, wp_s, wc_s, acc_w, acc_wc,
         s_attc, s_decc, s_w) = (next(it) for _ in range(15))

        pid = pl.program_id(1)
        first = pid == 0
        last = pid == nsteps - 1

        @pl.when(first)
        def _():
            c_dah[:] = jnp.zeros_like(c_dah)
            c_dac[:] = jnp.zeros_like(c_dac)
            c_ddh[:] = jnp.zeros_like(c_ddh)
            c_ddc[:] = jnp.zeros_like(c_ddc)
            c_dw[:] = jnp.zeros_like(c_dw)
            c_dwc[:] = jnp.zeros_like(c_dwc)
            c_dctx[:] = jnp.zeros_like(c_dctx)
            cat[:] = jnp.zeros_like(cat)
            wp_s[:] = jnp.zeros_like(wp_s)
            wc_s[:] = jnp.zeros_like(wc_s)
            s_attc[:] = attc_l[:]
            s_decc[:] = decc_l[:]
            s_w[:] = w_l[:]

        @pl.when(jnp.logical_and(first, pl.program_id(0) == 0))
        def _():
            dv_o[:] = jnp.zeros_like(dv_o)
            dband_o[:] = jnp.zeros_like(dband_o)

        @pl.when(first)
        def _():
            dproc_o[:] = jnp.zeros_like(dproc_o)

        zmask = jnp.where(last, 0.0, 1.0)
        attc_p = attc_p_r[0] * zmask
        decc_p = decc_p_r[0] * zmask
        wp_s[:, WOFF:WOFF + T] = w_p_r[0] * zmask
        wc_s[:, WOFF:WOFF + T] = wcum_p_r[0] * zmask

        ddh_total = (c_ddh[:] + ddh_r[0]) * (kdec_r[0].astype(f32) * s_dec)
        dgd, ddc_prev = lstm_gates_bwd(gd_r[0].astype(f32), decc_p,
                                       s_decc[:], ddh_total, c_ddc[:], d.d)
        dgd_c = dgd.astype(dtype)
        if variant != "nolstm2bwd":
            dxd = jnp.dot(dgd_c, wtd[:], preferred_element_type=f32)
        else:
            dxd = dgd[:, 0:d.k2] * 0.5  # slice, no lane broadcast
        dctx_total = c_dctx[:] + dctx_o_r[0] + dxd[:, d.a:d.a + d.e]

        dctx_b = dctx_total
        if variant != "noctxbwd":
            vals = []
            for tt in range(T):
                vals.append(jnp.sum(
                    dctx_b * mem[:, tt * d.e:(tt + 1) * d.e].astype(f32),
                    axis=1, keepdims=True))
            dw_from_ctx = jnp.concatenate(vals, axis=1)
        else:
            dw_from_ctx = dctx_b[:, :1] + jnp.zeros((B, T), f32) \
                + mem[:, :1].astype(f32) * 0.0

        dw_total = c_dw[:] + c_dwc[:] + dalign_r[0] + dw_from_ctx
        w_t = s_w[:]
        s = jnp.sum(w_t * dw_total, axis=1, keepdims=True)
        de = w_t * (dw_total - s)

        if variant != "noattbwd":
            q = jnp.dot(atth_r[0], wq[:], preferred_element_type=f32)
            cat[:, 2 * CS:2 * CS + d.datt] = q.astype(dtype)
            acc_w[:] = jnp.zeros_like(acc_w)
            acc_wc[:] = jnp.zeros_like(acc_wc)
            dq = jnp.zeros((B, d.datt), f32)
            for i in range(d.n_tiles):
                cat[:, 0:W] = wp_s[:, i * TT:i * TT + W].astype(dtype)
                cat[:, CS:CS + W] = wc_s[:, i * TT:i * TT + W].astype(
                    dtype)
                if variant != "norecompute":
                    m = jnp.dot(cat[:], band[:], preferred_element_type=f32)
                    feat = jnp.tanh(
                        m + proc[:, i * d.ttd:(i + 1) * d.ttd].astype(f32))
                else:
                    feat = proc[:, i * d.ttd:(i + 1) * d.ttd].astype(f32)
                de_rep = jnp.dot(de[:, i * TT:(i + 1) * TT].astype(dtype),
                                 rep1[:], preferred_element_type=f32)
                dfeat = de_rep * vrep[0]
                dm = dfeat * (1.0 - feat * feat)
                dv_o[0:1, :] = dv_o[0:1, :] + jnp.sum(
                    feat * de_rep, axis=0, keepdims=True)
                dproc_o[:, i * d.ttd:(i + 1) * d.ttd] = (
                    dproc_o[:, i * d.ttd:(i + 1) * d.ttd] + dm)
                dm_c = dm.astype(dtype)
                dband_o[:] = dband_o[:] + jax.lax.dot_general(
                    cat[:, 0:2 * CS], dm_c, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
                dcat = jnp.dot(dm_c, bandt[:], preferred_element_type=f32)
                acc_w[:, i * TT:i * TT + W] = (
                    acc_w[:, i * TT:i * TT + W] + dcat[:, 0:W])
                acc_wc[:, i * TT:i * TT + W] = (
                    acc_wc[:, i * TT:i * TT + W] + dcat[:, CS:CS + W])
                dq = dq + dcat[:, 2 * CS:2 * CS + d.datt]
        else:
            dq = de[:, 0:d.datt] + atth_r[0][:, :1].astype(f32) * 0.0
            acc_w[:] = jnp.zeros_like(acc_w)
            acc_wc[:] = jnp.zeros_like(acc_wc)
            acc_w[:, WOFF:WOFF + T] = de * 0.1
            acc_wc[:, WOFF:WOFF + T] = de * 0.1
        dq_o[0] = dq
        if variant != "nolstm1bwd":
            dah_attn = jnp.dot(dq.astype(dtype), wqt[:],
                               preferred_element_type=f32)
        else:
            # dq stays live via dq_o; cheap (B, a)-shaped stand-in
            dah_attn = atth_r[0].astype(f32) * 0.01

        dah_total = (c_dah[:] + dxd[:, 0:d.a] + dah_attn) \
            * (katt_r[0].astype(f32) * s_att)
        dga, dac_prev = lstm_gates_bwd(ga_r[0].astype(f32), attc_p,
                                       s_attc[:], dah_total, c_dac[:], d.a)
        dga_c = dga.astype(dtype)
        if variant != "nolstm1bwd":
            dxa = jnp.dot(dga_c, wta[:], preferred_element_type=f32)
        else:
            dxa = dga[:, 0:d.k1] * 0.5  # slice, no lane broadcast

        dga_o[0] = dga_c
        dgd_o[0] = dgd_c
        dpre_o[0] = dxa[:, 0:d.p]
        dctx_o[0] = dctx_total.astype(dtype)
        c_dah[:] = dxa[:, d.p + d.e:d.k1]
        c_dac[:] = dac_prev
        c_ddh[:] = dxd[:, d.a + d.e:d.k2]
        c_ddc[:] = ddc_prev
        c_dw[:] = acc_w[:, WOFF:WOFF + T]
        c_dwc[:] = c_dwc[:] + acc_wc[:, WOFF:WOFF + T]
        c_dctx[:] = dxa[:, d.p:d.p + d.e]
        s_attc[:] = attc_p_r[0]
        s_decc[:] = decc_p_r[0]
        s_w[:] = w_p_r[0]

    return kernel


def bwd_call(core, memory, proc, res, cfg, stub, variant=None):
    """ts._bwd_scan_call's plumbing with a selectable kernel body."""
    dims = ts.scan_dims(cfg, memory.shape[1])
    t_in = memory.shape[1]
    T = dims.t_pad
    dtype = jnp.bfloat16
    f32 = jnp.float32
    d = dims

    wta, wtd, wq, wqt, band, bandt, rep1, vrep = ts.pack_bwd_weights(
        core, dims, dtype)
    mem_flat, proc_flat, _ = ts.pack_batch(memory, proc, None, dims, dtype)
    padT = ((0, 0), (0, 0), (0, T - t_in))
    w_pad = jnp.pad(res["w"], padT).astype(f32)
    wcum_prev = jnp.cumsum(w_pad, axis=0) - w_pad
    dalign = jnp.pad(res["dalign"].astype(f32), padT)
    katt, kdec = ts.keep_masks(jax.random.PRNGKey(3), T_STEPS, B, dims,
                               cfg.p_attention_dropout,
                               cfg.p_decoder_dropout)

    dropout = True
    Bt = B if B <= 128 else 128
    nb = B // Bt
    if stub:
        kern = stub_bwd_kernel_factory(d, Bt, T_STEPS, dropout,
                                       cfg.p_attention_dropout,
                                       cfg.p_decoder_dropout, dtype)
    elif variant:
        kern = bwd_variant_kernel_factory(d, Bt, T_STEPS,
                                          cfg.p_attention_dropout,
                                          cfg.p_decoder_dropout, dtype,
                                          variant)
    else:
        kern = ts._make_bwd_kernel(d, Bt, T_STEPS, dropout,
                                   cfg.p_attention_dropout,
                                   cfg.p_decoder_dropout, dtype)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    bconst = lambda shape: pl.BlockSpec(
        (Bt,) + shape[1:], lambda b, t: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)

    def rev(shape):
        return pl.BlockSpec((1, Bt) + shape[1:],
                            lambda b, t: (T_STEPS - 1 - t, b, 0),
                            memory_space=pltpu.VMEM)

    def rev_prev(shape):
        def imap(b, t):
            idx = T_STEPS - 2 - t
            return (idx * (idx >= 0), b, 0)
        return pl.BlockSpec((1, Bt) + shape[1:], imap,
                            memory_space=pltpu.VMEM)

    ga = res["ga"].astype(dtype)
    gd = res["gd"].astype(dtype)
    atth = res["atth"].astype(dtype)
    attc = res["attc"].astype(f32)
    decc = res["decc"].astype(f32)
    ddh = res["ddh"].astype(f32)
    dctx_out = res["dctx"].astype(f32)

    if not stub and not variant:
        # the real kernel: go through the shipped call (keeps this tool
        # in sync with train_scan's stream layout)
        return ts._bwd_scan_call(
            wta, wtd, wq, wqt, band, bandt, rep1, vrep, proc_flat,
            mem_flat, ga, gd, atth, attc, decc, w_pad, wcum_prev,
            ddh, dctx_out, dalign, katt, kdec, dims=d, dropout=True,
            p_att=cfg.p_attention_dropout, p_dec=cfg.p_decoder_dropout,
            interpret=False)

    attc_last, decc_last, w_last = attc[-1], decc[-1], w_pad[-1]
    in_specs = [const(x.shape) for x in
                (wta, wtd, wq, wqt, band, bandt, rep1, vrep)]
    in_specs += [bconst(proc_flat.shape), bconst(mem_flat.shape),
                 bconst(attc_last.shape), bconst(decc_last.shape),
                 bconst(w_last.shape)]
    in_specs += [rev((B, 4 * d.a)), rev((B, 4 * d.d)), rev((B, d.a)),
                 rev_prev((B, d.a)), rev_prev((B, d.d)),
                 rev_prev((B, d.t_pad)), rev((B, d.t_pad)),
                 rev((B, d.d)), rev((B, d.e)), rev((B, d.t_pad))]
    inputs = [wta, wtd, wq, wqt, band, bandt, rep1, vrep, proc_flat,
              mem_flat, attc_last, decc_last, w_last,
              ga, gd, atth, attc, decc, w_pad,
              wcum_prev, ddh, dctx_out, dalign]
    in_specs += [rev((B, d.a)), rev((B, d.d))]
    inputs += [katt, kdec]

    outs = [
        jax.ShapeDtypeStruct((T_STEPS, B, 4 * d.a), dtype),
        jax.ShapeDtypeStruct((T_STEPS, B, 4 * d.d), dtype),
        jax.ShapeDtypeStruct((T_STEPS, B, d.p), f32),
        jax.ShapeDtypeStruct((T_STEPS, B, d.e), dtype),
        jax.ShapeDtypeStruct((T_STEPS, B, d.datt), f32),
        jax.ShapeDtypeStruct((2 * ts.CS, d.ttd), f32),
        jax.ShapeDtypeStruct((8, d.ttd), f32),
        jax.ShapeDtypeStruct((B, d.t_pad * d.datt), f32),
    ]
    out_specs = [rev(o.shape[1:]) for o in outs[:5]]
    out_specs += [const(outs[5].shape), const(outs[6].shape),
                  bconst(outs[7].shape)]

    scratch = [
        pltpu.VMEM((Bt, d.a), f32), pltpu.VMEM((Bt, d.a), f32),
        pltpu.VMEM((Bt, d.d), f32), pltpu.VMEM((Bt, d.d), f32),
        pltpu.VMEM((Bt, d.t_pad), f32), pltpu.VMEM((Bt, d.t_pad), f32),
        pltpu.VMEM((Bt, d.e), f32),
        pltpu.VMEM((Bt, d.cat_w), dtype),
        pltpu.VMEM((Bt, d.t_pad + 2 * ts.WOFF), f32),
        pltpu.VMEM((Bt, d.t_pad + 2 * ts.WOFF), f32),
        pltpu.VMEM((Bt, d.t_pad + 2 * ts.WOFF), f32),
        pltpu.VMEM((Bt, d.t_pad + 2 * ts.WOFF), f32),
        pltpu.VMEM((Bt, d.a), f32), pltpu.VMEM((Bt, d.d), f32),
        pltpu.VMEM((Bt, d.t_pad), f32),
    ]
    call = pl.pallas_call(
        kern, grid=(nb, T_STEPS), in_specs=in_specs, out_specs=out_specs,
        out_shape=outs, scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 2 ** 20),
        interpret=False)
    return call(*inputs)


def fwd_variant_kernel_factory(dims, B, p_att, p_dec, dtype, variant):
    """Round-5 ablation: the shipped forward body with ONE section
    replaced by a near-free stand-in (all streams and state updates
    kept live), so each section's serialized cost = full - variant.

    Variants: noatt (tile matmuls+softmax -> state-derived wnew),
    noctx (T-iteration VPU context reduction -> slice of h1d),
    nolstm1 / nolstm2 (the big gate matmul -> bias broadcast).
    """
    d = dims
    T = d.t_pad
    W = d.w_win
    f32 = jnp.float32
    s_att = 1.0 / (1.0 - p_att) if p_att > 0 else 1.0
    s_dec = 1.0 / (1.0 - p_dec) if p_dec > 0 else 1.0
    CS, TT = ts.CS, ts.TT

    def kernel(*refs):
        it = iter(refs)
        w1, b1, w2, b2, wq, band, selv, proc, mem, emask = \
            (next(it) for _ in range(10))
        prenet_r = next(it)
        katt_r = next(it)
        kdec_r = next(it)
        (ga_r, gd_r, atth_r, dech_r, attc_r, decc_r, ctx_r, w_r) = \
            (next(it) for _ in range(8))
        (x1, x2, cat, h1s, c1s, h2s, c2s, wsp, wcsp, ctxs, efull) = \
            (next(it) for _ in range(11))

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h1s[:] = jnp.zeros_like(h1s)
            c1s[:] = jnp.zeros_like(c1s)
            h2s[:] = jnp.zeros_like(h2s)
            c2s[:] = jnp.zeros_like(c2s)
            wsp[:] = jnp.zeros_like(wsp)
            wcsp[:] = jnp.zeros_like(wcsp)
            ctxs[:] = jnp.zeros_like(ctxs)
            cat[:] = jnp.zeros_like(cat)

        if variant != "nolstm1":
            x1[:, 0:d.p] = prenet_r[0]
            x1[:, d.p:d.p + d.e] = ctxs[:].astype(dtype)
            x1[:, d.p + d.e:d.k1] = h1s[:].astype(dtype)
            g1 = jnp.dot(x1[:], w1[:], preferred_element_type=f32) + b1[0]
        else:  # keep prenet/state dependencies live, skip the matmul
            g1 = (jnp.zeros((B, 4 * d.a), f32) + b1[0]
                  + prenet_r[0][:, :1].astype(f32) + h1s[:, :1])
        c1n = (jax.nn.sigmoid(g1[:, d.a:2 * d.a]) * c1s[:]
               + jax.nn.sigmoid(g1[:, 0:d.a])
               * jnp.tanh(g1[:, 2 * d.a:3 * d.a]))
        h1n = jax.nn.sigmoid(g1[:, 3 * d.a:4 * d.a]) * jnp.tanh(c1n)
        h1d = h1n * (katt_r[0].astype(f32) * s_att)

        if variant != "noatt":
            q = jnp.dot(h1d.astype(dtype), wq[:],
                        preferred_element_type=f32)
            cat[:, 2 * CS:2 * CS + d.datt] = q.astype(dtype)
            for i in range(d.n_tiles):
                cat[:, 0:W] = wsp[:, i * TT:i * TT + W].astype(dtype)
                cat[:, CS:CS + W] = wcsp[:, i * TT:i * TT + W].astype(dtype)
                m = jnp.dot(cat[:], band[:], preferred_element_type=f32)
                feat = jnp.tanh(
                    m + proc[:, i * d.ttd:(i + 1) * d.ttd].astype(f32))
                efull[:, i * TT:(i + 1) * TT] = jnp.dot(
                    feat.astype(dtype), selv[:], preferred_element_type=f32)
            e = efull[:] + emask[:]
            mx = jnp.max(e, axis=1, keepdims=True)
            ex = jnp.exp(e - mx)
            wnew = ex / jnp.sum(ex, axis=1, keepdims=True)
        else:  # state- and h1-dependent stand-in, no tile matmuls
            wnew = wsp[:, ts.WOFF:ts.WOFF + T] * 0.5 + h1d[:, :1] * 0.0 \
                + 1.0 / T

        if variant != "noctx":
            ctx = jnp.zeros((B, d.e), f32)
            for tt in range(T):
                ctx = ctx + wnew[:, tt:tt + 1] * mem[:, tt * d.e:
                                                     (tt + 1) * d.e
                                                     ].astype(f32)
        else:  # keep the wnew dependency live, skip the reduction
            ctx = h1d[:, :d.e] + wnew[:, :1]

        if variant != "nolstm2":
            x2[:, 0:d.a] = h1d.astype(dtype)
            x2[:, d.a:d.a + d.e] = ctx.astype(dtype)
            x2[:, d.a + d.e:d.k2] = h2s[:].astype(dtype)
            g2 = jnp.dot(x2[:], w2[:], preferred_element_type=f32) + b2[0]
        else:
            g2 = (jnp.zeros((B, 4 * d.d), f32) + b2[0]
                  + h1d[:, :1] + ctx[:, :1] + h2s[:, :1])
        c2n = (jax.nn.sigmoid(g2[:, d.d:2 * d.d]) * c2s[:]
               + jax.nn.sigmoid(g2[:, 0:d.d])
               * jnp.tanh(g2[:, 2 * d.d:3 * d.d]))
        h2n = jax.nn.sigmoid(g2[:, 3 * d.d:4 * d.d]) * jnp.tanh(c2n)
        h2d = h2n * (kdec_r[0].astype(f32) * s_dec)

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
        wsp[:, ts.WOFF:ts.WOFF + T] = wnew
        wcsp[:, ts.WOFF:ts.WOFF + T] = wcsp[:, ts.WOFF:ts.WOFF + T] + wnew
        ctxs[:] = ctx

    return kernel


def fwd_call(core, memory, proc, res, cfg, stub, variant=None):
    dims = ts.scan_dims(cfg, memory.shape[1])
    dtype = jnp.bfloat16
    d = dims
    f32 = jnp.float32
    w1, b1, w2, b2, wq, band, selv = ts.pack_weights(core, dims, dtype)
    mem_flat, proc_flat, emask = ts.pack_batch(memory, proc, None, dims,
                                               dtype)
    r = np.random.RandomState(1)
    prenet = jax.device_put(
        (r.randn(T_STEPS, B, d.p) * 0.1).astype(np.float32)).astype(dtype)
    katt, kdec = ts.keep_masks(jax.random.PRNGKey(3), T_STEPS, B, dims,
                               cfg.p_attention_dropout,
                               cfg.p_decoder_dropout)
    dropout = True
    Bt = B if B <= 128 else 128
    nb = B // Bt
    if stub:
        n_in = 13

        def kern(*refs):
            ins = refs[:n_in]
            outs = refs[n_in:n_in + 8]
            acc = jnp.zeros((1, 1), jnp.float32)
            for rr in ins:
                acc = acc + rr[(0,) * (len(rr.shape) - 1)][:1][None, :1] \
                    .astype(jnp.float32)
            for o in outs:
                o[...] = jnp.zeros(o.shape, o.dtype) + acc[0, 0].astype(
                    o.dtype)
    elif variant:
        kern = fwd_variant_kernel_factory(d, Bt, cfg.p_attention_dropout,
                                          cfg.p_decoder_dropout, dtype,
                                          variant)
    else:
        kern = ts._make_kernel(d, Bt, dropout, cfg.p_attention_dropout,
                               cfg.p_decoder_dropout, dtype)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    bconst = lambda shape: pl.BlockSpec(
        (Bt,) + shape[1:], lambda b, t: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    stream = lambda shape: pl.BlockSpec(
        (1, Bt) + shape[1:], lambda b, t: (t, b, 0),
        memory_space=pltpu.VMEM)

    in_specs = [const(w1.shape), const(b1.shape), const(w2.shape),
                const(b2.shape), const(wq.shape), const(band.shape),
                const(selv.shape), bconst(proc_flat.shape),
                bconst(mem_flat.shape), bconst(emask.shape),
                stream((B, d.p)), stream((B, d.a)), stream((B, d.d))]
    inputs = [w1, b1, w2, b2, wq, band, selv, proc_flat, mem_flat, emask,
              prenet, katt, kdec]
    outs = [
        jax.ShapeDtypeStruct((T_STEPS, B, 4 * d.a), dtype),
        jax.ShapeDtypeStruct((T_STEPS, B, 4 * d.d), dtype),
        jax.ShapeDtypeStruct((T_STEPS, B, d.a), dtype),
        jax.ShapeDtypeStruct((T_STEPS, B, d.d), dtype),
        jax.ShapeDtypeStruct((T_STEPS, B, d.a), f32),
        jax.ShapeDtypeStruct((T_STEPS, B, d.d), f32),
        jax.ShapeDtypeStruct((T_STEPS, B, d.e), f32),
        jax.ShapeDtypeStruct((T_STEPS, B, d.t_pad), f32),
    ]
    out_specs = [stream(o.shape[1:]) for o in outs]
    scratch = [
        pltpu.VMEM((Bt, d.k1), dtype), pltpu.VMEM((Bt, d.k2), dtype),
        pltpu.VMEM((Bt, d.cat_w), dtype),
        pltpu.VMEM((Bt, d.a), f32), pltpu.VMEM((Bt, d.a), f32),
        pltpu.VMEM((Bt, d.d), f32), pltpu.VMEM((Bt, d.d), f32),
        pltpu.VMEM((Bt, d.t_pad + 2 * ts.WOFF), f32),
        pltpu.VMEM((Bt, d.t_pad + 2 * ts.WOFF), f32),
        pltpu.VMEM((Bt, d.e), f32),
        pltpu.VMEM((Bt, d.t_pad), f32),
    ]
    call = pl.pallas_call(
        kern, grid=(nb, T_STEPS), in_specs=in_specs, out_specs=out_specs,
        out_shape=outs, scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 2 ** 20),
        interpret=False)
    return call(*inputs)


def postpass_call(core, memory, proc, res, cfg, _):
    """attention_param_grads standalone (round-4 d_band form)."""
    d = ts.scan_dims(cfg, memory.shape[1])
    key = jax.random.PRNGKey(9)
    dband = jax.random.normal(key, (2 * ts.CS, d.ttd)) * 0.1
    dq_st = jax.random.normal(key, (T_STEPS, B, d.datt)) * 0.1
    dv_acc = jnp.zeros((8, d.ttd), jnp.float32)
    return ts.attention_param_grads(core, d, res["atth"], dq_st, dband,
                                    dv_acc)


def masks_call(core, memory, proc, res, cfg, _):
    """keep_masks as called TWICE per step (fwd + bwd recompute)."""
    d = ts.scan_dims(cfg, memory.shape[1])
    a = ts.keep_masks(jax.random.PRNGKey(3), T_STEPS, B, d,
                      cfg.p_attention_dropout, cfg.p_decoder_dropout)
    b = ts.keep_masks(jax.random.PRNGKey(3), T_STEPS, B, d,
                      cfg.p_attention_dropout, cfg.p_decoder_dropout)
    return a, b


def glue_call(core, memory, proc, res, cfg, _):
    """Everything backward_chain does around the pallas_call: weight
    repack, batch repack, w padding + exclusive cumsum."""
    d = ts.scan_dims(cfg, memory.shape[1])
    T = d.t_pad
    packs = ts.pack_bwd_weights(core, d, jnp.bfloat16)
    mem_flat, proc_flat, _ = ts.pack_batch(memory, proc, None, d,
                                           jnp.bfloat16)
    w_pad = jnp.pad(res["w"], ((0, 0), (0, 0), (0, T - memory.shape[1])))
    wcum_prev = jnp.cumsum(w_pad, axis=0) - w_pad
    return packs, mem_flat, proc_flat, w_pad, wcum_prev


def main():
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass
    cfg = Tacotron2Config(compute_dtype="bfloat16", batch_size=B,
                          prng_impl="unsafe_rbg")
    dims = ts.scan_dims(cfg, T_IN)
    # experimental override: let the fp32 d_processed accumulator be
    # BUILT past the shipped cap so its VMEM fit can be probed on chip
    # (the shipped gate only widens after a measured green run)
    need = min(B, 128) * dims.t_pad
    if need > ts._FP32_DPROC_CAP:
        print(json.dumps({"override_fp32_dproc_cap": need}), flush=True)
        ts._FP32_DPROC_CAP = need
    core, memory, proc, res = make_inputs(cfg, dims)

    out = {"B": B, "T_in": T_IN, "T_steps": T_STEPS}
    which = [a for a in sys.argv[1:]
             if not a.isdigit() and "=" not in a] or \
        ["bwd_real", "bwd_stub", "fwd_real", "fwd_stub"]
    def _fwd_var(variant):
        def call(core, memory, proc, res, cfg, _):
            return fwd_call(core, memory, proc, res, cfg, False,
                            variant=variant)
        return call

    def _bwd_var(variant):
        def call(core, memory, proc, res, cfg, _):
            return bwd_call(core, memory, proc, res, cfg, False,
                            variant=variant)
        return call

    table = {
        "bwd_real": (bwd_call, False), "bwd_stub": (bwd_call, True),
        "fwd_real": (fwd_call, False), "fwd_stub": (fwd_call, True),
        "postpass": (postpass_call, None), "masks": (masks_call, None),
        "glue": (glue_call, None),
        # round-5 forward-section ablations (full - variant = section cost)
        "fwd_noatt": (_fwd_var("noatt"), None),
        "fwd_noctx": (_fwd_var("noctx"), None),
        "fwd_nolstm1": (_fwd_var("nolstm1"), None),
        "fwd_nolstm2": (_fwd_var("nolstm2"), None),
        "bwd_noctx": (_bwd_var("noctxbwd"), None),
        "bwd_noatt": (_bwd_var("noattbwd"), None),
        "bwd_norecompute": (_bwd_var("norecompute"), None),
        "bwd_nolstm1": (_bwd_var("nolstm1bwd"), None),
        "bwd_nolstm2": (_bwd_var("nolstm2bwd"), None),
        "bwd_novpugates": (_bwd_var("novpugates"), None),
    }
    for name in which:
        call, stub = table[name]
        # the operand pytrees MUST be jit ARGUMENTS: closed-over device
        # arrays become graph constants, and the axon remote-compile
        # path serializes constants — a ~2.6 GB const set turns a
        # 2-minute compile into a 20+-minute, 25 GB stall
        jfn = jax.jit(lambda c, m, p, r, _call=call, _stub=stub:
                      _call(c, m, p, r, cfg, _stub))
        ms = timeit(functools.partial(jfn, core, memory, proc, res))
        out[name] = {"ms": round(ms, 2),
                     "us_per_step": round(ms * 1e3 / T_STEPS, 2)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
