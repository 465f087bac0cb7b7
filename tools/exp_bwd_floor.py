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


def bwd_call(core, memory, proc, res, cfg, stub: bool):
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

    if not stub:
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


def fwd_call(core, memory, proc, res, cfg, stub: bool):
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
    table = {
        "bwd_real": (bwd_call, False), "bwd_stub": (bwd_call, True),
        "fwd_real": (fwd_call, False), "fwd_stub": (fwd_call, True),
        "postpass": (postpass_call, None), "masks": (masks_call, None),
        "glue": (glue_call, None),
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
