"""Pallas TPU kernels: weights-resident teacher-forced decoder scans.

The training step's decoder scan re-streams every decoder weight matrix
from HBM on each of the ~512 sequential steps (~36 MB/step in bf16) — at
B=128 that stream is comparable to the step's MXU time, so the XLA scan
sits at max(weight-stream, compute) per step (PERFORMANCE.md). The two
kernels here run the WHOLE forward scan and the whole backward
data-gradient chain as single ``pallas_call``s with ``grid=(T_steps,)``:

- every weight matrix has a constant ``index_map``, so the Pallas
  pipeline fetches it into VMEM once and it stays resident for all steps
  — per-step weight HBM traffic drops to zero;
- the recurrent state (LSTM h/c, attention weights/cumulative, context)
  lives in VMEM scratch, persisting across grid steps;
- per-step residual stacks stream out with ``index_map=(t, 0, 0)`` —
  exactly the ``_Residuals`` the custom-VJP backward
  (models/decoder_vjp.py) consumes, so the forward kernel drops in as
  the forward of the existing hand-written VJP.

Location-sensitive attention without transposes or 3D relayouts, in a
T-MAJOR tiled layout (round 3; the round-2 kernel was d-major and hard
capped at T_in <= 128 because its banded matrices scaled O(T^2)):

- the per-step energies tensor ``tanh(q + loc + proc)`` lives FLAT as
  ``(B, T_pad * attention_dim)`` (lane ``t*datt + d``), processed in
  tiles of TT=64 encoder positions;
- for each tile, ONE MXU matmul ``cat @ band`` produces the tile's
  pre-tanh tensor, where ``cat = [w_window ; w_cum_window ; query]`` and
  ``band`` stacks two WINDOWED banded-Toeplitz matrices (the k=31
  location conv folded through the 32->128 location dense) plus a
  query-replication selector. Because the conv is
  translation-invariant, the SAME (2*128+datt, TT*datt) band matrix
  serves every tile — its size is independent of T_in, which is what
  lifts the round-2 T_in <= 128 cap to 256;
- the masked-softmax energies reduce over ``d`` with a second matmul
  against a v-folded block-diagonal selector (also shared across tiles).

This trades ~1 GFLOP/step of extra (structured-sparse) MXU work for a
layout in which every op is a plain matmul, lane slice, or lane-dim
reduction.

The BACKWARD kernel (``backward_chain``) mirrors the reverse scan of
decoder_vjp with the transposed LSTM weights and the banded matrices
VMEM-resident. Per step it computes ONLY the sequential data-gradient
chain and emits per-step cotangent stacks (dga, dgd, d_prenet, d_ctx,
d_q); the LSTM weight gradients hoist outside into batched einsums over
those stacks. The location conv/dense gradients ride an IN-KERNEL
``d_band`` accumulator (round 4): the band matrix is shared by every
tile and step, so ``d_band += cat^T @ d_m`` per tile (one extra MXU
matmul against the already-resident operands), and the parameter
gradients are recovered outside via the exact bilinear-fold chain rule
(``attention_param_grads``). This replaced the round-3 design that
emitted the full (T_steps, B, T_pad*datt) d_M stack (2.1 GB of HBM at
T_in=128) and recovered the conv gradients in a chunked
conv-correlation post-pass — measured at 44.8 ms/step-chain, MORE than
the backward kernel itself (43.3 ms; BENCH_DETAILS
round4_bwd_breakdown). d_processed is accumulated IN-KERNEL in EXACT
fp32 — always: a round-3 variant that recovered it by summing the
bf16-rounded d_M stack was root-caused (via the tone-corpus quality
gate + a hybrid bisect) as a training-quality drift and DELETED; shapes
whose fp32 accumulator exceeds the VMEM envelope (``bwd_supported``)
take the XLA custom-VJP backward instead.

Numerics vs the XLA forward (``decoder_vjp._forward``): forward math is
the same op chain with fp32 accumulation where the XLA bf16 path
downcasts between its two LSTM gate dots, so values match to bf16
round-off (tests pin ~2e-2 absolute on unit-scale activations); dropout
keep masks are precomputed OUTSIDE with the identical
``fold_in(fold_in(rng, t), 0|1)`` key derivation — stored as bf16 0/1
keep bits (exact) and scaled in-kernel by the static fp32 1/(1-p), the
same fp32 product the scale-mask formulation computes — so the dropout
pattern is bit-identical to the XLA scan's.

Envelope: bf16 compute, trace-time batch a multiple of 8 and <= 128
(or a multiple of 128 up to 512: uniform batch tiles), T_in <= 256
(<= 192 when the batch tile exceeds 64 rows: the backward's resident
set at B=128/T=256 exceeds VMEM), and (prenet_dim, encoder_embedding_dim,
attention_rnn_dim, decoder_rnn_dim, attention_dim) all multiples of 128
(the default 256/512/1024/1024/128 config qualifies). ``supported()``
reports eligibility; callers fall back to the XLA scan otherwise.

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

TT = 64      # encoder-position tile size of the flat attention layout
WOFF = 16    # window margin (>= (ks-1)//2; ks <= 33)
# Channel stride inside the cat vector. 96 = w_win exactly (round 4):
# the two window slabs pack back to back with no zero-padding rows, so
# the banded matmuls contract 320 instead of 384 rows (-17% FLOPs) and
# band/bandt/d_band shrink accordingly. The slab boundary sits at lane
# 96 (not vreg-aligned) — measured on-chip before adoption.
CS = 96

# Forward time-unroll: decoder steps per grid iteration (identical math,
# ku-row stream blocks). MEASURED REFUTATION (round 5): 2 at
# B=128/T_in=128 with the feat stream lost 2.7% (672.6k vs 691.0k) —
# doubling stream-block size costs more than halving buffer rotations
# saves, consistent with the round-4 width-neutral merged-streams
# refutation (Mosaic pipelines many small transfers well). Machinery
# kept (parity tested at 2, tests/test_train_scan.py) for
# re-measurement at other shapes; shipped value stays 1.
TIME_UNROLL = 1


class ScanDims(NamedTuple):
    """Static layout of the training-scan kernels."""
    p: int       # prenet_dim
    e: int       # encoder_embedding_dim
    a: int       # attention_rnn_dim
    d: int       # decoder_rnn_dim
    datt: int    # attention_dim
    ks: int      # location conv kernel size (odd)
    t_pad: int   # encoder length padded to a multiple of TT
    k1: int      # p + e + a (attention LSTM input rows)
    k2: int      # a + e + d (decoder LSTM input rows)

    @property
    def n_tiles(self) -> int:
        return self.t_pad // TT

    @property
    def w_win(self) -> int:
        """Rows of one channel's window: the TT tile plus both margins."""
        return TT + 2 * WOFF

    @property
    def cat_w(self) -> int:
        """Width of the per-tile cat vector: two packed channel slots
        ([0:w_win) and [CS:CS+w_win)) plus the query. With CS == w_win
        (96) the slabs abut gap-free — no zero margin rows."""
        return 2 * CS + self.datt

    @property
    def ttd(self) -> int:
        return TT * self.datt


def scan_dims(cfg: Tacotron2Config, t_in: int) -> ScanDims:
    p, e = cfg.prenet_dim, cfg.encoder_embedding_dim
    a, d = cfg.attention_rnn_dim, cfg.decoder_rnn_dim
    return ScanDims(p=p, e=e, a=a, d=d, datt=cfg.attention_dim,
                    ks=cfg.attention_location_kernel_size,
                    t_pad=-(-t_in // TT) * TT,
                    k1=p + e + a, k2=a + e + d)


def _batch_fits(dims: ScanDims, b: int) -> bool:
    """Whether one (per-device) batch value fits the kernel envelope.

    VMEM bound: the backward kernel's resident set (both band
    orientations + memory + the transposed LSTM weights) exceeds VMEM
    at B_tile=128 x T_pad=256; B <= 64 leaves room for the full 256.
    batch > 128 runs as ceil(B/128) batch tiles over the grid's leading
    dim (each tile a full sequential chain, weights fetched once), BUT
    the per-batch-tile bconst blocks (mem is 16 MB at T_pad=128) then
    DOUBLE-BUFFER across tiles — round-5 on-chip measurement: the
    backward is 7 MB over VMEM at B=256 x T_pad=128 (with or without
    the feat stream), while B=256 x T_pad=64 compiles and passes the
    parity harness. So batch tiles cap at T_pad <= 64; tiles must be
    uniform.
    """
    b_tile = b if b <= 128 else 128
    uniform = b <= 128 or b % 128 == 0
    if b > 128:
        t_cap = 64
    else:
        t_cap = 256 if b_tile <= 64 else 192
    return (dims.t_pad <= t_cap and b % 8 == 0 and b <= 512 and uniform)


# fp32 in-kernel d_processed accumulator envelope: per-tile rows x t_pad.
# Shared by bwd_supported() and _bwd_scan_call so the gate and the kernel
# can never disagree (ADVICE r3: a per-shard gate candidate once accepted
# shapes the trace-time kernel then built WITHOUT the fp32 accumulator).
# 128x192 (round 4): deleting the d_M emission stream and slab-trimming
# the d_band accumulator freed the VMEM that round 3's 128x128 cap
# protected — the 192-symbol bucket's backward now compiles and runs at
# B=128 on the chip (103.4 us/step; BENCH_DETAILS round4_bucket192).
# T_pad=256 stays excluded at B_tile > 64 (_batch_fits t_cap).
_FP32_DPROC_CAP = 128 * 192


def _fp32_dproc_fits(dims: ScanDims, batch: int) -> bool:
    return min(batch, 128) * dims.t_pad <= _FP32_DPROC_CAP


def feat_stream_fits(dims: ScanDims, batch: int) -> bool:
    """Whether the fwd->bwd feat residual stream fits the backward's
    VMEM plan. Round-5 measured boundary: at batch tiles (B > 128) the
    per-tile bconst blocks (mem 16 MB at T_pad=128) double-buffer, and
    the feat input window pushes the plan 1.3 MB over at
    B=256/T_pad=128 — while B <= 128 fits through T_pad=192 (on-chip)
    and the B=256/T_pad=64 shape passes the on-chip parity harness.
    Off-fit shapes keep the backward kernel with feat rematerialized
    (the round-4 form)."""
    return batch <= 128 or dims.t_pad <= 64


def bwd_supported(cfg: Tacotron2Config, t_in: int, batch: int) -> bool:
    """Whether the BACKWARD kernel may be used for this shape: the
    forward envelope plus the fp32 in-kernel d_processed accumulator
    (per-tile rows x t_pad within ``_FP32_DPROC_CAP``). A bf16 d_M
    fallback sum existed in round 3 and was root-caused as a
    training-quality drift (tone-corpus gate: late gate, 8/11 tones);
    it has been REMOVED — the backward kernel only runs where the exact
    fp32 accumulation fits, and every other shape takes the XLA
    custom-VJP backward.

    ``batch`` is the TRACE-TIME batch — the shape the kernel is built
    with (under the GSPMD-jitted train step that is the global batch).
    """
    if not supported(cfg, t_in, batch):
        return False
    return _fp32_dproc_fits(scan_dims(cfg, t_in), batch)


def supported(cfg: Tacotron2Config, t_in: int, batch: int) -> bool:
    """Whether this (cfg, shapes) combination fits the kernel envelope.

    ``batch`` is the TRACE-TIME batch — the batch dimension of the
    arrays actually passed to the kernel, which is what the Pallas grid
    and VMEM plan are built from. Under the GSPMD-jitted train step the
    whole step is traced at GLOBAL shapes, so callers pass the global
    batch. (Round 2/3 additionally accepted shapes whose PER-SHARD
    slice fits; that gate disagreed with the kernel build and could
    drive Mosaic into over-VMEM compiles — ADVICE r3 — so the gate now
    matches the build exactly.)
    """
    dims = scan_dims(cfg, t_in)
    aligned = all(x % 128 == 0 for x in
                  (dims.p, dims.e, dims.a, dims.d, dims.datt))
    if not (cfg.jax_compute_dtype == jnp.bfloat16
            and cfg.decoder_interleave <= 1 and aligned
            and dims.ks % 2 == 1 and dims.ks <= 2 * WOFF + 1):
        return False
    return _batch_fits(dims, batch)


# ------------------------------------------------------------- packing

def _band_constants(dims: ScanDims):
    """Constant structure tensors (baked into the executable).

    Ew[k] places conv tap k inside the window: the cat vector's channel
    slab holds w[t0 - WOFF + j] at row j, and the tile's output position
    tl needs tap k at w[t0 + tl + k - pad], i.e. j = tl + k + (WOFF-pad)
    -> np.eye(w_win, TT, k=-(k + WOFF - pad)). Because the conv is
    translation-invariant this is the SAME matrix for every tile.
    qsel replicates the query across every tile position; eye_tt is
    reused to fold v into the energy-reduction selector.
    """
    pad = (dims.ks - 1) // 2
    off = WOFF - pad
    Ew = np.stack([np.eye(dims.w_win, TT, k=-(off + k), dtype=np.float32)
                   for k in range(dims.ks)])           # (ks, w_win, TT)
    qsel = np.tile(np.eye(dims.datt, dtype=np.float32),
                   (1, TT))                            # (datt, TT*datt)
    eye_tt = np.eye(TT, dtype=np.float32)
    return jnp.asarray(Ew), jnp.asarray(qsel), jnp.asarray(eye_tt)


def pack_weights(core_params, dims: ScanDims, dtype=jnp.bfloat16):
    """Repack the decoder core pytree into the kernel's resident layout.

    Runs under jit inside the train step (cheap: ~0.2 GFLOP for the
    windowed-Toeplitz band build). Not differentiated — the custom-VJP
    backward computes parameter gradients analytically from the residual
    stacks.
    """
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
    Ew, qsel, eye_tt = _band_constants(dims)
    # band_c[j, tl*datt + d] = K2 tap hitting output tl from window row j
    band = jnp.zeros((dims.cat_w, dims.ttd), f32)
    for c in range(2):
        b3 = jnp.einsum("kjt,kd->jtd", Ew, K2[:, c])   # (w_win, TT, datt)
        band = jax.lax.dynamic_update_slice(
            band, b3.reshape(dims.w_win, dims.ttd), (c * CS, 0))
    band = jax.lax.dynamic_update_slice(band, qsel, (2 * CS, 0))
    band = band.astype(dtype)                          # (cat_w, TT*datt)

    # selv[tl*datt + d, tl'] = v[d] * (tl == tl')  — shared by all tiles
    v = att["v"]["kernel"][:, 0]                       # (datt,)
    selv = (eye_tt[:, None, :] * v[None, :, None]).reshape(
        dims.ttd, TT).astype(dtype)
    return w1, b1, w2, b2, wq, band, selv


def pack_batch(memory, processed, mask, dims: ScanDims, dtype=jnp.bfloat16):
    """Flatten per-batch attention constants into the t-major lane layout
    (both are plain reshapes — no transposes)."""
    B, t_in, _ = memory.shape
    T = dims.t_pad
    pt = T - t_in
    mem_flat = jnp.pad(memory, ((0, 0), (0, pt), (0, 0))).astype(
        dtype).reshape(B, T * dims.e)
    proc_flat = jnp.pad(processed, ((0, 0), (0, pt), (0, 0))).astype(
        dtype).reshape(B, T * dims.datt)
    if mask is None:
        mask = jnp.ones((B, t_in), bool)
    maskp = jnp.pad(mask, ((0, 0), (0, pt)))
    emask = jnp.where(maskp, 0.0, NEG).astype(jnp.float32)
    return mem_flat, proc_flat, emask


def keep_masks(scan_rng, T_steps: int, B: int, dims: ScanDims,
               p_att: float, p_dec: float):
    """(T, B, a)/(T, B, d) bf16 0/1 dropout KEEP masks, drawn with
    EXACTLY the key derivation of the in-scan XLA path
    (decoder_vjp._step_keep_masks), so the pattern is bit-identical.
    The 1/(1-p) scale is applied in-kernel as a static fp32 scalar —
    the same fp32 product the round-2 fp32 scale-mask formulation
    computed, at half the HBM footprint and stream bandwidth."""
    def one(t):
        key_t = jax.random.fold_in(scan_rng, t)
        ka = jax.random.bernoulli(jax.random.fold_in(key_t, 0),
                                  1.0 - p_att, (B, dims.a))
        kd = jax.random.bernoulli(jax.random.fold_in(key_t, 1),
                                  1.0 - p_dec, (B, dims.d))
        return (ka.astype(jnp.bfloat16), kd.astype(jnp.bfloat16))
    return jax.vmap(one)(jnp.arange(T_steps))


# -------------------------------------------------------------- kernel

def _make_kernel(dims: ScanDims, B: int, dropout: bool,
                 p_att: float, p_dec: float, dtype,
                 stream_feat: bool = False, ku: int = 1):
    d = dims
    T = d.t_pad
    W = d.w_win
    f32 = jnp.float32
    s_att = 1.0 / (1.0 - p_att) if p_att > 0 else 1.0
    s_dec = 1.0 / (1.0 - p_dec) if p_dec > 0 else 1.0

    def kernel(*refs):
        it = iter(refs)
        w1, b1, w2, b2, wq, band, selv, proc, mem, emask = \
            (next(it) for _ in range(10))
        prenet_r = next(it)
        katt_r = next(it) if dropout else None
        kdec_r = next(it) if dropout else None
        (ga_r, gd_r, atth_r, dech_r, attc_r, decc_r, ctx_r, w_r) = \
            (next(it) for _ in range(8))
        feat_r = next(it) if stream_feat else None
        (x1, x2, cat, h1s, c1s, h2s, c2s, wsp, wcsp, ctxs, efull) = \
            (next(it) for _ in range(11))

        t = pl.program_id(1)  # grid = (batch_tiles, T_steps // ku)

        @pl.when(t == 0)
        def _():
            h1s[:] = jnp.zeros_like(h1s)
            c1s[:] = jnp.zeros_like(c1s)
            h2s[:] = jnp.zeros_like(h2s)
            c2s[:] = jnp.zeros_like(c2s)
            wsp[:] = jnp.zeros_like(wsp)
            wcsp[:] = jnp.zeros_like(wcsp)
            ctxs[:] = jnp.zeros_like(ctxs)
            cat[:] = jnp.zeros_like(cat)  # channel-slot margins stay 0

        # ku > 1 (round 5): each grid iteration runs ku decoder steps on
        # ku-row stream blocks — the per-step op chain is IDENTICAL
        # (bit-identical outputs), but per-step pipeline overhead
        # (buffer rotations, DMA issues) halves. The round-5 ablation
        # measured ~5.5 ms of the forward's 8.1 ms pipeline floor
        # exposed (not hidden under compute).
        for k in range(ku):
            # ---- attention LSTM:  [prenet_t ; ctx ; h1] @ [wi ; wh] ----
            x1[:, 0:d.p] = prenet_r[k]
            x1[:, d.p:d.p + d.e] = ctxs[:].astype(dtype)
            x1[:, d.p + d.e:d.k1] = h1s[:].astype(dtype)
            g1 = jnp.dot(x1[:], w1[:], preferred_element_type=f32) + b1[0]
            c1n = (jax.nn.sigmoid(g1[:, d.a:2 * d.a]) * c1s[:]
                   + jax.nn.sigmoid(g1[:, 0:d.a])
                   * jnp.tanh(g1[:, 2 * d.a:3 * d.a]))
            h1n = jax.nn.sigmoid(g1[:, 3 * d.a:4 * d.a]) * jnp.tanh(c1n)
            h1d = h1n * (katt_r[k].astype(f32) * s_att) if dropout else h1n

            # ---- location-sensitive attention (t-major windowed tiles) --
            q = jnp.dot(h1d.astype(dtype), wq[:],
                        preferred_element_type=f32)
            cat[:, 2 * CS:2 * CS + d.datt] = q.astype(dtype)
            for i in range(d.n_tiles):
                cat[:, 0:W] = wsp[:, i * TT:i * TT + W].astype(dtype)
                cat[:, CS:CS + W] = wcsp[:, i * TT:i * TT + W].astype(
                    dtype)
                m = jnp.dot(cat[:], band[:], preferred_element_type=f32)
                feat = jnp.tanh(
                    m + proc[:, i * d.ttd:(i + 1) * d.ttd].astype(f32))
                feat_c = feat.astype(dtype)
                if stream_feat:
                    # emit the post-tanh energies tensor so the backward
                    # consumes it instead of rematerializing cat@band +
                    # tanh (round-5 ablation: the remat was 11.0 ms of
                    # the 44.2 ms backward — BENCH_DETAILS
                    # round5_section_ablation)
                    feat_r[k, :, i * d.ttd:(i + 1) * d.ttd] = feat_c
                efull[:, i * TT:(i + 1) * TT] = jnp.dot(
                    feat_c, selv[:], preferred_element_type=f32)
            e = efull[:] + emask[:]
            mx = jnp.max(e, axis=1, keepdims=True)
            ex = jnp.exp(e - mx)
            wnew = ex / jnp.sum(ex, axis=1, keepdims=True)
            ctx = jnp.zeros((B, d.e), f32)
            for tt in range(T):
                ctx = ctx + wnew[:, tt:tt + 1] * mem[:, tt * d.e:
                                                     (tt + 1) * d.e
                                                     ].astype(f32)

            # ---- decoder LSTM:  [h1 ; ctx ; h2] @ [wi ; wh] ----
            x2[:, 0:d.a] = h1d.astype(dtype)
            x2[:, d.a:d.a + d.e] = ctx.astype(dtype)
            x2[:, d.a + d.e:d.k2] = h2s[:].astype(dtype)
            g2 = jnp.dot(x2[:], w2[:], preferred_element_type=f32) + b2[0]
            c2n = (jax.nn.sigmoid(g2[:, d.d:2 * d.d]) * c2s[:]
                   + jax.nn.sigmoid(g2[:, 0:d.d])
                   * jnp.tanh(g2[:, 2 * d.d:3 * d.d]))
            h2n = jax.nn.sigmoid(g2[:, 3 * d.d:4 * d.d]) * jnp.tanh(c2n)
            h2d = h2n * (kdec_r[k].astype(f32) * s_dec) if dropout else h2n

            # ---- residual stacks out; state update ----
            ga_r[k] = g1.astype(dtype)
            gd_r[k] = g2.astype(dtype)
            atth_r[k] = h1d.astype(dtype)
            dech_r[k] = h2d.astype(dtype)
            attc_r[k] = c1n
            decc_r[k] = c2n
            ctx_r[k] = ctx
            w_r[k] = wnew
            h1s[:] = h1d
            c1s[:] = c1n
            h2s[:] = h2d
            c2s[:] = c2n
            wsp[:, WOFF:WOFF + T] = wnew
            wcsp[:, WOFF:WOFF + T] = wcsp[:, WOFF:WOFF + T] + wnew
            ctxs[:] = ctx

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "dropout", "p_att",
                                             "p_dec", "interpret",
                                             "stream_feat"))
def _scan_call(w1, b1, w2, b2, wq, band, selv, proc_flat, mem_flat, emask,
               prenet_steps, katt, kdec, dims: ScanDims, dropout: bool,
               p_att: float, p_dec: float, interpret: bool,
               stream_feat: bool = False):
    d = dims
    T_steps, B, _ = prenet_steps.shape
    if not _batch_fits(d, B):
        raise ValueError(
            f"train_scan forward kernel built with trace-time batch {B}, "
            f"t_pad {d.t_pad}, which is outside the envelope "
            f"(_batch_fits) — gate calls on supported() with the batch "
            f"actually passed to the kernel")
    Bt = B if B <= 128 else 128   # batch tile rows (uniform tiles)
    nb = B // Bt
    dtype = jnp.bfloat16
    f32 = jnp.float32
    ku = TIME_UNROLL if TIME_UNROLL > 1 and T_steps % TIME_UNROLL == 0 \
        else 1
    kern = _make_kernel(d, Bt, dropout, p_att, p_dec, dtype,
                        stream_feat=stream_feat, ku=ku)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    bconst = lambda shape: pl.BlockSpec(
        (Bt,) + shape[1:], lambda b, t: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    stream = lambda shape: pl.BlockSpec(
        (ku, Bt) + shape[1:], lambda b, t: (t, b, 0),
        memory_space=pltpu.VMEM)

    in_specs = [const(w1.shape), const(b1.shape), const(w2.shape),
                const(b2.shape), const(wq.shape), const(band.shape),
                const(selv.shape), bconst(proc_flat.shape),
                bconst(mem_flat.shape), bconst(emask.shape),
                stream((B, d.p))]
    inputs = [w1, b1, w2, b2, wq, band, selv, proc_flat, mem_flat, emask,
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
    if stream_feat:
        outs.append(jax.ShapeDtypeStruct(
            (T_steps, B, d.t_pad * d.datt), dtype))           # feat
    out_specs = [stream(o.shape[1:]) for o in outs]

    scratch = [
        pltpu.VMEM((Bt, d.k1), dtype), pltpu.VMEM((Bt, d.k2), dtype),
        pltpu.VMEM((Bt, d.cat_w), dtype),
        pltpu.VMEM((Bt, d.a), f32), pltpu.VMEM((Bt, d.a), f32),
        pltpu.VMEM((Bt, d.d), f32), pltpu.VMEM((Bt, d.d), f32),
        pltpu.VMEM((Bt, d.t_pad + 2 * WOFF), f32),
        pltpu.VMEM((Bt, d.t_pad + 2 * WOFF), f32),
        pltpu.VMEM((Bt, d.e), f32),
        pltpu.VMEM((Bt, d.t_pad), f32),
    ]
    return pl.pallas_call(
        kern,
        grid=(nb, T_steps // ku),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=outs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 2 ** 20),
        interpret=interpret,
    )(*inputs)


def forward_residuals(core_params, prenet_steps, memory, processed, mask,
                      scan_rng, cfg: Tacotron2Config, dropout_active: bool,
                      interpret: Optional[bool] = None, keep=None,
                      emit_feat: bool = False):
    """Run the fused forward scan; returns the 8 time-major residual
    stacks (ga, gd, att_h, dec_h, att_c, dec_c, ctx, w) with w trimmed to
    the true T_in — the same values ``decoder_vjp._forward`` produces.

    ``prenet_steps``: (T_steps, B, prenet_dim) time-major (any dtype;
    cast to bf16). ``interpret`` defaults to True off-TPU (CPU tests).
    ``keep``: optional precomputed (katt, kdec) keep-mask stacks from
    ``keep_masks`` — the custom-VJP driver generates them ONCE and
    threads them through its residuals so the backward does not re-derive
    them (round 5; the double generation cost ~4.5 ms/step at B=128).
    """
    dims = scan_dims(cfg, memory.shape[1])
    if interpret is None:
        interpret = cfg.pallas_interpret
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T_steps, B, _ = prenet_steps.shape
    t_in = memory.shape[1]
    dtype = jnp.bfloat16

    w1, b1, w2, b2, wq, band, selv = pack_weights(core_params, dims, dtype)
    mem_flat, proc_flat, emask = pack_batch(memory, processed, mask, dims,
                                            dtype)
    if not dropout_active:
        katt = kdec = jnp.zeros((1,), jnp.float32)  # unused placeholder
    elif keep is not None:
        katt, kdec = keep
    else:
        katt, kdec = keep_masks(scan_rng, T_steps, B, dims,
                                cfg.p_attention_dropout,
                                cfg.p_decoder_dropout)

    outs = _scan_call(w1, b1, w2, b2, wq, band, selv, proc_flat, mem_flat,
                      emask, prenet_steps.astype(dtype), katt, kdec,
                      dims, dropout_active, cfg.p_attention_dropout,
                      cfg.p_decoder_dropout, interpret,
                      stream_feat=emit_feat)
    if emit_feat:
        ga, gd, att_h, dec_h, att_c, dec_c, ctx, w, feat = outs
        return (ga, gd, att_h, dec_h, att_c, dec_c, ctx,
                w[..., :t_in]), feat
    ga, gd, att_h, dec_h, att_c, dec_c, ctx, w = outs
    return ga, gd, att_h, dec_h, att_c, dec_c, ctx, w[..., :t_in]


# ===================================================================
# Backward data-gradient chain kernel
# ===================================================================

def pack_bwd_weights(core_params, dims: ScanDims, dtype=jnp.bfloat16):
    """Transposed/resident operands for the backward kernel."""
    w1, b1, w2, b2, wq, band, selv = pack_weights(core_params, dims, dtype)
    del b1, b2, selv
    # rep1[tl', tl*datt + d] = (tl == tl'): replicates the per-tile
    # softmax cotangent de (B, TT) to the flat (B, TT*datt) layout.
    rep1 = jnp.kron(jnp.eye(TT, dtype=jnp.float32),
                    jnp.ones((1, dims.datt), jnp.float32)).astype(dtype)
    v = core_params["attention"]["v"]["kernel"][:, 0]
    vrep = jnp.tile(v, TT)[None, :].astype(jnp.float32)  # (1, TT*datt)
    return (w1.T, w2.T, wq, wq.T, band, band.T, rep1, vrep)


def _make_bwd_kernel(dims: ScanDims, B: int, nsteps: int, dropout: bool,
                     p_att: float, p_dec: float, dtype,
                     stream_feat: bool = False):
    d = dims
    T = d.t_pad
    W = d.w_win
    f32 = jnp.float32
    s_att = 1.0 / (1.0 - p_att) if p_att > 0 else 1.0
    s_dec = 1.0 / (1.0 - p_dec) if p_dec > 0 else 1.0

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
        (wta, wtd, wqt, bandt, rep1, vrep, mem,
         attc_l, decc_l, w_l) = (next(it) for _ in range(10))
        # wq, proc and band exist only to rebuild feat — with the
        # streamed feat residual all three are dropped from the kernel
        # (their resident blocks are what decides the VMEM fit at
        # T_pad=192: proc 6.3M + band 5.2M)
        wq = proc = band = None
        if not stream_feat:
            wq, proc, band = next(it), next(it), next(it)
        ga_r, gd_r = next(it), next(it)
        # with the streamed feat residual the q = atth @ wq matmul is
        # dead, so the atth stream is replaced by the feat stream
        atth_r = None if stream_feat else next(it)
        feat_r = next(it) if stream_feat else None
        (attc_p_r, decc_p_r,
         w_p_r, wcum_p_r, ddh_r, dctx_o_r, dalign_r) = \
            (next(it) for _ in range(7))
        katt_r = next(it) if dropout else None
        kdec_r = next(it) if dropout else None
        (dga_o, dgd_o, dpre_o, dctx_o, dq_o, dband_o, dv_o, dproc_o) = \
            (next(it) for _ in range(8))
        (c_dah, c_dac, c_ddh, c_ddc, c_dw, c_dwc, c_dctx,
         cat, wp_s, wc_s, acc_w, acc_wc,
         s_attc, s_decc, s_w) = (next(it) for _ in range(15))

        pid = pl.program_id(1)      # grid = (batch_tiles, T_steps)
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
            cat[:] = jnp.zeros_like(cat)
            wp_s[:] = jnp.zeros_like(wp_s)   # margins stay zero
            wc_s[:] = jnp.zeros_like(wc_s)
            # prime the single-fetch carries with the chain-start (last
            # step's) saved state; each later step's "current" value is
            # the previous iteration's prev-fetch, carried in scratch —
            # halves the attc/decc/w stream fetches (round 4)
            s_attc[:] = attc_l[:]
            s_decc[:] = decc_l[:]
            s_w[:] = w_l[:]

        # the d_v and d_band accumulators are shared across batch tiles:
        # zero them only once, at the very first grid iteration
        @pl.when(jnp.logical_and(first, pl.program_id(0) == 0))
        def _():
            dv_o[:] = jnp.zeros_like(dv_o)
            dband_o[:] = jnp.zeros_like(dband_o)

        # fp32 d_processed accumulator is a per-batch-tile block: zero it
        # at each tile's chain start
        @pl.when(first)
        def _():
            dproc_o[:] = jnp.zeros_like(dproc_o)

        # previous-step saved state; ALL-ZERO initial state at t=0
        zmask = jnp.where(last, 0.0, 1.0)
        attc_p = attc_p_r[0] * zmask
        decc_p = decc_p_r[0] * zmask
        wp_s[:, WOFF:WOFF + T] = w_p_r[0] * zmask
        wc_s[:, WOFF:WOFF + T] = wcum_p_r[0] * zmask

        # ---- decoder LSTM backward ----
        ddh_total = c_ddh[:] + ddh_r[0]
        if dropout:
            ddh_total = ddh_total * (kdec_r[0].astype(f32) * s_dec)
        dgd, ddc_prev = lstm_gates_bwd(gd_r[0].astype(f32), decc_p,
                                       s_decc[:], ddh_total, c_ddc[:], d.d)
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

        # ---- softmax backward (saved weights w_t, carried) ----
        dw_total = c_dw[:] + c_dwc[:] + dalign_r[0] + dw_from_ctx
        w_t = s_w[:]
        s = jnp.sum(w_t * dw_total, axis=1, keepdims=True)
        de = w_t * (dw_total - s)                             # (B, T)

        # ---- energies backward per tile ----
        # feat either streams in from the forward kernel (round 5: the
        # rematerialization was 11.0 ms of the 44.2 ms backward and the
        # q matmul exists only to rebuild it) or is rematerialized.
        if not stream_feat:
            q = jnp.dot(atth_r[0], wq[:], preferred_element_type=f32)
            cat[:, 2 * CS:2 * CS + d.datt] = q.astype(dtype)
        acc_w[:] = jnp.zeros_like(acc_w)
        acc_wc[:] = jnp.zeros_like(acc_wc)
        dq = jnp.zeros((B, d.datt), f32)
        for i in range(d.n_tiles):
            cat[:, 0:W] = wp_s[:, i * TT:i * TT + W].astype(dtype)
            cat[:, CS:CS + W] = wc_s[:, i * TT:i * TT + W].astype(dtype)
            if stream_feat:
                feat = feat_r[0, :, i * d.ttd:(i + 1) * d.ttd].astype(f32)
            else:
                m = jnp.dot(cat[:], band[:], preferred_element_type=f32)
                feat = jnp.tanh(
                    m + proc[:, i * d.ttd:(i + 1) * d.ttd].astype(f32))
            de_rep = jnp.dot(de[:, i * TT:(i + 1) * TT].astype(dtype),
                             rep1[:], preferred_element_type=f32)
            dfeat = de_rep * vrep[0]
            dm = dfeat * (1.0 - feat * feat)
            dv_o[0:1, :] = dv_o[0:1, :] + jnp.sum(
                feat * de_rep, axis=0, keepdims=True)
            # d_processed: EXACT fp32 in-kernel accumulation — the bf16
            # d_M stack sum it replaced was the round-3 training-quality
            # root cause (late gate, 8/11 tones) and is gone.
            dproc_o[:, i * d.ttd:(i + 1) * d.ttd] = (
                dproc_o[:, i * d.ttd:(i + 1) * d.ttd] + dm)
            dm_c = dm.astype(dtype)
            # d_band accumulation (round 4): the band matrix is shared
            # by every tile and step, so its gradient is one in-kernel
            # f32 accumulator — cat^T @ d_m per tile. The location
            # conv/dense gradients are recovered OUTSIDE from d_band via
            # the exact bilinear-fold chain rule
            # (attention_param_grads), replacing the emitted (T, B,
            # T_pad*datt) d_M stack (2.1 GB HBM at T_in=128) and the
            # conv-correlation post-pass that consumed it. Only the two
            # WINDOW slabs (cat[:, :2*CS]) accumulate: the query-selector
            # rows' gradient is structurally discarded outside, and
            # dropping them shrinks the accumulator 12.6 -> 8.4 MB —
            # the margin that lets the fp32 d_processed accumulator fit
            # the 192-symbol bucket at B=128.
            dband_o[:] = dband_o[:] + jax.lax.dot_general(
                cat[:, 0:2 * CS], dm_c, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dcat = jnp.dot(dm_c, bandt[:], preferred_element_type=f32)
            acc_w[:, i * TT:i * TT + W] = (
                acc_w[:, i * TT:i * TT + W] + dcat[:, 0:W])
            acc_wc[:, i * TT:i * TT + W] = (
                acc_wc[:, i * TT:i * TT + W] + dcat[:, CS:CS + W])
            dq = dq + dcat[:, 2 * CS:2 * CS + d.datt]
        dq_o[0] = dq
        dah_attn = jnp.dot(dq.astype(dtype), wqt[:],
                           preferred_element_type=f32)

        # ---- attention LSTM backward ----
        dah_total = c_dah[:] + dxd[:, 0:d.a] + dah_attn
        if dropout:
            dah_total = dah_total * (katt_r[0].astype(f32) * s_att)
        dga, dac_prev = lstm_gates_bwd(ga_r[0].astype(f32), attc_p,
                                       s_attc[:], dah_total, c_dac[:], d.a)
        dga_c = dga.astype(dtype)
        dxa = jnp.dot(dga_c, wta[:], preferred_element_type=f32)

        # ---- emits + carry update ----
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
        # this step's prev-fetches become the next (earlier) step's
        # current values — RAW, not zmasked (unused past the last step)
        s_attc[:] = attc_p_r[0]
        s_decc[:] = decc_p_r[0]
        s_w[:] = w_p_r[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "dropout", "p_att",
                                             "p_dec", "interpret",
                                             "stream_feat"))
def _bwd_scan_call(wta, wtd, wq, wqt, band, bandt, rep1, vrep, proc_flat,
                   mem_flat, ga, gd, atth, attc, decc, w, wcum_p,
                   ddh, dctx_out, dalign, katt, kdec, feat=None,
                   dims: ScanDims = None, dropout: bool = False,
                   p_att: float = 0.0, p_dec: float = 0.0,
                   interpret: bool = False, stream_feat: bool = False):
    d = dims
    T_steps, B, _ = ga.shape
    Bt = B if B <= 128 else 128   # batch tile rows (uniform tiles)
    nb = B // Bt
    dtype = jnp.bfloat16
    f32 = jnp.float32
    # The fp32 in-kernel d_processed accumulator is MANDATORY: the bf16
    # d_M post-pass sum it once fell back to was root-caused as the
    # round-3 training-quality drift and removed. bwd_supported() gates
    # on the same trace-time (Bt, t_pad) via _fp32_dproc_fits, so this
    # raise is only reachable by calling backward_chain directly with an
    # off-envelope shape.
    if not _fp32_dproc_fits(d, B):
        raise ValueError(
            f"backward kernel requires the fp32 d_processed accumulator: "
            f"trace-time batch tile {Bt} x t_pad {d.t_pad} exceeds "
            f"{_FP32_DPROC_CAP}; use the XLA custom-VJP backward for "
            f"this shape (decoder_vjp gates on bwd_supported)")
    kern = _make_bwd_kernel(d, Bt, T_steps, dropout, p_att, p_dec, dtype,
                            stream_feat=stream_feat)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    bconst = lambda shape: pl.BlockSpec(
        (Bt,) + shape[1:], lambda b, t: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)

    def rev(shape):
        return pl.BlockSpec((1, Bt) + shape[1:],
                            lambda b, t: (T_steps - 1 - t, b, 0),
                            memory_space=pltpu.VMEM)

    def rev_prev(shape):
        def imap(b, t):
            idx = T_steps - 2 - t
            return (idx * (idx >= 0), b, 0)
        return pl.BlockSpec((1, Bt) + shape[1:], imap,
                            memory_space=pltpu.VMEM)

    # chain-start (step T_steps-1) values prime the single-fetch carry
    # scratches; attc/decc/w then stream ONCE per step (the t-1 prev
    # fetch) instead of twice — round 4, exactness-preserving
    attc_last, decc_last, w_last = attc[-1], decc[-1], w[-1]
    if stream_feat:
        # feat (from the forward kernel) replaces the atth stream: the
        # only consumer of atth in-kernel was the q = atth @ wq matmul
        # that rebuilt feat; wq and proc (feat's other ingredients) are
        # dropped entirely — proc's resident block is what decides the
        # VMEM fit at T_pad=192 (round 5)
        maybe_wq_proc = [], []
        third = [rev((B, d.t_pad * d.datt))], [feat.astype(dtype)]
    else:
        maybe_wq_proc = ([const(wq.shape), bconst(proc_flat.shape),
                          const(band.shape)],
                         [wq, proc_flat, band])
        third = [rev((B, d.a))], [atth]
    in_specs = [const(x.shape) for x in
                (wta, wtd, wqt, bandt, rep1, vrep)]
    in_specs += [bconst(mem_flat.shape), bconst(attc_last.shape),
                 bconst(decc_last.shape), bconst(w_last.shape)]
    in_specs += maybe_wq_proc[0]
    in_specs += [rev((B, 4 * d.a)), rev((B, 4 * d.d))] + third[0] + \
                [rev_prev((B, d.a)), rev_prev((B, d.d)),
                 rev_prev((B, d.t_pad)), rev((B, d.t_pad)),
                 rev((B, d.d)), rev((B, d.e)), rev((B, d.t_pad))]
    inputs = [wta, wtd, wqt, bandt, rep1, vrep,
              mem_flat, attc_last, decc_last, w_last] \
        + maybe_wq_proc[1] \
        + [ga, gd] + third[1] + [attc, decc, w,
                                 wcum_p, ddh, dctx_out, dalign]
    if dropout:
        in_specs += [rev((B, d.a)), rev((B, d.d))]
        inputs += [katt, kdec]

    outs = [
        jax.ShapeDtypeStruct((T_steps, B, 4 * d.a), dtype),    # dga
        jax.ShapeDtypeStruct((T_steps, B, 4 * d.d), dtype),    # dgd
        jax.ShapeDtypeStruct((T_steps, B, d.p), f32),          # d_prenet
        jax.ShapeDtypeStruct((T_steps, B, d.e), dtype),        # d_ctx
        jax.ShapeDtypeStruct((T_steps, B, d.datt), f32),       # d_q
        jax.ShapeDtypeStruct((2 * CS, d.ttd), f32),           # d_band
        jax.ShapeDtypeStruct((8, d.ttd), f32),                 # d_v acc
        jax.ShapeDtypeStruct((B, d.t_pad * d.datt), f32),      # d_proc
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
        pltpu.VMEM((Bt, d.t_pad + 2 * WOFF), f32),
        pltpu.VMEM((Bt, d.t_pad + 2 * WOFF), f32),
        pltpu.VMEM((Bt, d.t_pad + 2 * WOFF), f32),
        pltpu.VMEM((Bt, d.t_pad + 2 * WOFF), f32),
        pltpu.VMEM((Bt, d.a), f32),      # s_attc carry
        pltpu.VMEM((Bt, d.d), f32),      # s_decc carry
        pltpu.VMEM((Bt, d.t_pad), f32),  # s_w carry
    ]
    return pl.pallas_call(
        kern,
        grid=(nb, T_steps),
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
                   interpret: Optional[bool] = None, keep=None,
                   feat=None):
    """Run the fused backward chain. ``res`` is the _Residuals tuple of
    time-major stacks from the forward. Cotangents are (T, B, ...)
    time-major. Returns (dga_stack, dgd_stack, d_prenet, dctx_stack,
    d_processed, d_attp) where d_attp is the attention parameter gradient
    subtree — everything decoder_vjp.bwd needs beyond its own hoisted
    LSTM einsums.
    """
    dims = scan_dims(cfg, memory.shape[1])
    if interpret is None:
        interpret = cfg.pallas_interpret
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    (ga, gd, att_h, dec_h, att_c, dec_c, ctx, w) = res
    T_steps, B, _ = ga.shape
    t_in = memory.shape[1]
    T = dims.t_pad
    dtype = jnp.bfloat16
    f32 = jnp.float32

    wta, wtd, wq, wqt, band, bandt, rep1, vrep = pack_bwd_weights(
        core_params, dims, dtype)
    mem_flat, proc_flat, _ = pack_batch(memory, processed, mask, dims,
                                        dtype)
    padT = ((0, 0), (0, 0), (0, T - t_in))
    w_pad = jnp.pad(w, padT).astype(f32)
    wcum_prev = jnp.cumsum(w_pad, axis=0) - w_pad   # exclusive prefix
    dalign = jnp.pad(d_align_out.astype(f32), padT)

    if not dropout_active:
        katt = kdec = jnp.zeros((1,), f32)
    elif keep is not None:
        katt, kdec = keep  # threaded from the forward (no re-derivation)
    else:
        katt, kdec = keep_masks(scan_rng, T_steps, B, dims,
                                cfg.p_attention_dropout,
                                cfg.p_decoder_dropout)

    outs = _bwd_scan_call(
        wta, wtd, wq, wqt, band, bandt, rep1, vrep, proc_flat, mem_flat,
        ga.astype(dtype), gd.astype(dtype), att_h.astype(dtype),
        att_c.astype(f32), dec_c.astype(f32), w_pad, wcum_prev,
        d_dec_h_out.astype(f32), d_ctx_out.astype(f32), dalign,
        katt, kdec, feat=feat, dims=dims, dropout=dropout_active,
        p_att=cfg.p_attention_dropout, p_dec=cfg.p_decoder_dropout,
        interpret=interpret, stream_feat=feat is not None)
    (dga_st, dgd_st, dpre_st, dctx_st, dq_st, dband_acc, dv_acc,
     dproc_acc) = outs

    d_attp = attention_param_grads(
        core_params, dims, att_h, dq_st, dband_acc, dv_acc)
    d_processed = dproc_acc.reshape(B, T, dims.datt)[:, :t_in].astype(
        processed.dtype)
    return dga_st, dgd_st, dpre_st, dctx_st, d_processed, d_attp


def attention_param_grads(core_params, dims: ScanDims, att_h_stack,
                          dq_st, dband_acc, dv_acc):
    """Hoisted attention parameter gradients (round 4: from the
    in-kernel d_band accumulator — no d_M stack).

    d_Wq from (att_h, d_q); d_v from the in-kernel accumulator; the
    location conv/dense gradients from d_band via the EXACT
    bilinear-fold chain rule: the forward consumes (location_conv,
    location_dense) only through K2 = conv ∘ dense folded into the band
    matrix (pack_weights), so d_K2 contracts d_band's window slabs with
    the constant placement tensor Ew, then
    d_ck = d_K2 : ld and d_ld = ck : d_K2. This replaced the emitted
    (T_steps, B, T_pad*datt) d_M stack (2.1 GB HBM at T_in=128) and the
    chunked conv-correlation post-pass that consumed it — the post-pass
    alone cost more wall-clock than the whole backward kernel
    (BENCH_DETAILS round4_bwd_breakdown). (d_processed still comes from
    the backward kernel's exact fp32 in-kernel accumulator — the
    round-3 quality finding.)
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    att = core_params["attention"]
    ck = att["location_conv"]["kernel"]          # (ks, 2, F)
    ld = att["location_dense"]["kernel"]         # (F, datt)

    dWq = jnp.einsum("tbh,tbq->hq", att_h_stack.astype(bf16),
                     dq_st.astype(bf16), preferred_element_type=f32)
    # dv_acc row 0 holds sum_{t_step,b,tile} feat * de_rep flattened
    # (TT, datt) t-major; summing the tile positions gives d_v
    d_v = jnp.sum(dv_acc[0].reshape(TT, dims.datt), axis=0)[:, None]

    Ew, _, _ = _band_constants(dims)             # (ks, w_win, TT)
    W = dims.w_win
    d_K2 = []
    for c in range(2):
        d_b3 = jax.lax.dynamic_slice(
            dband_acc, (c * CS, 0), (W, dims.ttd)).reshape(
                W, TT, dims.datt)
        d_K2.append(jnp.einsum("kjt,jtd->kd", Ew, d_b3,
                               preferred_element_type=f32))
    d_K2 = jnp.stack(d_K2, axis=1)               # (ks, 2, datt)
    d_ck = jnp.einsum("kcD,fD->kcf", d_K2, ld.astype(f32),
                      preferred_element_type=f32)
    d_ld = jnp.einsum("kcf,kcD->fD", ck.astype(f32), d_K2,
                      preferred_element_type=f32)

    return {
        "query": {"kernel": dWq},
        "v": {"kernel": d_v},
        "location_conv": {"kernel": d_ck},
        "location_dense": {"kernel": d_ld},
    }
