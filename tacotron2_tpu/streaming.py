"""Streaming (chunked) synthesis — low-latency text->audio.

No reference equivalent (the reference's inference path, model.py:435-449 +
inference.ipynb, produces the whole utterance before any audio exists).
Here the autoregressive decoder runs in fixed-size chunks
(``tacotron2.decode_chunk``), and the postnet + neural vocoder run over
sliding windows with enough context margin that every emitted frame/sample
is EXACTLY what the offline pipeline would produce:

- postnet (5x conv k=5, zero 'SAME' padding): frame t depends on raw mel
  [t-P, t+P] with P = n_convs * (k-1)/2 (10 for the default config);
- HiFi-GAN generator: sample t depends on postnet mel
  [t/hop - M, t/hop + M] with M = ``hifigan.receptive_field_frames``
  (15 for V1).

A chunk of C = chunk_steps * n_frames_per_step frames is emitted once its
full context window exists. Windows are CLAMPED inside the offline buffer
[0, T_buf = max_steps * r): stacked SAME-padded convs re-pad each layer's
own input, so a zero-filled out-of-range window would compute different
edge intermediates (conv bias / batchnorm make zero a non-fixed-point)
than the offline full-buffer pass. A clamped window's edge is either the
true buffer edge — where its SAME padding coincides with the offline
padding exactly — or an interior point at least one receptive field away
from every emitted frame, so emitted frames are bit-identical either way.
Frames past a row's gate-stop are zero in the buffer, exactly as the
offline decode loop leaves them (finished rows emit masked zeros).

Every jitted piece has a static shape (one compile per text bucket for the
encoder/decoder-chunk, one total for postnet/vocoder windows), so the hot
path never recompiles.

Latency: first audio after ~2-3 decode chunks (C + M frames of lookahead),
i.e. tens of milliseconds of device time for C=32 — vs the full-utterance
decode (hundreds of steps) the offline path needs.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data.bucketing import text_bucket
from tacotron2_tpu.models import tacotron2
from tacotron2_tpu.ops.layers import dense, length_mask
from tacotron2_tpu.text import text_to_sequence


class StreamEvent(NamedTuple):
    """One incremental emission. ``mel`` events carry postnet mel frames;
    ``audio`` events carry the vocoded samples for earlier frames (the
    vocoder lags the postnet by its context margin)."""
    mel: Optional[np.ndarray]     # (n, n_mel_channels) or None
    audio: Optional[np.ndarray]   # (n * hop_length,) or None
    mel_offset: int               # frame index of mel[0] / audio's frames
    done: bool                    # True on the final event of the stream


def postnet_margin_frames(cfg: Tacotron2Config) -> int:
    """One-sided postnet receptive field in frames: n convs of kernel k
    with zero 'SAME' padding stack to n*(k-1)/2."""
    return cfg.postnet_n_convolutions * (cfg.postnet_kernel_size - 1) // 2


def _clamp_window(want_start: int, width: int, t_buf: int) -> int:
    """Start of a ``width``-frame window fully inside [0, t_buf)."""
    return min(max(want_start, 0), t_buf - width)


class StreamingSynthesizer:
    """Chunked low-latency synthesis for one utterance at a time.

    Usage:
        s = StreamingSynthesizer(params, stats, cfg,
                                 vocoder_params=gp, vocoder_cfg=hg_cfg)
        for event in s.stream("Hello world."):
            if event.audio is not None:
                playback.write(event.audio)

    ``vocoder_params=None`` streams postnet mel frames only.
    """

    def __init__(self, params, stats, config: Tacotron2Config, *,
                 vocoder_params=None, vocoder_cfg=None,
                 chunk_steps: int = 32, max_steps: Optional[int] = None,
                 deterministic: bool = True,
                 fused: Optional[bool] = None):
        # pin to device once (host pytrees re-upload on every jitted call)
        self.params = jax.tree.map(jnp.asarray, params)
        self.stats = jax.tree.map(jnp.asarray, stats)
        self.config = (config.replace(prenet_dropout_at_inference=False)
                       if deterministic else config)
        self.chunk_steps = chunk_steps
        self.max_steps = max_steps or config.max_decoder_steps
        self.vocoder_params = (jax.tree.map(jnp.asarray, vocoder_params)
                               if vocoder_params is not None else None)
        if vocoder_params is not None and vocoder_cfg is None:
            from tacotron2_tpu.models import hifigan
            vocoder_cfg = hifigan.HiFiGANConfig(
                n_mel_channels=config.n_mel_channels)
        self.vocoder_cfg = vocoder_cfg

        cfg = self.config
        self.C = chunk_steps * cfg.n_frames_per_step  # emission quantum
        self.P = postnet_margin_frames(cfg)
        if vocoder_cfg is not None:
            from tacotron2_tpu.models import hifigan
            self.M = hifigan.receptive_field_frames(vocoder_cfg)
        else:
            self.M = 0
        # offline buffer extent and static (clamped) window widths
        self.T_buf = self.max_steps * cfg.n_frames_per_step
        self.Wp = min(self.C + 2 * self.P, self.T_buf)
        self.Wv = min(self.C + 2 * self.M, self.T_buf)

        # Fused Pallas decoder chunk (kernels/decoder_step.py): one kernel
        # per chunk, weights VMEM-resident — ~5x the XLA chunk at B=1
        # (PERFORMANCE.md). Prenet dropout (the reference's model.py:99
        # inference default) streams keep masks into the kernel with the
        # exact offline key derivation, so fused streaming honors it
        # (round 4; round 3 had to fall back to the XLA chunks). Only
        # int8-quantized params keep the XLA path (the fused packer
        # consumes the unquantized layout). Auto-on when eligible.
        quantized = "w_q" in params["decoder"]["attention_rnn"]
        if fused is None:
            fused = not quantized
        if fused and quantized:
            raise ValueError("fused streaming needs unquantized params")
        self._fused = fused
        self._packed = None
        if fused:
            from tacotron2_tpu.kernels import decoder_step as fused_kernel
            self._fused_kernel = fused_kernel
            self._packed = fused_kernel.pack_decoder_params(
                params, self.config,
                dtype=self.config.jax_compute_dtype or jnp.float32)

        self._encode_jit = {}  # text bucket -> fn
        self._chunk_jit = {}
        self._batch_chunk_jit = {}  # (bucket, B) -> fn
        self._packed_batch = None   # lazy (kernels/decoder_batch.py layout)
        self._postnet_fn = None
        self._vocoder_fn = None

    # ------------------------------------------------------ jitted pieces

    def _encode(self, t_text: int):
        if t_text not in self._encode_jit:
            cfg = self.config

            def run(params, stats, text, lengths):
                memory, _ = tacotron2.encode(
                    params, stats, text, lengths, cfg, training=False,
                    rng=None, compute_dtype=cfg.jax_compute_dtype)
                processed = dense(params["decoder"]["attention"]["memory"],
                                  memory, compute_dtype=cfg.jax_compute_dtype)
                carry = tacotron2.init_stream_carry(memory, cfg)
                return memory, processed, carry

            jitted = jax.jit(run)
            self._encode_jit[t_text] = (
                lambda text, lengths: jitted(self.params, self.stats,
                                             text, lengths))
        return self._encode_jit[t_text]

    def _chunk(self, t_text: int):
        if t_text not in self._chunk_jit:
            cfg = self.config
            K = self.chunk_steps

            if self._fused:
                fk = self._fused_kernel
                interp = jax.default_backend() == "cpu"

                def run_fused(packed, carry, memory, processed, lengths,
                              rng):
                    mask = length_mask(lengths, memory.shape[1])
                    return fk.decode_chunk_fused(
                        packed, carry, memory, processed, mask, cfg,
                        chunk_steps=K,
                        dtype=cfg.jax_compute_dtype or jnp.float32,
                        interpret=interp, rng=rng)

                jitted = jax.jit(run_fused)
                # decode_chunk nulls rng itself when the config disables
                # inference dropout; mirror that for the fused kernel
                drop_ok = cfg.prenet_dropout_at_inference
                self._chunk_jit[t_text] = (
                    lambda carry, memory, processed, lengths, rng=None:
                    jitted(self._packed, carry, memory, processed, lengths,
                           rng if drop_ok else None))
                return self._chunk_jit[t_text]

            def run(params, carry, memory, processed, lengths, rng):
                mask = length_mask(lengths, memory.shape[1])
                return tacotron2.decode_chunk(
                    params, carry, memory, processed, mask, cfg,
                    chunk_steps=K, rng=rng,
                    compute_dtype=cfg.jax_compute_dtype)

            jitted = jax.jit(run, static_argnames=())
            self._chunk_jit[t_text] = (
                lambda carry, memory, processed, lengths, rng=None:
                jitted(self.params, carry, memory, processed, lengths, rng))
        return self._chunk_jit[t_text]

    def _batch_chunk(self, t_text: int, b: int):
        """Chunk fn for B concurrent sessions: the genuinely batched
        fused kernel (kernels/decoder_batch.py) when the config/shape is
        in its envelope, else the (already batched) XLA decode_chunk."""
        key = (t_text, b)
        if key not in self._batch_chunk_jit:
            cfg = self.config
            K = self.chunk_steps
            from tacotron2_tpu.kernels import decoder_batch as db
            use_kernel = self._fused and db.batch_supported(cfg, t_text, b)
            drop_ok = cfg.prenet_dropout_at_inference

            if use_kernel:
                if self._packed_batch is None:
                    self._packed_batch = db.pack_batch_decoder_params(
                        self.params, cfg,
                        dtype=cfg.jax_compute_dtype or jnp.float32)
                interp = jax.default_backend() == "cpu"

                def run_b(packed, carry, memory, processed, lengths, rng):
                    mask = length_mask(lengths, memory.shape[1])
                    return db.decode_chunk_batch(
                        packed, carry, memory, processed, mask, cfg,
                        chunk_steps=K,
                        dtype=cfg.jax_compute_dtype or jnp.bfloat16,
                        interpret=interp, rng=rng)

                jitted = jax.jit(run_b)
                self._batch_chunk_jit[key] = (
                    lambda carry, memory, processed, lengths, rng=None:
                    jitted(self._packed_batch, carry, memory, processed,
                           lengths, rng if drop_ok else None))
            else:
                def run(params, carry, memory, processed, lengths, rng):
                    mask = length_mask(lengths, memory.shape[1])
                    return tacotron2.decode_chunk(
                        params, carry, memory, processed, mask, cfg,
                        chunk_steps=K, rng=rng,
                        compute_dtype=cfg.jax_compute_dtype)

                jitted = jax.jit(run)
                self._batch_chunk_jit[key] = (
                    lambda carry, memory, processed, lengths, rng=None:
                    jitted(self.params, carry, memory, processed, lengths,
                           rng))
        return self._batch_chunk_jit[key]

    def _postnet(self):
        if self._postnet_fn is None:
            cfg = self.config

            def run(params, stats, mel):
                residual, _ = tacotron2.postnet_apply(
                    params, stats, mel, cfg, training=False, rng=None,
                    compute_dtype=cfg.jax_compute_dtype)
                return mel + residual

            jitted = jax.jit(run)
            self._postnet_fn = lambda mel: jitted(self.params, self.stats,
                                                  mel)
        return self._postnet_fn

    def _vocoder(self):
        if self._vocoder_fn is None:
            from tacotron2_tpu.models import hifigan
            vcfg = self.vocoder_cfg
            jitted = jax.jit(
                lambda p, mel: hifigan.generator(p, mel, vcfg))
            self._vocoder_fn = lambda mel: jitted(self.vocoder_params, mel)
        return self._vocoder_fn

    # -------------------------------------------------------------- API

    def stream(self, text: str,
               rng: Optional[jax.Array] = None) -> Iterator[StreamEvent]:
        """Yield StreamEvents for one utterance. With the same ``rng`` the
        concatenated outputs equal the offline ``tacotron2.infer`` +
        ``hifigan.generator`` pipeline exactly (tests/test_streaming.py)."""
        cfg = self.config
        r = cfg.n_frames_per_step
        n_mels = cfg.n_mel_channels
        C, P, M = self.C, self.P, self.M
        T_buf, Wp, Wv = self.T_buf, self.Wp, self.Wv
        # samples per mel frame = the vocoder's total upsampling factor
        hop = (self.vocoder_cfg.hop_length if self.vocoder_cfg is not None
               else cfg.hop_length)

        ids = text_to_sequence(text, cfg.text_cleaners)
        bucket = text_bucket(len(ids), cfg.text_buckets)
        text_arr = np.zeros((1, bucket), np.int32)
        text_arr[0, :len(ids)] = ids[:bucket]
        lengths = jnp.asarray([min(len(ids), bucket)], jnp.int32)

        pre_rng = None
        if rng is not None:
            _, pre_rng = jax.random.split(rng)  # mirror tacotron2.infer

        memory, processed, carry = self._encode(bucket)(
            jnp.asarray(text_arr), lengths)

        n_chunks = -(-self.max_steps // self.chunk_steps)
        cap_frames = n_chunks * C
        raw = np.zeros((cap_frames, n_mels), np.float32)
        post = np.zeros((cap_frames, n_mels), np.float32)

        n_avail = 0           # raw decoder frames produced
        n_total: Optional[int] = None  # final frame count (known when done)
        e = 0                 # postnet frames emitted
        v = 0                 # vocoded frames emitted
        decoding = True
        chunk_fn = self._chunk(bucket)
        postnet_fn = self._postnet()
        vocode = self.vocoder_params is not None

        def finished_all() -> bool:
            return (n_total is not None and e >= n_total
                    and (not vocode or v >= n_total))

        while True:
            if decoding:
                carry, (mel, _, _) = chunk_fn(carry, memory, processed,
                                              lengths, pre_rng)
                raw[n_avail:n_avail + C] = np.asarray(mel[0])
                n_avail += C
                if bool(np.asarray(carry.finished)[0]) or \
                        n_avail >= self.max_steps * r:
                    decoding = False
                    # clamp to the offline cap (chunks may overshoot when
                    # max_steps is not a multiple of chunk_steps)
                    n_total = min(int(np.asarray(carry.lengths)[0]),
                                  self.max_steps) * r
                    # frames past the cap exist in the buffer when the gate
                    # never fired; offline they'd be zero 'SAME' padding
                    raw[n_total:] = 0.0

            # postnet: emit frames [e, e+C) once raw context through
            # min(T_buf, e+C+P) exists (done => trailing zeros are final)
            while (e + C + P <= n_avail) or (n_total is not None
                                             and e < n_total):
                s = _clamp_window(e - P, Wp, T_buf)
                out = np.asarray(
                    postnet_fn(jnp.asarray(raw[None, s:s + Wp])))[0]
                n_emit = C if n_total is None else min(C, n_total - e)
                post[e:e + n_emit] = out[e - s:e - s + n_emit]
                ev_mel = post[e:e + n_emit].copy()
                e += n_emit
                yield StreamEvent(mel=ev_mel, audio=None,
                                  mel_offset=e - n_emit,
                                  done=finished_all())
                if n_total is not None and e >= n_total:
                    break

            # vocoder: emit frames [v, v+C) once postnet context through
            # min(T_buf, v+C+M) exists
            while vocode and (
                    (v + C + M <= e) or
                    (n_total is not None and e >= n_total and v < n_total)):
                s = _clamp_window(v - M, Wv, T_buf)
                audio = np.asarray(
                    self._vocoder()(jnp.asarray(post[None, s:s + Wv])))
                n_emit = C if n_total is None else min(C, n_total - v)
                samples = audio[0, (v - s) * hop:(v - s + n_emit) * hop]
                samples = samples.copy()
                v += n_emit
                yield StreamEvent(mel=None, audio=samples,
                                  mel_offset=v - n_emit,
                                  done=finished_all())
                if n_total is not None and v >= n_total:
                    break

            if finished_all():
                return

    def stream_batch(self, texts,
                     rng: Optional[jax.Array] = None
                     ) -> Iterator[tuple]:
        """Stream up to 8 concurrent utterances in lockstep; yields
        ``(row, StreamEvent)`` pairs. Decoding runs through the batched
        fused decoder kernel (kernels/decoder_batch.py) when eligible,
        and postnet/vocoder windows run batched over the rows; each
        row's emitted frames/samples equal its offline pipeline output
        exactly (same clamped-window argument as ``stream``). Rows that
        gate-latch early stop emitting but ride the batch until every
        row finishes (inherent to lockstep batching)."""
        cfg = self.config
        B = len(texts)
        if not 1 <= B <= 8:
            raise ValueError("stream_batch covers 1..8 sessions")
        r = cfg.n_frames_per_step
        n_mels = cfg.n_mel_channels
        C, P, M = self.C, self.P, self.M
        T_buf, Wp, Wv = self.T_buf, self.Wp, self.Wv
        hop = (self.vocoder_cfg.hop_length if self.vocoder_cfg is not None
               else cfg.hop_length)

        ids_list = [text_to_sequence(t, cfg.text_cleaners) for t in texts]
        bucket = max(text_bucket(len(i), cfg.text_buckets)
                     for i in ids_list)
        text_arr = np.zeros((B, bucket), np.int32)
        for i, ids in enumerate(ids_list):
            text_arr[i, :len(ids)] = ids[:bucket]
        lengths = jnp.asarray([min(len(i), bucket) for i in ids_list],
                              jnp.int32)

        pre_rng = None
        if rng is not None:
            _, pre_rng = jax.random.split(rng)  # mirror tacotron2.infer

        memory, processed, carry = self._encode(bucket)(
            jnp.asarray(text_arr), lengths)

        n_chunks = -(-self.max_steps // self.chunk_steps)
        cap_frames = n_chunks * C
        raw = np.zeros((B, cap_frames, n_mels), np.float32)
        post = np.zeros((B, cap_frames, n_mels), np.float32)

        n_avail = 0
        # per-row final frame count; CAP_UNKNOWN until the row's gate
        # latches (or the step cap ends decoding for everyone)
        UNKNOWN = np.iinfo(np.int64).max
        limit = np.full((B,), UNKNOWN, np.int64)
        e = v = 0             # frames emitted (lockstep counters)
        decoding = True
        chunk_fn = self._batch_chunk(bucket, B)
        postnet_fn = self._postnet()
        vocode = self.vocoder_params is not None

        def all_known() -> bool:
            return bool((limit != UNKNOWN).all())

        def finished_all() -> bool:
            return (all_known() and e >= limit.max()
                    and (not vocode or v >= limit.max()))

        while True:
            if decoding:
                carry, (mel, _, _) = chunk_fn(carry, memory, processed,
                                              lengths, pre_rng)
                raw[:, n_avail:n_avail + C] = np.asarray(mel)
                n_avail += C
                fin = np.asarray(carry.finished)
                lens = np.asarray(carry.lengths).astype(np.int64)
                limit = np.where(fin,
                                 np.minimum(lens, self.max_steps) * r,
                                 limit)
                if bool(fin.all()) or n_avail >= self.max_steps * r:
                    decoding = False
                    limit = np.minimum(lens, self.max_steps) * r
                    for b in range(B):
                        # gate-never-fired rows: frames past the cap are
                        # zero 'SAME' padding offline
                        raw[b, limit[b]:] = 0.0

            while (e + C + P <= n_avail) or (not decoding
                                             and e < limit.max()):
                s = _clamp_window(e - P, Wp, T_buf)
                out = np.asarray(
                    postnet_fn(jnp.asarray(raw[:, s:s + Wp])))
                for b in range(B):
                    n_emit = int(min(C, max(limit[b] - e, 0),
                                     cap_frames - e))
                    if n_emit <= 0:
                        continue
                    post[b, e:e + n_emit] = out[b, e - s:e - s + n_emit]
                    done_b = (limit[b] != UNKNOWN
                              and e + n_emit >= limit[b]
                              and not vocode)
                    yield b, StreamEvent(
                        mel=post[b, e:e + n_emit].copy(), audio=None,
                        mel_offset=e, done=done_b)
                e += C
                if not decoding and e >= limit.max():
                    break

            while vocode and (
                    (v + C + M <= e) or
                    (not decoding and e >= limit.max()
                     and v < limit.max())):
                s = _clamp_window(v - M, Wv, T_buf)
                audio = np.asarray(
                    self._vocoder()(jnp.asarray(post[:, s:s + Wv])))
                for b in range(B):
                    n_emit = int(min(C, max(limit[b] - v, 0),
                                     cap_frames - v))
                    if n_emit <= 0:
                        continue
                    samples = audio[b, (v - s) * hop:
                                    (v - s + n_emit) * hop].copy()
                    done_b = (limit[b] != UNKNOWN
                              and v + n_emit >= limit[b])
                    yield b, StreamEvent(mel=None, audio=samples,
                                         mel_offset=v, done=done_b)
                v += C
                if not decoding and v >= limit.max():
                    break

            if finished_all():
                return
