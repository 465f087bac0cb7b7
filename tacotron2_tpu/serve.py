"""Batched TTS serving.

Production-facing piece with no reference equivalent (the reference's
inference path is a B=1 notebook): a micro-batching synthesizer that
coalesces concurrent requests into fixed-shape batches (one jit compilation
per text bucket), runs them through the batched gate-latched decoder, and
resolves per-request futures. Padding rows make every batch the same shape,
so the hot path never recompiles.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data.bucketing import text_bucket
from tacotron2_tpu.models import tacotron2
from tacotron2_tpu.text import text_to_sequence


class BatchingSynthesizer:
    """Submit texts from any thread; batches run on the device worker.

    Usage:
        synth = BatchingSynthesizer(params, stats, cfg, max_batch=8)
        future = synth.submit("Hello world.")
        mel, alignment, n_frames = future.result()
        synth.close()
    """

    def __init__(self, params, stats, config: Tacotron2Config,
                 max_batch: int = 8, max_wait_ms: float = 5.0,
                 max_steps: Optional[int] = None,
                 deterministic: bool = True,
                 use_fused_kernel: bool = True):
        # pin to device once: host-side (numpy) pytrees passed to a jitted
        # function re-upload on EVERY call — catastrophic over a tunneled
        # device link
        self.params = jax.tree.map(jnp.asarray, params)
        self.stats = jax.tree.map(jnp.asarray, stats)
        self.config = (config.replace(prenet_dropout_at_inference=False)
                       if deterministic else config)
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.max_steps = max_steps or config.max_decoder_steps
        # batched fused Pallas decoder (kernels/decoder_batch.py): all
        # decoder weights VMEM-resident across the whole decode — 2.1x
        # the XLA batched path at B=8 (PERFORMANCE.md round 3). Engaged
        # per bucket when the envelope fits (batch <= 32, dims %128 —
        # round 5 extended the kernel from one 8-row sublane tile to 4);
        # off-envelope buckets keep the XLA path.
        self._packed = None
        if use_fused_kernel and max_batch <= 32:
            from tacotron2_tpu.kernels import decoder_batch as db
            # int8-quantized LSTM cells (quantize_for_serving) use a
            # {w_q, scale, bias} tree the fused packer cannot consume —
            # those params keep the XLA path (which dispatches on the
            # quantized keys)
            plain_lstms = all(
                "wi" in self.params["decoder"][k]
                for k in ("attention_rnn", "decoder_rnn"))
            # pack once if ANY bucket is eligible (the packed layout is
            # T_in-independent); _infer_fn re-checks batch_supported per
            # bucket, so an oversized bucket (t_pad > 512) falls back to
            # the XLA path without disabling the kernel elsewhere
            if plain_lstms and any(
                    db.batch_supported(self.config, t, max_batch)
                    for t in self.config.text_buckets):
                kdtype = self.config.jax_compute_dtype or jnp.float32
                self._packed = db.pack_batch_decoder_params(
                    self.params, self.config, dtype=kdtype)
        self._queue: "queue.Queue" = queue.Queue()
        self._jitted = {}
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- API

    def submit(self, text: str) -> Future:
        if self._closed:
            raise RuntimeError("synthesizer is closed")
        ids = np.asarray(text_to_sequence(text, self.config.text_cleaners),
                         np.int32)
        future: Future = Future()
        self._queue.put((ids, future))
        return future

    def synthesize(self, texts: Sequence[str]) -> List:
        return [f.result() for f in [self.submit(t) for t in texts]]

    def close(self) -> None:
        self._closed = True
        self._queue.put(None)
        self._worker.join()

    # ---------------------------------------------------------- worker

    def _infer_fn(self, t_text: int):
        """One jitted inference per text-bucket length. Params are jit
        ARGUMENTS (closures would bake them into the program as literals —
        huge compile payloads for big models)."""
        if t_text not in self._jitted:
            cfg = self.config
            packed = self._packed
            if packed is not None:
                from tacotron2_tpu.kernels import decoder_batch as db
                if not db.batch_supported(cfg, t_text, self.max_batch):
                    packed = None  # this bucket exceeds the envelope

            def run(params, stats, packed, text, lengths):
                if packed is not None:  # static: bound at trace time
                    res = tacotron2.infer_batch_fused(
                        params, stats, text, lengths, cfg, packed=packed,
                        max_steps=self.max_steps,
                        compute_dtype=cfg.jax_compute_dtype)
                else:
                    res = tacotron2.infer(
                        params, stats, text, lengths, cfg,
                        max_steps=self.max_steps,
                        compute_dtype=cfg.jax_compute_dtype)
                return res.mel_postnet, res.alignments, res.mel_lengths

            # packed=None is an empty pytree, so the branch resolves at
            # trace time under one jit wrapper for both paths
            jitted = jax.jit(run)
            self._jitted[t_text] = (
                lambda text, lengths: jitted(self.params, self.stats,
                                             packed, text, lengths))
        return self._jitted[t_text]

    def _collect(self):
        """Pull up to max_batch requests, waiting max_wait_ms after the
        first one arrives."""
        first = self._queue.get()
        if first is None:
            return None
        items = [first]
        while len(items) < self.max_batch:
            try:
                item = self._queue.get(timeout=self.max_wait_ms / 1000.0)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-post the shutdown signal
                break
            items.append(item)
        return items

    def _run(self) -> None:
        buckets = self.config.text_buckets
        while True:
            items = self._collect()
            if items is None:
                return
            try:
                max_len = max(len(ids) for ids, _ in items)
                t_text = text_bucket(max_len, buckets)
                B = self.max_batch  # fixed batch shape: pad with repeats
                text = np.zeros((B, t_text), np.int32)
                lengths = np.ones((B,), np.int32)
                for i, (ids, _) in enumerate(items):
                    n = min(len(ids), t_text)
                    text[i, :n] = ids[:n]
                    lengths[i] = n
                mel, align, mel_lengths = self._infer_fn(t_text)(
                    jnp.asarray(text), jnp.asarray(lengths))
                mel = np.asarray(mel)
                align = np.asarray(align)
                mel_lengths = np.asarray(mel_lengths)
                for i, (ids, future) in enumerate(items):
                    n = int(mel_lengths[i])
                    future.set_result((mel[i, :n], align[i, :n, :lengths[i]],
                                       n))
            except BaseException as e:  # propagate to all waiters
                for _, future in items:
                    if not future.done():
                        future.set_exception(e)


class VocoderRunner:
    """Jitted neural mel->waveform vocoding with mel-length bucketing.

    One compilation per mel bucket (``mel_bucket_step`` frames apart, capped
    at ``max_frames``); requests are zero-padded to the bucket and the audio
    trimmed back, so the serving hot path never recompiles. Supports the
    'hifigan' generator and the 'waveglow' flow (fixed PRNG for the latter,
    so serving is deterministic).
    """

    def __init__(self, kind: str, vocoder_params, vocoder_cfg, *,
                 max_frames: int, bucket_step: int = 128,
                 sigma: float = 0.666):
        if kind not in ("hifigan", "waveglow"):
            raise ValueError(f"unknown neural vocoder {kind!r}")
        self.kind = kind
        self.params = jax.tree.map(jnp.asarray, vocoder_params)
        self.cfg = vocoder_cfg
        self.max_frames = max_frames
        self.bucket_step = bucket_step
        self.sigma = sigma
        self.hop = vocoder_cfg.hop_length
        self._jitted = {}

    def _fn(self, t_mel: int):
        if t_mel not in self._jitted:
            if self.kind == "hifigan":
                from tacotron2_tpu.models import hifigan
                cfg = self.cfg
                jitted = jax.jit(
                    lambda p, mel: hifigan.generator(p, mel, cfg))
            else:
                from tacotron2_tpu.models import waveglow
                cfg, sigma = self.cfg, self.sigma
                jitted = jax.jit(lambda p, mel: waveglow.infer(
                    p, mel, cfg, sigma=sigma, key=jax.random.PRNGKey(0)))
            self._jitted[t_mel] = jitted
        return self._jitted[t_mel]

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        """(n_frames, n_mels) float mel -> (n_frames * hop,) float audio."""
        from tacotron2_tpu.data.bucketing import mel_bucket
        n = mel.shape[0]
        t_mel = mel_bucket(n, self.bucket_step, max(self.max_frames, n))
        padded = np.zeros((1, t_mel, mel.shape[1]), np.float32)
        padded[0, :n] = mel
        audio = np.asarray(self._fn(t_mel)(self.params, jnp.asarray(padded)))
        return audio[0, :n * self.hop]
