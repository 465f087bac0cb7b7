"""HTTP serving endpoint over the micro-batching synthesizer.

Stdlib-only (no framework deps):

    POST /synthesize   {"text": "...",
                        "vocoder": "none"|"griffin_lim"|"hifigan"|"waveglow"}
      -> audio/wav, or application/json with the mel for "none".
      Neural vocoders require the server to be started with
      --vocoder hifigan|waveglow --vocoder_checkpoint V.npz.

    POST /stream       {"text": "..."}
      -> chunked transfer: raw signed-16-bit little-endian PCM
      (audio/L16;rate=SR) when a HiFi-GAN vocoder is loaded, else
      newline-delimited JSON mel events (application/x-ndjson).
      First bytes arrive while the decoder is still running
      (streaming.StreamingSynthesizer).

    GET /healthz       -> {"status": "ok"}

Concurrent /synthesize requests are coalesced into device batches by
``serve.BatchingSynthesizer``; the threaded HTTP server maps one request
per thread onto synthesizer futures. /stream requests are serialized by a
lock (one utterance owns the chip's autoregressive loop at a time).

    python -m tacotron2_tpu.http_server -c ckpt_dir --port 8080
"""

from __future__ import annotations

import argparse
import io
import itertools
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.serve import BatchingSynthesizer, VocoderRunner
from tacotron2_tpu.streaming import StreamingSynthesizer


class TTSRequestHandler(BaseHTTPRequestHandler):
    synthesizer: BatchingSynthesizer = None  # set by make_server
    config: Tacotron2Config = None
    vocoder_kind: str = "none"               # neural vocoder loaded, if any
    vocoder_runner: Optional[VocoderRunner] = None
    streamer: Optional[StreamingSynthesizer] = None
    stream_lock: threading.Lock = None
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._json(200, {"status": "ok"})
        else:
            self._json(404, {"error": "not found"})

    def _wav(self, audio: np.ndarray, sampling_rate: int) -> None:
        import scipy.io.wavfile
        buf = io.BytesIO()
        scipy.io.wavfile.write(buf, sampling_rate,
                               (np.clip(audio, -1, 1) * 32767)
                               .astype(np.int16))
        wav = buf.getvalue()
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Content-Length", str(len(wav)))
        self.end_headers()
        self.wfile.write(wav)

    def _read_payload(self) -> dict:
        length = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(length) or b"{}")

    def do_POST(self):
        if self.path == "/stream":
            self._do_stream()
            return
        if self.path != "/synthesize":
            self._json(404, {"error": "not found"})
            return
        try:
            payload = self._read_payload()
            text = payload.get("text", "")
            if not text:
                self._json(400, {"error": "missing 'text'"})
                return
            vocoder = payload.get("vocoder", "none")
            mel, alignment, n_frames = self.synthesizer.submit(text).result(
                timeout=float(payload.get("timeout_s", 300)))
            cfg = self.config
            if vocoder == "none":
                self._json(200, {
                    "n_frames": int(n_frames),
                    "audio_seconds": n_frames * cfg.hop_length
                    / cfg.sampling_rate,
                    "mel": mel.tolist(),
                })
                return
            if vocoder in ("hifigan", "waveglow"):
                if vocoder != self.vocoder_kind:
                    self._json(400, {"error":
                                     f"vocoder {vocoder!r} not loaded "
                                     f"(server has {self.vocoder_kind!r})"})
                    return
                self._wav(self.vocoder_runner(mel), cfg.sampling_rate)
                return
            if vocoder != "griffin_lim":
                self._json(400, {"error": f"unknown vocoder {vocoder!r}"})
                return
            import jax
            import jax.numpy as jnp
            import scipy.io.wavfile
            from tacotron2_tpu.audio import STFTConfig, filters, griffin_lim
            from tacotron2_tpu.audio.mel import dynamic_range_decompression
            inv = np.linalg.pinv(filters.mel_filterbank(
                cfg.sampling_rate, cfg.filter_length, cfg.n_mel_channels,
                cfg.mel_fmin, cfg.mel_fmax))
            linear = jnp.clip(jnp.einsum(
                "tm,mf->ft", dynamic_range_decompression(jnp.asarray(mel)),
                jnp.asarray(inv.T)), 0.0, None)[None]
            audio = np.asarray(griffin_lim(
                linear, STFTConfig(cfg.filter_length, cfg.hop_length,
                                   cfg.win_length), n_iters=30,
                key=jax.random.PRNGKey(0)))[0]
            self._wav(audio, cfg.sampling_rate)
        except Exception as e:  # robust endpoint: report, don't crash
            self._json(500, {"error": f"{type(e).__name__}: {e}"})

    def _do_stream(self):
        """Chunked-transfer low-latency synthesis (see module docstring)."""
        try:
            payload = self._read_payload()
            text = payload.get("text", "")
            if not text:
                self._json(400, {"error": "missing 'text'"})
                return
        except Exception as e:
            self._json(400, {"error": f"{type(e).__name__}: {e}"})
            return

        audio_mode = self.streamer.vocoder_params is not None
        with self.stream_lock:
            try:
                events = self.streamer.stream(text)
                first = next(events, None)
            except Exception as e:  # fail before the header if we can
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self.send_response(200)
            if audio_mode:
                rate = (self.streamer.vocoder_cfg.sampling_rate
                        if hasattr(self.streamer.vocoder_cfg,
                                   "sampling_rate")
                        else self.config.sampling_rate)
                self.send_header("Content-Type", f"audio/L16;rate={rate}")
            else:
                self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def emit(body: bytes) -> None:
                self.wfile.write(f"{len(body):x}\r\n".encode())
                self.wfile.write(body + b"\r\n")

            for ev in itertools.chain([first] if first else [], events):
                if audio_mode:
                    if ev.audio is None:
                        continue
                    emit((np.clip(ev.audio, -1, 1) * 32767)
                         .astype("<i2").tobytes())
                else:
                    if ev.mel is None:
                        continue
                    emit(json.dumps({
                        "mel_offset": int(ev.mel_offset),
                        "n_frames": int(ev.mel.shape[0]),
                        "done": bool(ev.done),
                        "mel": ev.mel.tolist(),
                    }).encode() + b"\n")
            self.wfile.write(b"0\r\n\r\n")  # chunked terminator


def make_server(params, stats, config: Tacotron2Config, port: int = 8080,
                host: str = "127.0.0.1", max_batch: int = 8,
                vocoder_kind: str = "none", vocoder_params=None,
                vocoder_cfg=None, chunk_steps: int = 32,
                ) -> ThreadingHTTPServer:
    runner = None
    if vocoder_kind != "none":
        runner = VocoderRunner(
            vocoder_kind, vocoder_params, vocoder_cfg,
            max_frames=config.max_decoder_steps * config.n_frames_per_step)
    # /stream vocodes only with HiFi-GAN (the flow vocoder draws noise over
    # the whole utterance, so windowed chunks can't reproduce it exactly)
    streamer = StreamingSynthesizer(
        params, stats, config,
        vocoder_params=vocoder_params if vocoder_kind == "hifigan" else None,
        vocoder_cfg=vocoder_cfg if vocoder_kind == "hifigan" else None,
        chunk_steps=chunk_steps)
    handler = type("BoundHandler", (TTSRequestHandler,), {
        "synthesizer": BatchingSynthesizer(params, stats, config,
                                           max_batch=max_batch),
        "config": config,
        "vocoder_kind": vocoder_kind,
        "vocoder_runner": runner,
        "streamer": streamer,
        "stream_lock": threading.Lock(),
    })
    return ThreadingHTTPServer((host, port), handler)


def main() -> None:
    import jax
    from tacotron2_tpu.config import create_config
    from tacotron2_tpu.training.checkpoint import Checkpointer
    from tacotron2_tpu.training.state import create_train_state

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint_dir", required=True)
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--hparams", default=None)
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--vocoder", default="none",
                        choices=["none", "hifigan", "waveglow"],
                        help="neural vocoder to load for /synthesize wav "
                             "output and /stream PCM output")
    parser.add_argument("--vocoder_checkpoint", default=None)
    parser.add_argument("--chunk_steps", type=int, default=32,
                        help="/stream decoder chunk size (frames groups)")
    args = parser.parse_args()

    cfg = create_config(args.hparams)
    ckpt = Checkpointer(args.checkpoint_dir)
    state = ckpt.restore(create_train_state(jax.random.PRNGKey(0), cfg))
    vocoder_params = vocoder_cfg = None
    if args.vocoder != "none":
        if not args.vocoder_checkpoint:
            parser.error("--vocoder requires --vocoder_checkpoint")
        from tacotron2_tpu.infer import load_vocoder
        vocoder_params, vocoder_cfg = load_vocoder(
            args.vocoder, args.vocoder_checkpoint, cfg)
    server = make_server(state.params, state.stats, cfg, args.port,
                         args.host, args.max_batch,
                         vocoder_kind=args.vocoder,
                         vocoder_params=vocoder_params,
                         vocoder_cfg=vocoder_cfg,
                         chunk_steps=args.chunk_steps)
    print(f"serving on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
