"""HTTP serving endpoint over the micro-batching synthesizer.

Stdlib-only (no framework deps):

    POST /synthesize   {"text": "...", "vocoder": "griffin_lim"|"none"}
      -> audio/wav (griffin_lim) or application/json with the mel

    GET /healthz       -> {"status": "ok"}

Concurrent requests are coalesced into device batches by
``serve.BatchingSynthesizer``; the threaded HTTP server maps one request
per thread onto synthesizer futures.

    python -m tacotron2_tpu.http_server -c ckpt_dir --port 8080
"""

from __future__ import annotations

import argparse
import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.serve import BatchingSynthesizer


class TTSRequestHandler(BaseHTTPRequestHandler):
    synthesizer: BatchingSynthesizer = None  # set by make_server
    config: Tacotron2Config = None
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

    def do_POST(self):
        if self.path != "/synthesize":
            self._json(404, {"error": "not found"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
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
            buf = io.BytesIO()
            scipy.io.wavfile.write(buf, cfg.sampling_rate,
                                   (np.clip(audio, -1, 1) * 32767)
                                   .astype(np.int16))
            wav = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(wav)))
            self.end_headers()
            self.wfile.write(wav)
        except Exception as e:  # robust endpoint: report, don't crash
            self._json(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(params, stats, config: Tacotron2Config, port: int = 8080,
                host: str = "127.0.0.1", max_batch: int = 8,
                ) -> ThreadingHTTPServer:
    handler = type("BoundHandler", (TTSRequestHandler,), {
        "synthesizer": BatchingSynthesizer(params, stats, config,
                                           max_batch=max_batch),
        "config": config,
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
    args = parser.parse_args()

    cfg = create_config(args.hparams)
    ckpt = Checkpointer(args.checkpoint_dir)
    state = ckpt.restore(create_train_state(jax.random.PRNGKey(0), cfg))
    server = make_server(state.params, state.stats, cfg, args.port,
                         args.host, args.max_batch)
    print(f"serving on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
