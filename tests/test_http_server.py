"""HTTP serving endpoint tests (loopback, threaded server)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.http_server import make_server
from tacotron2_tpu.models.tacotron2 import init_params

CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=16, encoder_embedding_dim=16,
    encoder_n_convolutions=2, attention_rnn_dim=20, decoder_rnn_dim=24,
    prenet_dim=8, attention_dim=12, attention_location_n_filters=4,
    attention_location_kernel_size=7, postnet_embedding_dim=16,
    postnet_n_convolutions=3, n_mel_channels=8, max_decoder_steps=8,
    filter_length=64, hop_length=16, win_length=64, text_buckets=(16, 32),
)


@pytest.fixture(scope="module")
def server():
    params, stats = init_params(jax.random.PRNGKey(0), CFG)
    srv = make_server(params, stats, CFG, port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.RequestHandlerClass.synthesizer.close()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=180)


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        assert json.load(r)["status"] == "ok"


def test_synthesize_mel_json(server):
    with _post(server + "/synthesize", {"text": "hello world"}) as r:
        body = json.load(r)
    assert body["n_frames"] >= 1
    mel = np.asarray(body["mel"])
    assert mel.shape == (body["n_frames"], CFG.n_mel_channels)


def test_synthesize_wav(server):
    with _post(server + "/synthesize",
               {"text": "hi", "vocoder": "griffin_lim"}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        wav = r.read()
    assert wav[:4] == b"RIFF"


def test_missing_text_400(server):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(server + "/synthesize", {})
    assert exc_info.value.code == 400


def test_concurrent_requests(server):
    results = []
    def call(i):
        with _post(server + "/synthesize", {"text": f"utterance {i}"}) as r:
            results.append(json.load(r)["n_frames"])
    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4


def test_vocoder_not_loaded_400(server):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(server + "/synthesize", {"text": "hi", "vocoder": "hifigan"})
    assert exc_info.value.code == 400


def test_stream_mel_ndjson(server):
    """No vocoder loaded: /stream emits newline-delimited JSON mel events."""
    with _post(server + "/stream", {"text": "streaming test"}) as r:
        assert r.headers["Content-Type"] == "application/x-ndjson"
        lines = [json.loads(ln) for ln in r.read().splitlines() if ln]
    assert lines and lines[-1]["done"]
    total = sum(ev["n_frames"] for ev in lines)
    assert total >= 1
    assert lines[0]["mel_offset"] == 0
    assert np.asarray(lines[0]["mel"]).shape == (lines[0]["n_frames"],
                                                 CFG.n_mel_channels)


@pytest.fixture(scope="module")
def hifigan_server():
    from tacotron2_tpu.models import hifigan
    hg_cfg = hifigan.HiFiGANConfig(
        n_mel_channels=CFG.n_mel_channels, upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8), upsample_initial_channel=16,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),))
    gp = hifigan.init_generator(jax.random.PRNGKey(1), hg_cfg)
    params, stats = init_params(jax.random.PRNGKey(0), CFG)
    srv = make_server(params, stats, CFG, port=0, vocoder_kind="hifigan",
                      vocoder_params=gp, vocoder_cfg=hg_cfg, chunk_steps=4)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", hg_cfg
    srv.shutdown()
    srv.RequestHandlerClass.synthesizer.close()


def test_synthesize_hifigan_wav(hifigan_server):
    url, hg_cfg = hifigan_server
    with _post(url + "/synthesize",
               {"text": "hi", "vocoder": "hifigan"}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        wav = r.read()
    assert wav[:4] == b"RIFF"


def test_stream_pcm(hifigan_server):
    """HiFi-GAN loaded: /stream emits s16le PCM; total samples = n_frames *
    vocoder hop (checked against the offline /synthesize frame count)."""
    url, hg_cfg = hifigan_server
    with _post(url + "/synthesize", {"text": "stream me"}) as r:
        n_frames = json.load(r)["n_frames"]
    with _post(url + "/stream", {"text": "stream me"}) as r:
        assert r.headers["Content-Type"].startswith("audio/L16")
        pcm = r.read()
    samples = np.frombuffer(pcm, "<i2")
    assert samples.shape[0] == n_frames * hg_cfg.hop_length
