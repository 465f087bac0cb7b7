"""End-to-end synthesis pipeline tests (text -> mel -> audio)."""

import numpy as np
import pytest

import jax

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.infer import Denoiser, encode_texts, synthesize
from tacotron2_tpu.models import waveglow as wg
from tacotron2_tpu.models.tacotron2 import init_params

CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=16, encoder_embedding_dim=16,
    encoder_n_convolutions=2, attention_rnn_dim=20, decoder_rnn_dim=24,
    prenet_dim=8, attention_dim=12, attention_location_n_filters=4,
    attention_location_kernel_size=7, postnet_embedding_dim=16,
    postnet_n_convolutions=3, n_mel_channels=8, max_decoder_steps=12,
    filter_length=64, hop_length=16, win_length=64,
    prenet_dropout_at_inference=False,
)

WG_CFG = wg.WaveGlowConfig(
    n_mel_channels=8, n_flows=4, n_group=8, n_early_every=2, n_early_size=2,
    wn_layers=2, wn_channels=8, upsample_kernel=32, upsample_stride=16)


@pytest.fixture(scope="module")
def models():
    params, stats = init_params(jax.random.PRNGKey(0), CFG)
    wg_params = wg.init_params(jax.random.PRNGKey(1), WG_CFG)
    return params, stats, wg_params


def test_encode_texts_padding():
    ids, lengths = encode_texts(["abc", "a"], Tacotron2Config())
    assert ids.shape == (2, 3)
    assert list(np.asarray(lengths)) == [3, 1]
    assert int(ids[1, 1]) == 0


def test_synthesize_mel_only(models):
    params, stats, _ = models
    results = synthesize(params, stats, ["hello world", "hi"], CFG,
                         vocoder="none")
    assert len(results) == 2
    for r in results:
        assert r.mel.ndim == 2 and r.mel.shape[1] == CFG.n_mel_channels
        assert r.alignment.shape[0] == r.mel.shape[0]
        assert r.audio is None


def test_synthesize_griffin_lim(models):
    params, stats, _ = models
    results = synthesize(params, stats, ["hello"], CFG,
                         vocoder="griffin_lim", griffin_lim_iters=2)
    r = results[0]
    assert r.audio is not None
    # ISTFT yields hop*(T-1) samples (centered trim); never more than T*hop
    assert (r.mel.shape[0] - 1) * CFG.hop_length <= len(r.audio) \
        <= r.mel.shape[0] * CFG.hop_length


@pytest.mark.slow
def test_synthesize_waveglow_with_denoiser(models):
    params, stats, wg_params = models
    den = Denoiser(wg_params, WG_CFG,
                   stft_cfg=__import__("tacotron2_tpu.audio",
                                       fromlist=["STFTConfig"]).STFTConfig(
                       64, 16, 64),
                   n_mel_frames=16)
    results = synthesize(params, stats, ["hello there"], CFG,
                         vocoder="waveglow", vocoder_params=wg_params,
                         vocoder_cfg=WG_CFG, denoiser=den,
                         rng=jax.random.PRNGKey(3))
    r = results[0]
    assert r.audio is not None and np.all(np.isfinite(r.audio))
