"""Streaming synthesis tests: chunked decode == offline decode, and the
full streamed postnet+vocoder pipeline == the offline pipeline, sample for
sample (the whole point of the context-margin design in streaming.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data.bucketing import text_bucket
from tacotron2_tpu.models import hifigan
from tacotron2_tpu.models import tacotron2 as m
from tacotron2_tpu.ops.layers import dense, length_mask
from tacotron2_tpu.streaming import (StreamingSynthesizer,
                                     postnet_margin_frames)
from tacotron2_tpu.text import text_to_sequence

CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=32, encoder_embedding_dim=32,
    encoder_n_convolutions=2, attention_rnn_dim=40, decoder_rnn_dim=48,
    prenet_dim=16, attention_dim=24, attention_location_n_filters=8,
    attention_location_kernel_size=15, postnet_embedding_dim=32,
    postnet_n_convolutions=3, n_mel_channels=20, max_decoder_steps=24,
    text_buckets=(16, 32), gate_threshold=0.99,
    compute_dtype="float32")  # fp32 parity (bf16 is the r3 default)

HG_CFG = hifigan.HiFiGANConfig(
    n_mel_channels=20, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    upsample_initial_channel=16, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),))


@pytest.fixture(scope="module")
def params_stats():
    return m.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def encoded(params_stats):
    params, stats = params_stats
    rng = np.random.RandomState(0)
    text = rng.randint(1, 148, (2, 12)).astype(np.int32)
    text[1, 8:] = 0
    lengths = jnp.asarray([12, 8], jnp.int32)
    memory, _ = m.encode(params, stats, jnp.asarray(text), lengths, CFG,
                         training=False)
    processed = dense(params["decoder"]["attention"]["memory"], memory)
    mask = length_mask(lengths, memory.shape[1])
    return memory, processed, mask, lengths


@pytest.mark.parametrize("use_rng", [False, True])
def test_decode_chunk_matches_offline(params_stats, encoded, use_rng):
    """Concatenated chunks reproduce decode_autoregressive exactly,
    including the per-step prenet RNG derivation."""
    params, _ = params_stats
    memory, processed, mask, lengths = encoded
    rng = jax.random.PRNGKey(7) if use_rng else None

    mel_off, gate_off, align_off, len_off = m.decode_autoregressive(
        params, memory, lengths, CFG, rng=rng, max_steps=24)

    carry = m.init_stream_carry(memory, CFG)
    mels, gates, aligns = [], [], []
    for _ in range(3):  # 3 chunks x 8 = 24 steps
        carry, (mel, gate, align) = m.decode_chunk(
            params, carry, memory, processed, mask, CFG, chunk_steps=8,
            rng=rng)
        mels.append(mel)
        gates.append(gate)
        aligns.append(align)
    mel_s = jnp.concatenate(mels, axis=1)
    gate_s = jnp.concatenate(gates, axis=1)
    align_s = jnp.concatenate(aligns, axis=1)

    np.testing.assert_allclose(mel_s, mel_off, atol=1e-5)
    np.testing.assert_allclose(gate_s, gate_off, atol=1e-5)
    np.testing.assert_allclose(align_s, align_off, atol=1e-5)
    # r=1 here: carry.lengths (decoder steps) == offline lengths (frames)
    np.testing.assert_array_equal(np.asarray(carry.lengths),
                                  np.asarray(len_off))


def test_postnet_margin_default():
    assert postnet_margin_frames(Tacotron2Config()) == 10
    assert postnet_margin_frames(CFG) == 3 * 2  # 3 convs k=5


def test_hifigan_receptive_field():
    assert hifigan.receptive_field_frames(hifigan.HiFiGANConfig()) == 15
    # empirical: perturbing a mel frame beyond the margin must not change
    # samples of a distant frame; the bound must be conservative
    R = hifigan.receptive_field_frames(HG_CFG)
    gp = hifigan.init_generator(jax.random.PRNGKey(1), HG_CFG)
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 40, 20))
    base = np.asarray(hifigan.generator(gp, mel, HG_CFG))
    hop = HG_CFG.hop_length
    mel2 = mel.at[0, 30].add(10.0)  # big perturbation at frame 30
    out = np.asarray(hifigan.generator(gp, mel2, HG_CFG))
    # frames strictly more than R away from frame 30 are untouched
    lo, hi = (30 - R) * hop, (30 + 1 + R) * hop
    np.testing.assert_array_equal(out[0, :lo], base[0, :lo])
    np.testing.assert_array_equal(out[0, hi:], base[0, hi:])


@pytest.mark.parametrize("gate_threshold", [0.99, 0.3])
def test_streaming_pipeline_matches_offline(params_stats, gate_threshold):
    """Streamed mel and audio equal the offline infer + generator pipeline.
    gate 0.99 -> runs to the max_decoder_steps cap; 0.3 -> stops early."""
    params, stats = params_stats
    cfg = CFG.replace(gate_threshold=gate_threshold)
    gp = hifigan.init_generator(jax.random.PRNGKey(1), HG_CFG)

    synth = StreamingSynthesizer(params, stats, cfg, vocoder_params=gp,
                                 vocoder_cfg=HG_CFG, chunk_steps=8)
    text = "hello world"
    events = list(synth.stream(text))
    assert events and events[-1].done
    mel_s = np.concatenate([e.mel for e in events if e.mel is not None])
    audio_s = np.concatenate([e.audio for e in events
                              if e.audio is not None])

    # offline reference on the identically bucket-padded input
    dcfg = synth.config  # deterministic prenet, as the synthesizer uses
    ids = text_to_sequence(text, dcfg.text_cleaners)
    bucket = text_bucket(len(ids), dcfg.text_buckets)
    arr = np.zeros((1, bucket), np.int32)
    arr[0, :len(ids)] = ids
    res = m.infer(params, stats, jnp.asarray(arr),
                  jnp.asarray([len(ids)], jnp.int32), dcfg)
    n = int(res.mel_lengths[0])
    audio_off = np.asarray(hifigan.generator(gp, res.mel_postnet, HG_CFG))

    assert mel_s.shape[0] == n
    np.testing.assert_allclose(mel_s, np.asarray(res.mel_postnet)[0, :n],
                               atol=1e-4)
    assert audio_s.shape[0] == n * HG_CFG.hop_length
    np.testing.assert_allclose(
        audio_s, audio_off[0, :n * HG_CFG.hop_length], atol=1e-4)


def test_streaming_fused_dropout_matches_offline(params_stats):
    """Round 4: fused streaming honors the reference's inference-time
    prenet dropout (model.py:99) — streamed mel equals offline infer with
    the same rng, dropout ACTIVE (round 3 raised on this combination)."""
    params, stats = params_stats
    cfg = CFG.replace(gate_threshold=0.3)
    synth = StreamingSynthesizer(params, stats, cfg, chunk_steps=8,
                                 deterministic=False)
    assert synth._fused  # the combination round 3 refused
    rng = jax.random.PRNGKey(11)
    events = list(synth.stream("hello world", rng=rng))
    assert events and events[-1].done
    mel_s = np.concatenate([e.mel for e in events if e.mel is not None])

    ids = text_to_sequence("hello world", cfg.text_cleaners)
    bucket = text_bucket(len(ids), cfg.text_buckets)
    arr = np.zeros((1, bucket), np.int32)
    arr[0, :len(ids)] = ids
    res = m.infer(params, stats, jnp.asarray(arr),
                  jnp.asarray([len(ids)], jnp.int32), cfg, rng=rng)
    n = int(res.mel_lengths[0])
    assert mel_s.shape[0] == n
    np.testing.assert_allclose(mel_s, np.asarray(res.mel_postnet)[0, :n],
                               atol=1e-4)


def test_stream_batch_matches_offline(params_stats):
    """stream_batch (XLA fallback geometry): every row's streamed mel and
    audio equal the batched offline pipeline, with per-row done events."""
    params, stats = params_stats
    cfg = CFG.replace(gate_threshold=0.3)
    gp = hifigan.init_generator(jax.random.PRNGKey(1), HG_CFG)
    synth = StreamingSynthesizer(params, stats, cfg, vocoder_params=gp,
                                 vocoder_cfg=HG_CFG, chunk_steps=8)
    texts = ["hello world", "a somewhat longer sentence", "hi"]
    B = len(texts)
    mels = {b: [] for b in range(B)}
    audios = {b: [] for b in range(B)}
    done_rows = set()
    offsets = {b: [] for b in range(B)}
    for b, ev in synth.stream_batch(texts):
        if ev.mel is not None:
            mels[b].append(ev.mel)
        if ev.audio is not None:
            audios[b].append(ev.audio)
            offsets[b].append(ev.mel_offset)
        if ev.done:
            done_rows.add(b)
    assert done_rows == set(range(B))
    assert all(offsets[b] == sorted(offsets[b]) for b in range(B))

    dcfg = synth.config  # deterministic prenet, as the synthesizer uses
    ids_list = [text_to_sequence(t, dcfg.text_cleaners) for t in texts]
    bucket = max(text_bucket(len(i), dcfg.text_buckets) for i in ids_list)
    arr = np.zeros((B, bucket), np.int32)
    for i, ids in enumerate(ids_list):
        arr[i, :len(ids)] = ids
    lengths = jnp.asarray([len(i) for i in ids_list], jnp.int32)
    res = m.infer(params, stats, jnp.asarray(arr), lengths, dcfg)
    audio_off = np.asarray(hifigan.generator(gp, res.mel_postnet, HG_CFG))
    for b in range(B):
        n = int(res.mel_lengths[b])
        mel_b = np.concatenate(mels[b])
        audio_b = np.concatenate(audios[b])
        assert mel_b.shape[0] == n
        np.testing.assert_allclose(
            mel_b, np.asarray(res.mel_postnet)[b, :n], atol=1e-4)
        assert audio_b.shape[0] == n * HG_CFG.hop_length
        np.testing.assert_allclose(
            audio_b, audio_off[b, :n * HG_CFG.hop_length], atol=1e-4)


def test_stream_batch_kernel_path():
    """stream_batch through the BATCHED fused kernel (interpret mode at
    the 128-aligned geometry), prenet dropout active: per-row parity with
    the batched offline XLA infer under the same rng."""
    cfg = Tacotron2Config(
        n_symbols=40, symbols_embedding_dim=128, encoder_embedding_dim=128,
        encoder_n_convolutions=1, attention_rnn_dim=128,
        decoder_rnn_dim=128, prenet_dim=128, attention_dim=128,
        attention_location_n_filters=4, attention_location_kernel_size=7,
        n_mel_channels=16, max_decoder_steps=16, gate_threshold=0.3,
        postnet_embedding_dim=32, postnet_n_convolutions=2,
        text_buckets=(16,), compute_dtype="float32")
    params, stats = m.init_params(jax.random.PRNGKey(0), cfg)
    synth = StreamingSynthesizer(params, stats, cfg, chunk_steps=8,
                                 deterministic=False, fused=True)
    texts = ["ab cd ef", "abcdef ab"]
    rng = jax.random.PRNGKey(5)
    mels = {0: [], 1: []}
    for b, ev in synth.stream_batch(texts, rng=rng):
        if ev.mel is not None:
            mels[b].append(ev.mel)
    assert synth._packed_batch is not None  # the kernel path engaged

    dcfg = synth.config
    ids_list = [text_to_sequence(t, dcfg.text_cleaners) for t in texts]
    bucket = max(text_bucket(len(i), dcfg.text_buckets) for i in ids_list)
    arr = np.zeros((2, bucket), np.int32)
    for i, ids in enumerate(ids_list):
        arr[i, :len(ids)] = ids
    lengths = jnp.asarray([min(len(i), bucket) for i in ids_list],
                          jnp.int32)
    res = m.infer(params, stats, jnp.asarray(arr), lengths, dcfg, rng=rng)
    for b in range(2):
        n = int(res.mel_lengths[b])
        mel_b = np.concatenate(mels[b])
        assert mel_b.shape[0] == n
        # 1e-3: kernel-vs-XLA per-step parity is 1e-4
        # (test_decoder_batch) but this compares after a 16-step AR roll
        # plus postnet, where the per-step difference compounds
        np.testing.assert_allclose(
            mel_b, np.asarray(res.mel_postnet)[b, :n], atol=1e-3)


def test_streaming_mel_only(params_stats):
    """No vocoder: mel-only events, monotone offsets, done on the last."""
    params, stats = params_stats
    synth = StreamingSynthesizer(params, stats, CFG, chunk_steps=8)
    events = list(synth.stream("a short test"))
    assert all(e.audio is None for e in events)
    offsets = [e.mel_offset for e in events]
    assert offsets == sorted(offsets)
    assert events[-1].done
