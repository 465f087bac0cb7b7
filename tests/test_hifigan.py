"""HiFi-GAN vocoder tests: conv-op torch oracles, generator parity against
an inline torch reimplementation of the paper architecture, discriminator
shapes, loss math, and a full GAN train step."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tacotron2_tpu.audio.mel import MelConfig
from tacotron2_tpu.models import hifigan as hg
from tacotron2_tpu.ops.layers import avg_pool1d, conv1d, conv_transpose1d
from tacotron2_tpu.training.hifigan_trainer import (
    HiFiGANLosses, create_hifigan_state, hifigan_train_step)
from tacotron2_tpu.training.vocoder_trainer import VocoderBatch

ATOL = 2e-5

# Tiny config exercising every structural feature (multi-kernel MRF,
# multi-stage upsampling, all discriminators) at CPU-test scale.
CFG = hg.HiFiGANConfig(
    n_mel_channels=8,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 2), (1, 2)),
    mpd_periods=(2, 3),
    msd_scales=2,
)


def _np(x):
    return np.asarray(x)


class TestConvOps:
    def test_conv_transpose1d_matches_torch(self):
        torch.manual_seed(0)
        tconv = nn.ConvTranspose1d(6, 4, kernel_size=8, stride=4, padding=2)
        x = torch.randn(2, 6, 10)
        expected = tconv(x).detach().numpy()  # (2, 4, 40)

        # torch weight (in, out, k) -> ours (k, in, out), spatially flipped
        # (same convention as convert_waveglow.py:54-59)
        w = tconv.weight.detach().numpy().transpose(2, 0, 1)[::-1]
        params = {"kernel": jnp.asarray(np.ascontiguousarray(w)),
                  "bias": jnp.asarray(tconv.bias.detach().numpy())}
        got = _np(conv_transpose1d(params, jnp.asarray(
            x.numpy().transpose(0, 2, 1)), stride=4))
        np.testing.assert_allclose(got.transpose(0, 2, 1), expected,
                                   atol=ATOL)

    def test_strided_grouped_conv_matches_torch(self):
        torch.manual_seed(1)
        conv = nn.Conv1d(8, 12, kernel_size=5, stride=2, groups=4, padding=2)
        x = torch.randn(2, 8, 21)
        expected = conv(x).detach().numpy()

        params = {"kernel": jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 1, 0)),
            "bias": jnp.asarray(conv.bias.detach().numpy())}
        got = _np(conv1d(params, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                         stride=2, groups=4, padding=2))
        np.testing.assert_allclose(got.transpose(0, 2, 1), expected,
                                   atol=ATOL)

    def test_avg_pool1d_matches_torch(self):
        torch.manual_seed(2)
        x = torch.randn(2, 3, 17)
        expected = nn.AvgPool1d(4, 2, padding=2)(x).numpy()
        got = _np(avg_pool1d(jnp.asarray(x.numpy().transpose(0, 2, 1)),
                             4, 2, padding=2))
        np.testing.assert_allclose(got.transpose(0, 2, 1), expected,
                                   atol=ATOL)


# --------------------------------------------------------- torch oracle

class TorchResBlock(nn.Module):
    """ResBlock1 of arXiv:2010.05646 (oracle for hg._resblock)."""

    def __init__(self, ch, k, dilations):
        super().__init__()
        pad = lambda d: d * (k - 1) // 2
        self.convs1 = nn.ModuleList(
            [nn.Conv1d(ch, ch, k, dilation=d, padding=pad(d))
             for d in dilations])
        self.convs2 = nn.ModuleList(
            [nn.Conv1d(ch, ch, k, padding=pad(1)) for _ in dilations])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c1(F.leaky_relu(x, 0.1))
            xt = c2(F.leaky_relu(xt, 0.1))
            x = x + xt
        return x


class TorchGenerator(nn.Module):
    def __init__(self, cfg: hg.HiFiGANConfig):
        super().__init__()
        self.cfg = cfg
        self.conv_pre = nn.Conv1d(cfg.n_mel_channels,
                                  cfg.upsample_initial_channel, 7, padding=3)
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        ch = cfg.upsample_initial_channel
        for u, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
            self.ups.append(nn.ConvTranspose1d(ch, ch // 2, k, stride=u,
                                               padding=(k - u) // 2))
            ch //= 2
            for rk, dils in zip(cfg.resblock_kernel_sizes,
                                cfg.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock(ch, rk, dils))
        self.conv_post = nn.Conv1d(ch, 1, 7, padding=3)

    def forward(self, mel):  # (B, n_mel, T)
        n_res = len(self.cfg.resblock_kernel_sizes)
        x = self.conv_pre(mel)
        for i, up in enumerate(self.ups):
            x = up(F.leaky_relu(x, 0.1))
            xs = None
            for j in range(n_res):
                y = self.resblocks[i * n_res + j](x)
                xs = y if xs is None else xs + y
            x = xs / n_res
        return torch.tanh(self.conv_post(F.leaky_relu(x, 0.1)))


def _conv_to_jax(conv: nn.Conv1d):
    return {"kernel": jnp.asarray(
        conv.weight.detach().numpy().transpose(2, 1, 0)),
        "bias": jnp.asarray(conv.bias.detach().numpy())}


def _tconv_to_jax(tconv: nn.ConvTranspose1d):
    w = tconv.weight.detach().numpy().transpose(2, 0, 1)[::-1]
    return {"kernel": jnp.asarray(np.ascontiguousarray(w)),
            "bias": jnp.asarray(tconv.bias.detach().numpy())}


def torch_generator_to_params(gen: TorchGenerator, cfg: hg.HiFiGANConfig):
    n_res = len(cfg.resblock_kernel_sizes)
    params = {"conv_pre": _conv_to_jax(gen.conv_pre),
              "conv_post": _conv_to_jax(gen.conv_post),
              "ups": [_tconv_to_jax(u) for u in gen.ups]}
    resblocks = []
    for i in range(len(gen.ups)):
        stage = []
        for j in range(n_res):
            rb = gen.resblocks[i * n_res + j]
            stage.append({
                "convs1": [_conv_to_jax(c) for c in rb.convs1],
                "convs2": [_conv_to_jax(c) for c in rb.convs2]})
        resblocks.append(stage)
    params["resblocks"] = resblocks
    return params


class TestGenerator:
    def test_output_shape_is_mel_times_hop(self):
        params = hg.init_generator(jax.random.PRNGKey(0), CFG)
        mel = jnp.asarray(np.random.RandomState(0).randn(3, 11, 8),
                          jnp.float32)
        audio = hg.generator(params, mel, CFG)
        assert CFG.hop_length == 8
        assert audio.shape == (3, 11 * 8)
        assert bool(jnp.all(jnp.abs(audio) <= 1.0))

    def test_matches_torch_reimplementation(self):
        torch.manual_seed(3)
        gen = TorchGenerator(CFG)
        mel = torch.randn(2, CFG.n_mel_channels, 13)
        expected = gen(mel).detach().numpy()[:, 0]  # (B, T_samples)

        params = torch_generator_to_params(gen, CFG)
        got = _np(hg.generator(
            params, jnp.asarray(mel.numpy().transpose(0, 2, 1)), CFG))
        np.testing.assert_allclose(got, expected, atol=5e-5)


class TestDiscriminators:
    def test_mpd_shapes_and_padding(self):
        params = hg.init_mpd(jax.random.PRNGKey(1), CFG)
        audio = jnp.asarray(np.random.RandomState(1).randn(2, 101),
                            jnp.float32)  # not a multiple of any period
        for p, period in zip(params, CFG.mpd_periods):
            logits, fmaps = hg.mpd_apply(p, audio, period)
            assert logits.shape[0] == 2
            assert len(fmaps) == 6  # 5 convs + conv_post

    def test_msd_shapes(self):
        params = hg.init_msd(jax.random.PRNGKey(2), CFG)
        audio = jnp.asarray(np.random.RandomState(2).randn(2, 160),
                            jnp.float32)
        logits, fmaps = hg.msd_apply(params[0], audio)
        assert logits.shape[0] == 2
        assert len(fmaps) == 8  # 7 convs + conv_post

    def test_discriminate_runs_all(self):
        mpd = hg.init_mpd(jax.random.PRNGKey(1), CFG)
        msd = hg.init_msd(jax.random.PRNGKey(2), CFG)
        audio = jnp.asarray(np.random.RandomState(3).randn(2, 160),
                            jnp.float32)
        logits, fmaps = hg.discriminate(mpd, msd, audio, CFG)
        assert len(logits) == len(CFG.mpd_periods) + CFG.msd_scales
        assert len(fmaps) == len(logits)


class TestLosses:
    def test_perfect_discriminator_loss_is_zero(self):
        real = [jnp.ones((2, 5))]
        fake = [jnp.zeros((2, 5))]
        assert float(hg.discriminator_loss(real, fake)) == 0.0
        assert float(hg.generator_adversarial_loss([jnp.ones((2, 5))])) == 0.0

    def test_feature_matching_is_scaled_l1(self):
        fr = [[jnp.zeros((2, 3))], [jnp.zeros((2, 3))]]
        fg = [[jnp.ones((2, 3))], [jnp.full((2, 3), 2.0)]]
        np.testing.assert_allclose(
            float(hg.feature_matching_loss(fr, fg)), 2.0 * (1.0 + 2.0))


@pytest.mark.slow
class TestTrainStep:
    def test_one_step_updates_both_networks(self):
        mel_cfg = MelConfig(filter_length=16, hop_length=8, win_length=16,
                            n_mel_channels=8, mel_fmax=4000.0)
        state = create_hifigan_state(jax.random.PRNGKey(0), CFG)
        rng = np.random.RandomState(0)
        T_mel = 8
        batch = VocoderBatch(
            audio=jnp.asarray(rng.randn(2, T_mel * 8) * 0.2, jnp.float32),
            mel=jnp.asarray(rng.randn(2, T_mel, 8), jnp.float32))
        new_state, losses = hifigan_train_step(state, batch, CFG, mel_cfg)

        assert isinstance(losses, HiFiGANLosses)
        for v in losses:
            assert np.isfinite(float(v))
        assert float(losses.gen_total) > 0
        assert int(new_state.step) == 1
        # both networks actually moved
        g0 = jax.tree_util.tree_leaves(state.gen_params)[0]
        g1 = jax.tree_util.tree_leaves(new_state.gen_params)[0]
        assert not np.allclose(_np(g0), _np(g1))
        d0 = jax.tree_util.tree_leaves(state.mpd_params)[0]
        d1 = jax.tree_util.tree_leaves(new_state.mpd_params)[0]
        assert not np.allclose(_np(d0), _np(d1))
