"""WaveGlow converter parity vs a torch oracle.

Builds a torch flow vocoder with the published WaveGlow's module/key layout
(WN.i.{start,end,cond_layer,in_layers,res_skip_layers}, convinv.i.conv,
upsample; weight-normed WN convs), random weights, exports the state_dict,
converts, and checks our JAX forward produces the same latents — proving a
real ``waveglow_256channels.pt`` would load correctly.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm

import jax

from tacotron2_tpu.convert_waveglow import convert_waveglow_state_dict
from tacotron2_tpu.models import waveglow as wg

CFG = wg.WaveGlowConfig(
    n_mel_channels=8, n_flows=4, n_group=8, n_early_every=2, n_early_size=2,
    wn_layers=3, wn_channels=16, wn_kernel_size=3,
    upsample_kernel=16, upsample_stride=4)


class TorchWaveGlowOracle(nn.Module):
    """Fresh torch implementation following the published WaveGlow layout."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.upsample = nn.ConvTranspose1d(cfg.n_mel_channels,
                                           cfg.n_mel_channels,
                                           cfg.upsample_kernel,
                                           stride=cfg.upsample_stride)
        self.WN = nn.ModuleList()
        self.convinv = nn.ModuleList()
        for i in range(cfg.n_flows):
            c = wg._remaining_channels(cfg, i)
            half = c // 2
            inv = nn.Module()
            inv.conv = nn.Conv1d(c, c, 1, bias=False)
            # orthogonal weight so the inverse is well-conditioned
            W = torch.linalg.qr(torch.randn(c, c))[0]
            inv.conv.weight.data = W[:, :, None]
            self.convinv.append(inv)

            wn_mod = nn.Module()
            wn_mod.start = weight_norm(nn.Conv1d(half, cfg.wn_channels, 1))
            wn_mod.end = nn.Conv1d(cfg.wn_channels, 2 * (c - half), 1)
            wn_mod.end.weight.data.zero_()
            wn_mod.end.bias.data.zero_()
            wn_mod.cond_layer = weight_norm(
                nn.Conv1d(cfg.n_mel_channels * cfg.n_group,
                          2 * cfg.wn_channels * cfg.wn_layers, 1))
            wn_mod.in_layers = nn.ModuleList()
            wn_mod.res_skip_layers = nn.ModuleList()
            for j in range(cfg.wn_layers):
                dilation = 2 ** j
                pad = (cfg.wn_kernel_size - 1) * dilation // 2
                wn_mod.in_layers.append(weight_norm(
                    nn.Conv1d(cfg.wn_channels, 2 * cfg.wn_channels,
                              cfg.wn_kernel_size, dilation=dilation,
                              padding=pad)))
                out_ch = (2 * cfg.wn_channels if j < cfg.wn_layers - 1
                          else cfg.wn_channels)
                wn_mod.res_skip_layers.append(weight_norm(
                    nn.Conv1d(cfg.wn_channels, out_ch, 1)))
            self.WN.append(wn_mod)

    def _wn(self, i, audio_half, cond):
        cfg = self.cfg
        wn_mod = self.WN[i]
        h = wn_mod.start(audio_half)
        cond_all = wn_mod.cond_layer(cond)
        output = None
        n = cfg.wn_channels
        for j in range(cfg.wn_layers):
            acts = (wn_mod.in_layers[j](h)
                    + cond_all[:, 2 * n * j:2 * n * (j + 1)])
            gated = torch.tanh(acts[:, :n]) * torch.sigmoid(acts[:, n:])
            rs = wn_mod.res_skip_layers[j](gated)
            if j < cfg.wn_layers - 1:
                h = h + rs[:, :n]
                skip = rs[:, n:]
            else:
                skip = rs
            output = skip if output is None else output + skip
        return wn_mod.end(output)

    def forward(self, audio, mel):
        """audio (B, T_samples), mel (B, n_mel, T_mel) -> z, log_s, log_det.
        Mirrors the published glow.py forward."""
        cfg = self.cfg
        spect = self.upsample(mel)
        time_cutoff = cfg.upsample_kernel - cfg.upsample_stride
        spect = spect[:, :, :-time_cutoff] if time_cutoff else spect
        spect = spect.unfold(2, cfg.n_group, cfg.n_group) \
            .permute(0, 2, 1, 3).contiguous() \
            .view(spect.size(0), -1, cfg.n_mel_channels * cfg.n_group) \
            .permute(0, 2, 1)
        audio = audio.unfold(1, cfg.n_group, cfg.n_group).permute(0, 2, 1)
        t_groups = min(audio.size(2), spect.size(2))
        audio = audio[:, :, :t_groups]
        spect = spect[:, :, :t_groups]

        output_audio = []
        log_s_total = 0
        log_det_total = 0
        for i in range(cfg.n_flows):
            if i % cfg.n_early_every == 0 and i > 0:
                output_audio.append(audio[:, :cfg.n_early_size])
                audio = audio[:, cfg.n_early_size:]
            audio = self.convinv[i].conv(audio)
            # slogdet: random orthogonal W may have det -1 (the published
            # WaveGlow flips a column to force +1; our oracle doesn't care)
            _, logabsdet = torch.slogdet(
                self.convinv[i].conv.weight.squeeze(-1))
            log_det_total = log_det_total + audio.size(0) * audio.size(2) * \
                logabsdet
            half = audio.size(1) // 2
            audio_0, audio_1 = audio[:, :half], audio[:, half:]
            out = self._wn(i, audio_0, spect)
            t_shift, log_s = out[:, :half], out[:, half:]
            audio_1 = torch.exp(log_s) * audio_1 + t_shift
            log_s_total = log_s_total + log_s.sum()
            audio = torch.cat([audio_0, audio_1], 1)
        output_audio.append(audio)
        return torch.cat(output_audio, 1), log_s_total, log_det_total


@pytest.fixture(scope="module")
def oracle_setup():
    torch.manual_seed(0)
    oracle = TorchWaveGlowOracle(CFG).eval()
    # perturb the zero-init end convs so couplings are non-trivial
    for wn_mod in oracle.WN:
        wn_mod.end.weight.data.normal_(0, 0.05)
        wn_mod.end.bias.data.normal_(0, 0.05)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, _ = convert_waveglow_state_dict(sd, CFG)

    rng = np.random.RandomState(0)
    B, T_mel = 2, 10
    mel = rng.randn(B, CFG.n_mel_channels, T_mel).astype(np.float32)
    audio = (rng.randn(B, T_mel * CFG.upsample_stride) * 0.3).astype(np.float32)
    return oracle, params, mel, audio


def test_key_coverage(oracle_setup):
    oracle, params, _, _ = oracle_setup
    # converted params resolve weight norm: same total count as materialized
    n_ours = sum(x.size for x in jax.tree.leaves(params))
    with torch.no_grad():
        n_torch = 0
        for k, v in oracle.state_dict().items():
            if k.endswith("weight_g"):
                continue  # folded into weight_v's materialized weight
            n_torch += v.numel()
    assert n_ours == n_torch


def test_forward_latent_parity(oracle_setup):
    oracle, params, mel, audio = oracle_setup
    import jax.numpy as jnp
    with torch.no_grad():
        z_t, log_s_t, log_det_t = oracle(torch.tensor(audio),
                                         torch.tensor(mel))
    out = wg.forward(params, jnp.asarray(audio),
                     jnp.asarray(mel.transpose(0, 2, 1)), CFG)
    # torch z is (B, C, T); ours (B, T, C)
    np.testing.assert_allclose(np.asarray(out.z).transpose(0, 2, 1),
                               z_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(float(out.log_s_total), float(log_s_t),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(out.log_det_total), float(log_det_t),
                               rtol=1e-3, atol=1e-2)
