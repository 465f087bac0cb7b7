"""WaveGlow-style normalizing-flow vocoder (mel -> waveform), TPU-native.

The reference repo consumes WaveGlow as an empty git submodule
(/root/reference/.gitmodules:1-4) and calls ``waveglow.infer(mel,
sigma=0.666)`` + ``Denoiser(...)`` from the notebook (inference.ipynb cells
9, 15, 17); the functional spec is the public WaveGlow architecture
(arXiv:1811.00002): audio squeezed into groups of 8 samples, 12 flow steps
of [invertible 1x1 conv -> affine coupling], WaveNet-style gated dilated
conv conditioners fed by transposed-conv-upsampled mels, early outputs of 2
channels every 4 flows.

TPU-first choices: channels-last activations, the whole WN stack expressed
as dense conv ops (MXU), inference as a single jitted inverse pass —
non-autoregressive, so unlike the Tacotron decoder it parallelizes over
time trivially.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.ops.layers import conv1d

Params = Dict


class WaveGlowConfig(NamedTuple):
    n_mel_channels: int = 80
    n_flows: int = 12
    n_group: int = 8
    n_early_every: int = 4
    n_early_size: int = 2
    # WN conditioner
    wn_layers: int = 8
    wn_channels: int = 256
    wn_kernel_size: int = 3
    # mel upsampling (matches hop 256 at 22.05 kHz)
    upsample_kernel: int = 1024
    upsample_stride: int = 256
    sigma: float = 1.0  # training prior std; inference uses sigma=0.666


def _remaining_channels(cfg: WaveGlowConfig, flow_index: int) -> int:
    """Channels still in the flow when step ``flow_index`` runs."""
    c = cfg.n_group
    for k in range(flow_index):
        if k % cfg.n_early_every == 0 and k > 0:
            c -= cfg.n_early_size
    if flow_index % cfg.n_early_every == 0 and flow_index > 0:
        c -= cfg.n_early_size
    return c


def init_params(key: jax.Array, cfg: WaveGlowConfig) -> Params:
    keys = iter(jax.random.split(key, 4 + cfg.n_flows * (4 + cfg.wn_layers * 3)))
    nk = lambda: next(keys)

    def conv_p(k, cin, cout, zero=False, scale=None):
        if zero:
            kern = jnp.zeros((k, cin, cout), jnp.float32)
        else:
            fan = cin * k
            std = scale if scale is not None else 1.0 / np.sqrt(fan)
            kern = jax.random.normal(nk(), (k, cin, cout)) * std
        return {"kernel": kern, "bias": jnp.zeros((cout,), jnp.float32)}

    # transposed-conv upsampler: stored as (k, mel, mel) kernel
    upsample = conv_p(cfg.upsample_kernel, cfg.n_mel_channels,
                      cfg.n_mel_channels)

    flows = []
    for i in range(cfg.n_flows):
        c = _remaining_channels(cfg, i)
        half = c // 2
        # invertible 1x1: random orthogonal with det +1
        w = np.linalg.qr(np.asarray(
            jax.random.normal(nk(), (c, c))))[0]
        if np.linalg.det(w) < 0:
            w[:, 0] = -w[:, 0]
        wn_in = conv_p(1, half, cfg.wn_channels)
        wn_layers = []
        for j in range(cfg.wn_layers):
            wn_layers.append({
                "in_conv": conv_p(cfg.wn_kernel_size, cfg.wn_channels,
                                  2 * cfg.wn_channels),
                "cond_conv": conv_p(1, cfg.n_mel_channels * cfg.n_group,
                                    2 * cfg.wn_channels),
                # res+skip fused output conv
                "res_skip": conv_p(1, cfg.wn_channels,
                                   2 * cfg.wn_channels
                                   if j < cfg.wn_layers - 1
                                   else cfg.wn_channels),
            })
        # final projection to (log_s, t), zero-init so each flow starts as
        # the identity (standard Glow/WaveGlow practice)
        wn_end = conv_p(1, cfg.wn_channels, 2 * (c - half), zero=True)
        flows.append({
            "inv1x1": {"w": jnp.asarray(w, jnp.float32)},
            "wn": {"start": wn_in, "layers": wn_layers, "end": wn_end},
        })
    return {"upsample": upsample, "flows": flows}


# ----------------------------------------------------------------- pieces

def upsample_mel(params: Params, mel: jnp.ndarray,
                 cfg: WaveGlowConfig) -> jnp.ndarray:
    """(B, T_mel, n_mel) -> (B, T_groups, n_mel * n_group): transposed conv
    to sample rate, trimmed, then folded into per-group conditioning."""
    kernel = params["upsample"]["kernel"]  # (k, mel, mel)
    y = jax.lax.conv_transpose(
        mel, kernel, strides=(cfg.upsample_stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))
    y = y + params["upsample"]["bias"]
    # trim the transposed-conv tail so length = T_mel * stride
    t_samples = mel.shape[1] * cfg.upsample_stride
    y = y[:, :t_samples]
    B, T, C = y.shape
    t_groups = T // cfg.n_group
    y = y[:, :t_groups * cfg.n_group]
    # (B, T_g, group, mel) -> (B, T_g, mel * group): interleave so each
    # group position sees all mels (WaveGlow's unfold ordering)
    y = y.reshape(B, t_groups, cfg.n_group, C).transpose(0, 1, 3, 2)
    return y.reshape(B, t_groups, C * cfg.n_group)


def wn_conditioner(wn: Params, x_half: jnp.ndarray, cond: jnp.ndarray,
                   cfg: WaveGlowConfig) -> jnp.ndarray:
    """Gated dilated-conv stack -> (log_s, t). x_half: (B, T, half)."""
    h = conv1d(wn["start"], x_half)
    skip_total = None
    n = cfg.wn_channels
    for j, layer in enumerate(wn["layers"]):
        conv_out = conv1d(layer["in_conv"], h, dilation=2 ** j)
        cond_out = conv1d(layer["cond_conv"], cond)
        z = conv_out + cond_out
        gated = jnp.tanh(z[..., :n]) * jax.nn.sigmoid(z[..., n:])
        rs = conv1d(layer["res_skip"], gated)
        if rs.shape[-1] == 2 * n:
            h = h + rs[..., :n]
            skip = rs[..., n:]
        else:
            skip = rs
        skip_total = skip if skip_total is None else skip_total + skip
    return conv1d(wn["end"], skip_total)


def _inv1x1_forward(w: jnp.ndarray, x: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    z = jnp.einsum("btc,cd->btd", x, w)
    _, logdet = jnp.linalg.slogdet(w)
    return z, logdet * x.shape[1]  # per batch row: T * log|det W|


def _inv1x1_inverse(w: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("btc,cd->btd", z, jnp.linalg.inv(w))


# ------------------------------------------------------------------ flows

class FlowOutput(NamedTuple):
    z: jnp.ndarray        # (B, T_groups, n_group) latent
    log_s_total: jnp.ndarray  # scalar per batch-sum of log_s
    log_det_total: jnp.ndarray


def forward(params: Params, audio: jnp.ndarray, mel: jnp.ndarray,
            cfg: WaveGlowConfig) -> FlowOutput:
    """Training direction: audio -> latent z. audio: (B, T_samples) in
    [-1, 1]; mel: (B, T_mel, n_mel) aligned (T_samples = T_mel * stride)."""
    B = audio.shape[0]
    cond = upsample_mel(params, mel, cfg)
    t_groups = cond.shape[1]
    x = audio[:, :t_groups * cfg.n_group].reshape(B, t_groups, cfg.n_group)

    outputs: List[jnp.ndarray] = []
    log_s_total = jnp.zeros((), jnp.float32)
    log_det_total = jnp.zeros((), jnp.float32)

    for i, flow in enumerate(params["flows"]):
        if i % cfg.n_early_every == 0 and i > 0:
            outputs.append(x[..., :cfg.n_early_size])
            x = x[..., cfg.n_early_size:]
        x, logdet = _inv1x1_forward(flow["inv1x1"]["w"], x)
        log_det_total = log_det_total + logdet * B
        half = x.shape[-1] // 2
        xa, xb = x[..., :half], x[..., half:]
        ls_t = wn_conditioner(flow["wn"], xa, cond, cfg)
        # WaveGlow channel split: first half is the shift t, second the log
        # scale (matters only for checkpoint conversion compatibility)
        t, log_s = ls_t[..., :half], ls_t[..., half:]
        xb = xb * jnp.exp(log_s) + t
        log_s_total = log_s_total + jnp.sum(log_s)
        x = jnp.concatenate([xa, xb], axis=-1)

    outputs.append(x)
    z = jnp.concatenate(outputs, axis=-1)
    return FlowOutput(z, log_s_total, log_det_total)


def loss(flow_out: FlowOutput, sigma: float = 1.0) -> jnp.ndarray:
    """Negative log-likelihood per element (WaveGlow objective)."""
    z, log_s_total, log_det_total = flow_out
    n = z.size
    return (jnp.sum(z * z) / (2 * sigma * sigma)
            - log_s_total - log_det_total) / n


def infer(params: Params, mel: jnp.ndarray, cfg: WaveGlowConfig,
          sigma: float = 0.666,
          key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Inference direction: z ~ N(0, sigma) -> audio. (B, T_mel, n_mel) ->
    (B, T_mel * stride). Fully parallel over time (one jitted pass)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    B = mel.shape[0]
    cond = upsample_mel(params, mel, cfg)
    t_groups = cond.shape[1]

    z = jax.random.normal(key, (B, t_groups, cfg.n_group)) * sigma
    # split z the same way forward() concatenated it: early chunks first
    early_flows = [i for i in range(cfg.n_flows)
                   if i % cfg.n_early_every == 0 and i > 0]
    n_early = len(early_flows)
    early_chunks = [z[..., k * cfg.n_early_size:(k + 1) * cfg.n_early_size]
                    for k in range(n_early)]
    x = z[..., n_early * cfg.n_early_size:]

    for i in reversed(range(cfg.n_flows)):
        flow = params["flows"][i]
        half = x.shape[-1] // 2
        xa, xb = x[..., :half], x[..., half:]
        ls_t = wn_conditioner(flow["wn"], xa, cond, cfg)
        t, log_s = ls_t[..., :half], ls_t[..., half:]
        xb = (xb - t) * jnp.exp(-log_s)
        x = jnp.concatenate([xa, xb], axis=-1)
        x = _inv1x1_inverse(flow["inv1x1"]["w"], x)
        if i % cfg.n_early_every == 0 and i > 0:
            k = early_flows.index(i)
            x = jnp.concatenate([early_chunks[k], x], axis=-1)

    return x.reshape(B, t_groups * cfg.n_group)
