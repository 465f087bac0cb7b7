"""HiFi-GAN vocoder (mel -> waveform), TPU-native.

Second vocoder family next to the flow vocoder (models/waveglow.py). The
reference repo ships only WaveGlow/nv-wavenet pointers (README.md:57-61);
HiFi-GAN (arXiv:2010.05646) is the modern replacement: a fully
convolutional non-autoregressive generator (orders of magnitude cheaper
than the 87M-param flow at inference) trained adversarially with
multi-period + multi-scale discriminators.

TPU-first choices:
- channels-last activations everywhere; every conv is one
  ``lax.conv_general_dilated`` that XLA tiles onto the MXU, with the leaky
  ReLUs fused into the surrounding convs by XLA;
- the generator is a static feed-forward stack — a single jitted pass
  vocodes an arbitrary (bucketed) mel batch, no sequential loop at all;
- discriminator "2D" period convs run channels-last NHWC with the period
  axis as W (width stays tiny, time is the tiled dim);
- weight norm is dropped (it is an optimizer-side reparametrization that
  complicates pjit sharding for no inference benefit); init follows the
  paper's N(0, 0.01).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.ops.layers import (avg_pool1d, conv1d, conv_transpose1d)

Params = Dict

LRELU_SLOPE = 0.1


class HiFiGANConfig(NamedTuple):
    n_mel_channels: int = 80
    # generator (V1 of the paper)
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    # discriminators
    mpd_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    msd_scales: int = 3

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


def receptive_field_frames(cfg: HiFiGANConfig) -> int:
    """One-sided receptive field of the generator in INPUT MEL FRAMES.

    An output sample at time t depends on mel frames
    [t/hop - R, t/hop + R] with R = this value; streaming synthesis uses it
    as the context margin for exact chunked vocoding. Computed by walking
    the network backward, converting the needed context to each stage's
    input resolution (conservative ceilings). Default V1 config -> 15.
    """
    # sequential residual units accumulate context; parallel MRF kernels max
    resblock_ctx = max(
        sum(d * (k - 1) // 2 + (k - 1) // 2 for d in dils)
        for k, dils in zip(cfg.resblock_kernel_sizes,
                           cfg.resblock_dilation_sizes))
    r = 3  # conv_post k=7 at output resolution
    for i in reversed(range(len(cfg.upsample_rates))):
        r += resblock_ctx  # resblock fan at this stage's output resolution
        k, s = cfg.upsample_kernel_sizes[i], cfg.upsample_rates[i]
        r = -(-r // s) + -(-k // s)  # ceil(r/s) + ceil(k/s)
    return r + 3  # conv_pre k=7 at mel resolution


def _leaky(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def _conv_p(key: jax.Array, k: int, cin: int, cout: int,
            std: float = 0.01) -> Params:
    return {"kernel": jax.random.normal(key, (k, cin, cout)) * std,
            "bias": jnp.zeros((cout,), jnp.float32)}


def _conv2d_p(key: jax.Array, kh: int, kw: int, cin: int, cout: int,
              std: float = 0.01) -> Params:
    return {"kernel": jax.random.normal(key, (kh, kw, cin, cout)) * std,
            "bias": jnp.zeros((cout,), jnp.float32)}


# -------------------------------------------------------------- generator

def init_generator(key: jax.Array, cfg: HiFiGANConfig) -> Params:
    n_up = len(cfg.upsample_rates)
    n_res = len(cfg.resblock_kernel_sizes)
    keys = iter(jax.random.split(
        key, 2 + n_up * (1 + n_res * 2 * max(len(d) for d in
                                             cfg.resblock_dilation_sizes))))
    nk = lambda: next(keys)

    params: Params = {
        "conv_pre": _conv_p(nk(), 7, cfg.n_mel_channels,
                            cfg.upsample_initial_channel)}
    ups, resblocks = [], []
    ch = cfg.upsample_initial_channel
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cout = ch // 2
        ups.append(_conv_p(nk(), k, ch, cout))
        stage = []
        for rk, dils in zip(cfg.resblock_kernel_sizes,
                            cfg.resblock_dilation_sizes):
            stage.append({
                "convs1": [_conv_p(nk(), rk, cout, cout) for _ in dils],
                "convs2": [_conv_p(nk(), rk, cout, cout) for _ in dils],
            })
        resblocks.append(stage)
        ch = cout
    params["ups"] = ups
    params["resblocks"] = resblocks
    params["conv_post"] = _conv_p(nk(), 7, ch, 1)
    return params


def _resblock(p: Params, x: jnp.ndarray, kernel: int,
              dilations: Sequence[int], compute_dtype=None) -> jnp.ndarray:
    """Multi-receptive-field residual unit (ResBlock1 of the paper):
    per dilation d, x += conv_k1(lrelu(conv_kd(lrelu(x))))."""
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = conv1d(c1, _leaky(x), dilation=d, compute_dtype=compute_dtype)
        xt = conv1d(c2, _leaky(xt), compute_dtype=compute_dtype)
        x = x + xt
    return x


def generator(params: Params, mel: jnp.ndarray, cfg: HiFiGANConfig,
              compute_dtype=None) -> jnp.ndarray:
    """(B, T_mel, n_mel) -> (B, T_mel * hop) waveform in (-1, 1).

    One fused feed-forward pass: transposed-conv upsampling stages, each
    followed by the averaged multi-receptive-field ResBlock fan."""
    x = mel
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    x = conv1d(params["conv_pre"], x, compute_dtype=compute_dtype)
    for i, up in enumerate(params["ups"]):
        x = conv_transpose1d(up, _leaky(x), stride=cfg.upsample_rates[i],
                             compute_dtype=compute_dtype)
        acc = None
        for rb, rk, dils in zip(params["resblocks"][i],
                                cfg.resblock_kernel_sizes,
                                cfg.resblock_dilation_sizes):
            y = _resblock(rb, x, rk, dils, compute_dtype=compute_dtype)
            acc = y if acc is None else acc + y
        x = acc / len(cfg.resblock_kernel_sizes)
    x = conv1d(params["conv_post"], _leaky(x), compute_dtype=compute_dtype)
    return jnp.tanh(x[..., 0]).astype(jnp.float32)


# ------------------------------------------------- multi-period discriminator

_MPD_CHANNELS = (32, 128, 512, 1024)


def init_mpd(key: jax.Array, cfg: HiFiGANConfig) -> List[Params]:
    out = []
    for p in cfg.mpd_periods:
        keys = iter(jax.random.split(jax.random.fold_in(key, p), 8))
        convs = []
        cin = 1
        for ch in _MPD_CHANNELS:
            convs.append(_conv2d_p(next(keys), 5, 1, cin, ch))
            cin = ch
        convs.append(_conv2d_p(next(keys), 5, 1, cin, 1024))
        out.append({"convs": convs,
                    "conv_post": _conv2d_p(next(keys), 3, 1, 1024, 1)})
    return out


def _conv2d(p: Params, x: jnp.ndarray, stride_h: int,
            pad_h: int) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(stride_h, 1),
        padding=[(pad_h, pad_h), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + p["bias"]


def mpd_apply(p: Params, audio: jnp.ndarray, period: int
              ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """One period discriminator. audio: (B, T) -> (logits, feature maps).
    Audio is reflect-padded to a multiple of ``period`` and viewed as a 2D
    (T/period, period) image with 1 channel."""
    B, T = audio.shape
    if T % period:
        pad = period - T % period
        audio = jnp.pad(audio, ((0, 0), (0, pad)), mode="reflect")
        T = T + pad
    x = audio.reshape(B, T // period, period, 1)
    fmaps = []
    for conv in p["convs"][:-1]:
        x = _leaky(_conv2d(conv, x, stride_h=3, pad_h=2))
        fmaps.append(x)
    x = _leaky(_conv2d(p["convs"][-1], x, stride_h=1, pad_h=2))
    fmaps.append(x)
    x = _conv2d(p["conv_post"], x, stride_h=1, pad_h=1)
    fmaps.append(x)
    return x.reshape(B, -1), fmaps


# -------------------------------------------------- multi-scale discriminator

# (kernel, stride, groups, channels) per conv of one scale discriminator
_MSD_SPEC = ((15, 1, 1, 128), (41, 2, 4, 128), (41, 2, 16, 256),
             (41, 4, 16, 512), (41, 4, 16, 1024), (41, 1, 16, 1024),
             (5, 1, 1, 1024))


def init_msd(key: jax.Array, cfg: HiFiGANConfig) -> List[Params]:
    out = []
    for s in range(cfg.msd_scales):
        keys = iter(jax.random.split(jax.random.fold_in(key, s),
                                     len(_MSD_SPEC) + 1))
        convs = []
        cin = 1
        for (k, _, groups, ch) in _MSD_SPEC:
            convs.append(_conv_p(next(keys), k, cin // groups, ch))
            cin = ch
        out.append({"convs": convs,
                    "conv_post": _conv_p(next(keys), 3, cin, 1)})
    return out


def msd_apply(p: Params, audio: jnp.ndarray
              ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """One scale discriminator over (B, T) raw audio."""
    x = audio[..., None]  # (B, T, 1)
    fmaps = []
    for conv, (k, stride, groups, _) in zip(p["convs"], _MSD_SPEC):
        x = _leaky(conv1d(conv, x, stride=stride, groups=groups,
                          padding=(k - 1) // 2))
        fmaps.append(x)
    x = conv1d(p["conv_post"], x, padding=1)
    fmaps.append(x)
    return x.reshape(x.shape[0], -1), fmaps


def discriminate(mpd_params: List[Params], msd_params: List[Params],
                 audio: jnp.ndarray, cfg: HiFiGANConfig
                 ) -> Tuple[List[jnp.ndarray], List[List[jnp.ndarray]]]:
    """Run every discriminator: MPD over each period, MSD over each
    downsampled scale. Returns (logits per D, feature maps per D)."""
    logits, fmaps = [], []
    for p, period in zip(mpd_params, cfg.mpd_periods):
        lg, fm = mpd_apply(p, audio, period)
        logits.append(lg)
        fmaps.append(fm)
    x = audio
    for s, p in enumerate(msd_params):
        if s > 0:
            x = avg_pool1d(x[..., None], 4, 2, padding=2)[..., 0]
        lg, fm = msd_apply(p, x)
        logits.append(lg)
        fmaps.append(fm)
    return logits, fmaps


# ------------------------------------------------------------------ losses

def discriminator_loss(real_logits: List[jnp.ndarray],
                       fake_logits: List[jnp.ndarray]) -> jnp.ndarray:
    """LSGAN objective: real -> 1, fake -> 0 (paper eq. 1)."""
    loss = jnp.zeros(())
    for dr, dg in zip(real_logits, fake_logits):
        loss = loss + jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_adversarial_loss(fake_logits: List[jnp.ndarray]) -> jnp.ndarray:
    loss = jnp.zeros(())
    for dg in fake_logits:
        loss = loss + jnp.mean((1.0 - dg) ** 2)
    return loss


def feature_matching_loss(real_fmaps: List[List[jnp.ndarray]],
                          fake_fmaps: List[List[jnp.ndarray]]) -> jnp.ndarray:
    """L1 between discriminator activations of real and generated audio
    (paper eq. 3; the reference implementation scales by 2)."""
    loss = jnp.zeros(())
    for fr_list, fg_list in zip(real_fmaps, fake_fmaps):
        for fr, fg in zip(fr_list, fg_list):
            loss = loss + jnp.mean(jnp.abs(fr - fg))
    return loss * 2.0
