"""Core NN primitives: dense, conv1d, batchnorm, dropout, masking.

TPU-native equivalents of the reference's ``LinearNorm``/``ConvNorm``
(/root/reference/layers.py:8-39) and the torch ``BatchNorm1d``/``F.dropout``
they compose with. Conventions:

- Activations are channels-last ``(B, T, C)`` — C maps onto the TPU lane
  dimension, and time-major matmuls hit the MXU.
- Dense kernels are ``(in, out)``; conv kernels ``(k, in, out)``.
- Everything is a pure function of (params, inputs); batchnorm returns its
  updated running statistics explicitly.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.ops import initializers

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------- dense

def dense_params(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True,
                 gain_for: str = "linear") -> Params:
    kkey, _ = jax.random.split(key)
    p = {"kernel": initializers.dense_init(kkey, in_dim, out_dim, gain_for)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def dense(params: Params, x: jnp.ndarray,
          compute_dtype=None) -> jnp.ndarray:
    """x: (..., in) -> (..., out).

    In mixed precision (compute_dtype=bf16) operands AND outputs are bf16 —
    the TPU MXU still accumulates in fp32 internally, and keeping the output
    dtype equal to the operand dtype keeps the conv/dot transpose rules
    well-typed under jax.grad. The fp32 bias-add upcasts immediately after.
    """
    kernel = params["kernel"]
    pet = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
        pet = compute_dtype
    y = jax.lax.dot_general(
        x, kernel,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=pet)
    if "bias" in params:
        y = y + params["bias"]
    return y


# ---------------------------------------------------------------- conv1d

def conv1d_params(key: jax.Array, kernel_size: int, in_ch: int, out_ch: int,
                  bias: bool = True, gain_for: str = "linear") -> Params:
    kkey, _ = jax.random.split(key)
    p = {"kernel": initializers.conv1d_init(kkey, kernel_size, in_ch, out_ch,
                                            gain_for)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv1d(params: Params, x: jnp.ndarray, *, padding: str = "SAME",
           dilation: int = 1, stride: int = 1, groups: int = 1,
           compute_dtype=None) -> jnp.ndarray:
    """x: (B, T, C_in) -> (B, T', C_out). 'SAME' matches the reference's
    auto pad = dilation * (k - 1) / 2 for odd k (layers.py:26-27).

    ``padding`` may also be an explicit pad count (int) or pair; ``groups``
    maps to XLA's feature_group_count (grouped convs, e.g. the HiFi-GAN
    multi-scale discriminator)."""
    kernel = params["kernel"]
    pet = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
        pet = compute_dtype
    if isinstance(padding, int):
        padding = [(padding, padding)]
    elif isinstance(padding, tuple):
        padding = [padding]
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=pet)
    if "bias" in params:
        y = y + params["bias"]
    return y


def conv_transpose1d(params: Params, x: jnp.ndarray, *, stride: int,
                     compute_dtype=None) -> jnp.ndarray:
    """Fractionally-strided conv with torch ConvTranspose1d semantics at
    padding=(k-stride)//2: (B, T, C_in) -> (B, T*stride, C_out). Kernel is
    (k, in, out). Used by vocoder upsampling stacks (HiFi-GAN generator);
    output length is exactly T*stride for k a multiple of stride."""
    kernel = params["kernel"]
    pet = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
        pet = compute_dtype
    k = kernel.shape[0]
    y = jax.lax.conv_transpose(
        x, kernel, strides=(stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=pet)
    # VALID gives (T-1)*stride + k; trim (k-stride)//2 each side -> T*stride
    pad = (k - stride) // 2
    y = y[:, pad:pad + x.shape[1] * stride]
    if "bias" in params:
        y = y + params["bias"]
    return y


def avg_pool1d(x: jnp.ndarray, window: int, stride: int,
               padding: int = 0) -> jnp.ndarray:
    """Torch AvgPool1d over (B, T, C) with count_include_pad=True."""
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, 1), (1, stride, 1), "VALID")
    return summed / window


# ------------------------------------------------------------- batchnorm

def batchnorm_params(num_features: int) -> Params:
    return {"scale": jnp.ones((num_features,), jnp.float32),
            "offset": jnp.zeros((num_features,), jnp.float32)}


def batchnorm_stats(num_features: int) -> Params:
    return {"mean": jnp.zeros((num_features,), jnp.float32),
            "var": jnp.ones((num_features,), jnp.float32)}


def batchnorm(params: Params, stats: Params, x: jnp.ndarray, *,
              training: bool, momentum: float = 0.1, eps: float = 1e-5,
              axis_name: Optional[str] = None,
              ) -> Tuple[jnp.ndarray, Params]:
    """Per-channel batchnorm over (B, T, C), torch BatchNorm1d semantics.

    Training uses batch statistics over (B, T) and returns updated running
    stats (torch momentum convention: new = (1-m)*old + m*batch, with the
    *unbiased* variance going into the running estimate). Note the reference
    never syncs batch stats across data-parallel replicas (distributed.py
    syncs only grads), so per-shard stats are the parity behavior; pass
    ``axis_name`` to opt into cross-replica stat averaging instead.
    """
    if training:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1))
        var = jnp.mean(jnp.square(x32 - mean), axis=(0, 1))
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            var = jax.lax.pmean(var, axis_name)
        n = x.shape[0] * x.shape[1]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * stats["mean"] + momentum * mean,
            "var": (1 - momentum) * stats["var"] + momentum * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = (x - mean) * inv + params["offset"]
    return y.astype(x.dtype), new_stats


# --------------------------------------------------------------- dropout

def dropout(key: Optional[jax.Array], x: jnp.ndarray, rate: float,
            deterministic: bool = False) -> jnp.ndarray:
    """Inverted dropout (torch F.dropout semantics: scale kept units by
    1/(1-rate) at train time)."""
    if deterministic or rate == 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


# ---------------------------------------------------------------- masking

def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) boolean mask, True at valid positions
    (reference utils.py:6-10)."""
    positions = jnp.arange(max_len)[None, :]
    return positions < lengths[:, None]
