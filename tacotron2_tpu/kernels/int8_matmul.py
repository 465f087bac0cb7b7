"""Pallas TPU kernel: int8 weight-only matmul for serving.

B=1 autoregressive decoding is HBM-bandwidth-bound on the decoder weight
stream (~36 MB/step in bf16 — PERFORMANCE.md roofline). Storing the LSTM
weights as int8 halves that stream; the catch is that a naive XLA
``x @ (w_q.astype(bf16) * scale)`` materializes the dequantized matrix in
HBM and is SLOWER than bf16 (measured, PERFORMANCE.md). This kernel
dequantizes INSIDE the weight stream: each (K, BLOCK_N) int8 tile is
DMA'd HBM->VMEM by the Pallas pipeline (that's the halved traffic),
converted to bf16 in VMEM, fed to the MXU against the activation row
block, and scaled per output channel after the dot. The dequantized tile
never exists outside VMEM.

Quantization is symmetric per-output-channel absmax (scale = absmax/127),
the standard weight-only recipe: activations stay bf16, accumulation fp32.
No custom VJP — this is an inference-only path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 512
_SUBLANE = 8  # fp32 row-tile granularity


def quantize_int8(w: jnp.ndarray):
    """(K, N) float weights -> (w_q int8 (K, N), scale fp32 (N,)).

    Symmetric per-output-channel: w ~= w_q * scale[None, :].
    """
    w = np.asarray(w, np.float32)
    absmax = np.abs(w).max(axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    w_q = np.clip(np.rint(w / scale[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(w_q), jnp.asarray(scale)


def _kernel(x_ref, wq_ref, scale_ref, out_ref):
    w = wq_ref[:].astype(jnp.bfloat16)          # int8 tile -> bf16 in VMEM
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    out_ref[:] = acc * scale_ref[0]             # per-channel dequant scale


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                *, interpret: bool = False) -> jnp.ndarray:
    """x (B, K) float  @  dequant(w_q (K, N) int8, scale (N,))  -> (B, N) f32.

    All dims are padded to their tile granularity internally (exact:
    zero rows / unit scales are no-ops in the product).
    """
    B, K = x.shape
    Kw, N = w_q.shape
    assert K == Kw, (K, Kw)

    # pad every dim to its tile granularity (int8: 32-row sublanes;
    # lanes: 128); zero rows/unit scales are exact no-ops in the product
    K_pad = -(-K // 32) * 32
    N_pad = -(-N // 128) * 128
    if K_pad != K:
        x = jnp.pad(x, ((0, 0), (0, K_pad - K)))
        w_q = jnp.pad(w_q, ((0, K_pad - K), (0, 0)))
    block_n = min(BLOCK_N, N_pad)
    N_pad = -(-N_pad // block_n) * block_n  # grid needs block_n | N_pad
    if N_pad != N:
        w_q = jnp.pad(w_q, ((0, 0), (0, N_pad - N)))
        scale = jnp.pad(scale, (0, N_pad - N), constant_values=1.0)

    B_pad = -(-B // _SUBLANE) * _SUBLANE
    if B_pad != B:
        x = jnp.pad(x, ((0, B_pad - B), (0, 0)))
    N_out, (K, N) = N, (K_pad, N_pad)

    out = pl.pallas_call(
        _kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((B_pad, K), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_pad, block_n), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * K * N,
            bytes_accessed=K * N + 4 * (B_pad * (K + N) + N),
            transcendentals=0),
        interpret=interpret,
    )(x.astype(jnp.float32), w_q, scale.reshape(1, N))
    return out[:B, :N_out]
