"""Pallas TPU kernels (XLA-equivalent baselines live in the modules they fuse)."""

from tacotron2_tpu.kernels.mel_kernel import mel_spectrogram_pallas
from tacotron2_tpu.kernels.int8_matmul import int8_matmul, quantize_int8

__all__ = ["mel_spectrogram_pallas", "int8_matmul", "quantize_int8"]
