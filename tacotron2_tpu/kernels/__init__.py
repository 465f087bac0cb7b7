"""Pallas TPU kernels for the hot paths."""

from tacotron2_tpu.kernels.mel_kernel import mel_spectrogram_pallas

__all__ = ["mel_spectrogram_pallas"]
