"""Audio/DSP frontend: STFT, mel extraction, Griffin-Lim."""

from tacotron2_tpu.audio.mel import (
    MelConfig, dynamic_range_compression, dynamic_range_decompression,
    mel_spectrogram,
)
from tacotron2_tpu.audio.stft import STFTConfig, griffin_lim, istft, stft

__all__ = [
    "MelConfig", "STFTConfig", "mel_spectrogram", "stft", "istft",
    "griffin_lim", "dynamic_range_compression", "dynamic_range_decompression",
]
