"""Model zoo: Tacotron 2 acoustic model, WaveGlow-style flow vocoder,
HiFi-GAN vocoder."""

from tacotron2_tpu.models import tacotron2

__all__ = ["tacotron2"]
