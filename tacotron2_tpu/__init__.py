"""tacotron2_tpu: a TPU-native Tacotron 2 framework built on JAX/XLA/Pallas.

Re-designed from scratch for TPU hardware with the full capability surface of
the NVIDIA/tacotron2 reference (text frontend, mel DSP, Tacotron 2 model,
teacher-forced training, data-parallel scaling, checkpointing, observability,
WaveGlow-style flow vocoder) — but idiomatic JAX: pure-functional models,
``lax.scan`` decoders, pjit/``jax.sharding`` parallelism, bf16 compute.
"""

__version__ = "0.1.0"

from tacotron2_tpu.config import Tacotron2Config, create_config

__all__ = ["Tacotron2Config", "create_config", "__version__"]
