"""Data pipeline: filelist datasets, bucketing, host prefetch."""

from tacotron2_tpu.data.bucketing import (
    BucketSampler, mel_bucket, pad_batch, text_bucket,
)
from tacotron2_tpu.data.dataset import (
    TextMelDataset, load_filelist, load_wav, mel_spectrogram_np,
)
from tacotron2_tpu.data.pipeline import DataPipeline, prefetch

__all__ = [
    "TextMelDataset", "load_filelist", "load_wav", "mel_spectrogram_np",
    "BucketSampler", "pad_batch", "text_bucket", "mel_bucket",
    "DataPipeline", "prefetch",
]
