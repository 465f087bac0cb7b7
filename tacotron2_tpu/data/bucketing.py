"""Static-shape length bucketing and batch assembly.

The reference controls sequence-length variance by sorting each batch
descending and padding to the batch max (dynamic shapes —
/root/reference/data_utils.py:73-111). Under XLA that would recompile per
batch; instead, every batch is padded to one of a small, fixed set of
(text_bucket, mel_bucket) shapes, bounding compile count while keeping
padding waste low. Gate targets are built exactly like the reference:
1.0 from each row's last real frame onward (data_utils.py:107).
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from tacotron2_tpu.config import Tacotron2Config


def text_bucket(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length (lengths beyond the last bucket clamp to
    it; callers should filter such items or extend the bucket list)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def mel_bucket(length: int, step: int, max_length: int) -> int:
    return min(step * math.ceil(length / step), max_length)


def pad_batch(items: List[Tuple[np.ndarray, np.ndarray]],
              t_text: int, t_mel: int, n_frames_per_step: int = 1,
              ) -> Tuple[np.ndarray, ...]:
    """Assemble padded arrays from (text_ids, mel(n_mels, T)) pairs.

    Returns (text, text_lengths, mel(B, T, n_mels), gate, mel_lengths) —
    note channels-last mel layout, unlike the reference's (B, n_mels, T).
    """
    if t_mel % n_frames_per_step:
        t_mel += n_frames_per_step - t_mel % n_frames_per_step
    B = len(items)
    n_mels = items[0][1].shape[0]
    text = np.zeros((B, t_text), np.int32)
    text_lengths = np.zeros((B,), np.int32)
    mel = np.zeros((B, t_mel, n_mels), np.float32)
    gate = np.zeros((B, t_mel), np.float32)
    mel_lengths = np.zeros((B,), np.int32)
    for i, (ids, m) in enumerate(items):
        L_t = min(len(ids), t_text)
        L_m = min(m.shape[1], t_mel)
        text[i, :L_t] = ids[:L_t]
        text_lengths[i] = L_t
        mel[i, :L_m] = m.T[:L_m]
        gate[i, L_m - 1:] = 1.0
        mel_lengths[i] = L_m
    return text, text_lengths, mel, gate, mel_lengths


class BucketSampler:
    """Groups dataset indices into fixed-shape batches.

    Items are binned by (text_bucket, mel_bucket); full bins of
    ``batch_size`` become batches. With ``drop_last`` (training), leftover
    partial bins are dropped, like the reference DataLoader's
    ``drop_last=True`` (train.py:55-58).
    """

    def __init__(self, lengths: Sequence[Tuple[int, int]],
                 config: Tacotron2Config, batch_size: Optional[int] = None,
                 drop_last: bool = True):
        self.lengths = list(lengths)  # (text_len, mel_len) per item
        self.config = config
        self.batch_size = batch_size or config.batch_size
        self.drop_last = drop_last

    def shape_of(self, index: int) -> Tuple[int, int]:
        t_len, m_len = self.lengths[index]
        return (text_bucket(t_len, self.config.text_buckets),
                mel_bucket(m_len, self.config.mel_bucket_step,
                           self.config.max_mel_length))

    def batches(self, epoch_rng: Optional[np.random.RandomState] = None,
                ) -> Iterator[Tuple[Tuple[int, int], List[int]]]:
        """Yields ((t_text, t_mel), item_indices) batches."""
        order = np.arange(len(self.lengths))
        if epoch_rng is not None:
            epoch_rng.shuffle(order)
        bins: dict = {}
        for idx in order:
            shape = self.shape_of(int(idx))
            bins.setdefault(shape, []).append(int(idx))
            if len(bins[shape]) == self.batch_size:
                yield shape, bins.pop(shape)
        if not self.drop_last:
            for shape, items in bins.items():
                yield shape, items

    def distinct_shapes(self) -> List[Tuple[int, int]]:
        return sorted({self.shape_of(i) for i in range(len(self.lengths))})
