"""ctypes bindings for the native DSP library (native/mel_extract.cc).

Loads ``libtaco_dsp.so`` if present (build with ``native/build.sh``) and
exposes WAV reading and log-mel extraction with the exact numerics of the
numpy/JAX paths. Falls back gracefully: ``available()`` is False when the
library hasn't been built, and callers use the numpy implementation.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Tuple

import numpy as np

from tacotron2_tpu.audio.mel import MelConfig

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "libtaco_dsp.so")

_lib = None
_lib_lock = threading.Lock()


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.taco_mel_init.restype = ctypes.c_void_p
        lib.taco_mel_init.argtypes = [ctypes.c_int] * 5 + [ctypes.c_double] * 2
        lib.taco_mel_free.argtypes = [ctypes.c_void_p]
        lib.taco_mel_frames.restype = ctypes.c_int
        lib.taco_mel_frames.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.taco_mel_extract.restype = ctypes.c_int
        lib.taco_mel_extract.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.taco_wav_read.restype = ctypes.c_int
        lib.taco_wav_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return lib


def available() -> bool:
    return _load() is not None


class NativeMelExtractor:
    """Thread-safe wrapper over one taco_mel context per config."""

    def __init__(self, cfg: MelConfig):
        lib = _load()
        if lib is None:
            raise RuntimeError("libtaco_dsp.so not built; run native/build.sh")
        self._lib = lib
        self._handle = lib.taco_mel_init(
            cfg.sampling_rate, cfg.filter_length, cfg.hop_length,
            cfg.win_length, cfg.n_mel_channels,
            float(cfg.mel_fmin), float(cfg.mel_fmax))
        if not self._handle:
            raise RuntimeError("taco_mel_init failed (n_fft power of two?)")
        self.cfg = cfg

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.taco_mel_free(self._handle)
            self._handle = None

    def extract(self, audio: np.ndarray) -> np.ndarray:
        """(T,) float32 in [-1, 1] -> (n_mels, frames) log-mel."""
        audio = np.ascontiguousarray(audio, np.float32)
        n_frames = self._lib.taco_mel_frames(self._handle, len(audio))
        out = np.empty((self.cfg.n_mel_channels, n_frames), np.float32)
        got = self._lib.taco_mel_extract(
            self._handle,
            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if got != n_frames:
            raise RuntimeError(f"native mel extraction failed ({got})")
        return out


def wav_read(path: str) -> Tuple[np.ndarray, int]:
    """WAV -> (float32 samples in raw int16 range, sample_rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libtaco_dsp.so not built")
    sr = ctypes.c_int(0)
    n = lib.taco_wav_read(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        raise IOError(f"cannot read wav {path}")
    out = np.empty((n,), np.float32)
    got = lib.taco_wav_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(sr))
    if got != n:
        raise IOError(f"short wav read {path}")
    return out, sr.value
