"""ctypes bindings for the native audio library (wav I/O + resampling).

Replaces torchaudio/sox (reference ``valle/data/tokenizer.py:22,245-254``,
``valle/bin/infer.py:220,265``). Builds ``libvalle_audio.so`` on demand with
``make`` if missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libvalle_audio.so"
_lib = None


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("frames", ctypes.c_int64),
        ("format", ctypes.c_int32),
        ("bits", ctypes.c_int32),
    ]


def _build() -> None:
    subprocess.run(["make", "-C", str(_DIR)], check=True,
                   capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.valle_read_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(_WavInfo)]
    lib.valle_read_wav.restype = ctypes.c_int
    lib.valle_free.argtypes = [ctypes.c_void_p]
    lib.valle_write_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.valle_write_wav.restype = ctypes.c_int
    lib.valle_to_mono.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float)]
    lib.valle_resample_out_len.argtypes = [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
    lib.valle_resample_out_len.restype = ctypes.c_int64
    lib.valle_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ctypes.c_double, ctypes.c_double]
    lib.valle_resample.restype = ctypes.c_int
    _lib = lib
    return lib


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Returns (audio (frames, channels) float32, sample_rate)."""
    lib = get_lib()
    out = ctypes.POINTER(ctypes.c_float)()
    info = _WavInfo()
    rc = lib.valle_read_wav(str(path).encode(), ctypes.byref(out),
                            ctypes.byref(info))
    if rc != 0:
        raise IOError(f"failed to read wav {path!r} (code {rc})")
    n = info.frames * info.channels
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.valle_free(out)
    return arr.reshape(info.frames, info.channels), int(info.sample_rate)


def write_wav(path: str, audio: np.ndarray, sample_rate: int,
              bits: int = 16) -> None:
    """audio: (frames,) or (frames, channels) float32 in [-1, 1]."""
    lib = get_lib()
    a = np.ascontiguousarray(audio, dtype=np.float32)
    if a.ndim == 1:
        a = a[:, None]
    frames, channels = a.shape
    rc = lib.valle_write_wav(
        str(path).encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, channels, sample_rate, bits)
    if rc != 0:
        raise IOError(f"failed to write wav {path!r} (code {rc})")


def to_mono(audio: np.ndarray) -> np.ndarray:
    if audio.ndim == 1:
        return audio
    if audio.shape[1] == 1:
        return audio[:, 0]
    lib = get_lib()
    a = np.ascontiguousarray(audio, dtype=np.float32)
    out = np.empty((a.shape[0],), dtype=np.float32)
    lib.valle_to_mono(a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      a.shape[0], a.shape[1],
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def resample(audio: np.ndarray, sr_in: int, sr_out: int, *,
             zeros: int = 24, rolloff: float = 0.945,
             beta: float = 14.769656459379492) -> np.ndarray:
    """Mono windowed-sinc polyphase resample (julius-style defaults)."""
    if sr_in == sr_out:
        return np.asarray(audio, dtype=np.float32)
    lib = get_lib()
    a = np.ascontiguousarray(audio, dtype=np.float32)
    assert a.ndim == 1, "resample expects mono"
    n_out = lib.valle_resample_out_len(len(a), sr_in, sr_out)
    out = np.empty((n_out,), dtype=np.float32)
    rc = lib.valle_resample(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a), sr_in,
        sr_out, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        zeros, rolloff, beta)
    if rc != 0:
        raise RuntimeError(f"resample failed (code {rc})")
    return out


def convert_audio(audio: np.ndarray, sr_in: int, sr_out: int,
                  channels_out: int = 1) -> np.ndarray:
    """Mixdown + resample (parity with encodec.utils.convert_audio)."""
    mono = to_mono(audio)
    out = resample(mono, sr_in, sr_out)
    if channels_out == 1:
        return out
    return np.repeat(out[:, None], channels_out, axis=1)
