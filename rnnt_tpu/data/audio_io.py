"""Audio file IO without external dependencies.

WAV via the stdlib (the reference used tf.audio.decode_wav,
preprocessing.py:12-21); FLAC via our native C++ decoder
(rnnt_tpu/native — the soundfile replacement for LibriSpeech,
utils/data/librispeech.py:6-16), with a pure-Python fallback.

All readers return (float32 mono samples in [-1, 1], sample_rate).
"""

from __future__ import annotations

import struct
import wave
from typing import Tuple

import numpy as np


def read_wav(path) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV file (path or binary file-like object) ->
    (mono float32 [-1,1], sample_rate).

    Matches tf.audio.decode_wav semantics: int PCM scaled by 1/32768 (16-bit),
    multi-channel reduced to channel 0 (preprocessing.py:18-19).
    """
    with wave.open(path, "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        framerate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        val = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
               | (b[:, 2].astype(np.int32) << 16))
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        data = val.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels)[:, 0]
    return data, framerate


def write_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Write mono float32 [-1,1] samples as 16-bit PCM WAV."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Read a FLAC file via the native decoder (rnnt_tpu/native)."""
    from rnnt_tpu.native import flac as native_flac

    return native_flac.read_flac(path)


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    """Dispatch on extension (the librispeech path needs FLAC,
    librispeech.py:40; common voice uses converted WAVs, common_voice.py:15)."""
    lower = path.lower()
    if lower.endswith(".flac"):
        return read_flac(path)
    return read_wav(path)
