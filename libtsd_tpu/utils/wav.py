"""WAV file I/O: one-shot load/save and streaming reader/writer.

Parity: core/include/tsd/wav.hpp:17-107, core/src/wav.cc:66-537
(mono/stereo, PCM16 + float32, chunked streaming).
"""
from __future__ import annotations

import struct
import wave
from typing import Optional, Tuple

import numpy as np

__all__ = ["wav_load", "wav_save", "WavReader", "WavWriter"]


def wav_load(path: str) -> Tuple[np.ndarray, int]:
    """Load a WAV file -> (samples float32 in [-1,1], sample_rate).
    Stereo files return shape (n, 2) (parity: wav_charge)."""
    with open(path, "rb") as f:
        header = f.read(12)
        if header[:4] != b"RIFF" or header[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        fmt = None
        data = None
        while True:
            chunk = f.read(8)
            if len(chunk) < 8:
                break
            cid, size = chunk[:4], struct.unpack("<I", chunk[4:])[0]
            payload = f.read(size + (size & 1))[:size]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", payload[:16])
            elif cid == b"data":
                data = payload
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        audio_fmt, nchan, rate, _, _, bits = fmt
        if audio_fmt == 3 and bits == 32:
            x = np.frombuffer(data, np.float32).astype(np.float32)
        elif audio_fmt == 1 and bits == 16:
            x = np.frombuffer(data, np.int16).astype(np.float32) / 32768.0
        elif audio_fmt == 1 and bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128) / 128.0
        else:
            raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}bit")
        if nchan > 1:
            x = x.reshape(-1, nchan)
        return x, rate


def wav_save(path: str, x: np.ndarray, rate: int = 44100,
             dtype: str = "int16"):
    """Save samples to WAV (parity: wav_enregistre).  x in [-1,1];
    shape (n,) mono or (n, 2) stereo."""
    x = np.asarray(x)
    nchan = 1 if x.ndim == 1 else x.shape[1]
    if dtype == "int16":
        data = np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
        audio_fmt, bits = 1, 16
    elif dtype == "float32":
        data = x.astype("<f4").tobytes()
        audio_fmt, bits = 3, 32
    else:
        raise ValueError("dtype must be int16 or float32")
    byte_rate = rate * nchan * bits // 8
    block = nchan * bits // 8
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, audio_fmt, nchan,
                                      rate, byte_rate, block, bits))
        f.write(b"data" + struct.pack("<I", len(data)))
        f.write(data)


class WavReader:
    """Chunked streaming reader (parity: WavLecteur, wav.cc)."""

    def __init__(self, path: str):
        self._x, self.rate = wav_load(path)
        self._pos = 0

    @property
    def nsamples(self) -> int:
        return len(self._x)

    def read(self, n: int) -> np.ndarray:
        out = self._x[self._pos:self._pos + n]
        self._pos += len(out)
        return out

    @property
    def eof(self) -> bool:
        return self._pos >= len(self._x)


class WavWriter:
    """Chunked streaming writer (parity: WavEcrivain, wav.cc)."""

    def __init__(self, path: str, rate: int = 44100, dtype: str = "int16"):
        self.path = path
        self.rate = rate
        self.dtype = dtype
        self._chunks = []

    def write(self, x: np.ndarray):
        self._chunks.append(np.asarray(x))

    def close(self):
        data = np.concatenate(self._chunks) if self._chunks else \
            np.zeros(0, np.float32)
        wav_save(self.path, data, self.rate, self.dtype)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
