"""Pure-numpy WAV (RIFF PCM) codec + audio features.

The multimodal data model treats audio as an opaque binary column with
typed metadata (SURVEY §2.B image/media transforms, reference
``image/__init__.py`` analog).  This module makes the audio leg REAL
for the one container a header parse can handle without codec
libraries: RIFF/WAVE with integer PCM (8/16-bit), decoded with stdlib
``struct`` slicing + ``np.frombuffer``.  Compressed audio (mp3/aac)
stays behind the injectable-decoder seam in ``operators/multimodal.py``.

Features mirror what a corpus-curation pipeline filters on: duration,
RMS level, peak, zero-crossing rate — all deterministic integer/float
math, reproducible across platforms.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sniff_audio_format",
    "decode_wav",
    "encode_wav_pcm16",
    "audio_features",
]


def sniff_audio_format(payload: bytes | None) -> str | None:
    """'wav' | None from magic bytes."""
    if payload and len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → (samples float64 in [-1, 1] shaped (n, channels),
    sample_rate).  Supports format 1 (integer PCM) at 8 or 16 bits."""
    if sniff_audio_format(payload) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    n = len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise ValueError(f"only integer PCM supported (format {audio_format})")
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
        samples = raw.astype(np.float64) / 32768.0
    elif bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"PCM bit depth {bits} not supported")
    if channels > 1:
        samples = samples[: len(samples) // channels * channels].reshape(-1, channels)
    else:
        samples = samples.reshape(-1, 1)
    return samples, sample_rate


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples shaped (n,) or (n, channels) → RIFF/WAVE bytes
    (the test/round-trip twin of :func:`decode_wav`)."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a.reshape(-1, 1)
    n, channels = a.shape
    data = a.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Deterministic per-clip features over channel-averaged samples:
    n_samples, duration_ms (floor), rms, peak, zero-crossing count."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = int(mono.shape[0])
    if n == 0:
        return {"n_samples": 0, "duration_ms": 0, "rms": 0.0, "peak": 0.0, "zero_crossings": 0}
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.max(np.abs(mono)))
    signs = mono >= 0
    zc = int(np.count_nonzero(signs[1:] != signs[:-1]))
    return {
        "n_samples": n,
        "duration_ms": int(n * 1000 // sample_rate),
        "rms": rms,
        "peak": peak,
        "zero_crossings": zc,
    }
