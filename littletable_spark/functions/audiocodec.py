"""Pure-stdlib/numpy WAV (RIFF/PCM) decoder for the multimodal pipeline.

The WAV container is public and trivially parseable (RIFF chunks,
Microsoft/IBM spec): ``fmt `` carries the sample format, ``data`` the
interleaved frames. Supports PCM uint8 / int16 / int32 (format tag 1)
and float32/float64 (format tag 3) — the formats real crawl audio
overwhelmingly arrives in once containerized audio is transcoded.
Compressed codecs (MP3/AAC/Opus) need ffmpeg and stay stubbed.

Like ``imagecodec``, everything here runs per-blob inside Arrow batches
on executors and imports only stdlib + numpy.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "wav_features"]


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE blob to (samples, sample_rate).

    ``samples`` is float64 in [-1, 1], shape (n_frames, n_channels).
    Raises ValueError on non-WAV or unsupported encodings.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _brate, _align, bits = fmt
    if audio_format == 0xFFFE and len(blob) >= 2:  # WAVE_FORMAT_EXTENSIBLE
        raise ValueError("WAVE_FORMAT_EXTENSIBLE not supported")
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(
            f"unsupported WAV format tag {audio_format} (PCM/float only; "
            "compressed audio needs ffmpeg)"
        )
    n_frames = len(x) // max(n_channels, 1)
    return x[: n_frames * n_channels].reshape(n_frames, n_channels), sample_rate


def wav_features(blob: bytes, n_points: int = 64) -> dict:
    """Decode + summarize one blob: rate/channels/duration, RMS, peak,
    zero-crossing rate, and an ``n_points`` nearest-neighbor waveform
    thumbnail of the channel-mean signal (the audio analogue of
    decode_image's fixed grid)."""
    samples, rate = decode_wav(blob)
    mono = samples.mean(axis=1) if samples.size else np.zeros(0)
    n = len(mono)
    if n == 0:
        wave = [0.0] * n_points
        rms = peak = zcr = 0.0
    else:
        idx = np.minimum((np.arange(n_points) * n) // n_points, n - 1)
        wave = mono[idx].tolist()
        rms = float(np.sqrt((mono**2).mean()))
        peak = float(np.abs(mono).max())
        zcr = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean()) if n > 1 else 0.0
    return {
        "sample_rate": int(rate),
        "n_channels": int(samples.shape[1]) if samples.size else 0,
        "n_frames": int(n),
        "duration": float(n / rate) if rate else 0.0,
        "rms": rms,
        "peak": peak,
        "zcr": zcr,
        "waveform": wave,
    }
