"""Host-side audio I/O: save/normalize/resample (CPU work, no torch).

Replaces the reference's `audio_utils.py` AudioSaver (torchaudio/ffmpeg) with
scipy + stdlib; ffmpeg is used for compressed formats when available.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import uuid as _uuid
import wave
from typing import Any, Dict, Optional

import numpy as np


def peak_normalize(audio: np.ndarray, target_db: float = -1.0) -> np.ndarray:
    """Scale so the peak sits at target_db dBFS (ref audio_utils.normalize_audio)."""
    peak = float(np.max(np.abs(audio)))
    if peak <= 0:
        return audio
    target = 10.0 ** (target_db / 20.0)
    return audio * (target / peak)


def clip_guard(audio: np.ndarray) -> np.ndarray:
    """Divide by the peak only if it exceeds 1.0 (ref generate_music_decode)."""
    peak = float(np.max(np.abs(audio)))
    return audio / peak if peak > 1.0 else audio


def resample(audio: np.ndarray, sr_in: int, sr_out: int, axis: int = -1) -> np.ndarray:
    if sr_in == sr_out:
        return audio
    if axis in (-1, audio.ndim - 1) and audio.ndim == 2:
        # Native polyphase resampler (native/acestep_audio.cpp) when built.
        from acestep_tpu.utils import native_audio

        if native_audio.available():
            return native_audio.resample(audio.astype(np.float32), sr_in, sr_out)
    from scipy.signal import resample_poly
    from math import gcd

    g = gcd(sr_in, sr_out)
    return resample_poly(audio, sr_out // g, sr_in // g, axis=axis)


def to_stereo(audio: np.ndarray) -> np.ndarray:
    """(C, L) or (L,) → (2, L)."""
    if audio.ndim == 1:
        audio = audio[None]
    if audio.shape[0] == 1:
        audio = np.concatenate([audio, audio], axis=0)
    return audio[:2]


def save_wav(path: str, audio: np.ndarray, sample_rate: int = 48_000) -> str:
    """Save (C, L) audio (float in [-1,1] or int16 PCM) as 16-bit WAV via stdlib."""
    if audio.dtype == np.int16:
        pcm = audio.T
    else:
        audio = np.clip(audio, -1.0, 1.0)
        pcm = (audio.T * 32767.0).astype(np.int16)  # (L, C)
    with wave.open(path, "wb") as w:
        w.setnchannels(pcm.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return path


def wav_header(n_frames: int, channels: int = 2, sample_rate: int = 48_000,
               sampwidth: int = 2) -> bytes:
    """44-byte RIFF/PCM WAV header for a stream of known length.

    Progressive delivery (`/v1/generate_stream`) knows the exact sample count
    before the first decode chunk arrives (static latent shape × hop), so the
    response can carry a complete, correct header + Content-Length up front
    and stream PCM frames behind it — any WAV client can play it as it
    arrives. Byte-identical to the stdlib `wave` module's output for the same
    parameters (pinned by test)."""
    import struct

    data_bytes = n_frames * channels * sampwidth
    byte_rate = sample_rate * channels * sampwidth
    return b"".join([
        b"RIFF", struct.pack("<I", 36 + data_bytes), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                             byte_rate, channels * sampwidth, sampwidth * 8),
        b"data", struct.pack("<I", data_bytes),
    ])


def _ffmpeg() -> Optional[str]:
    return shutil.which("ffmpeg")


def save_audio(
    path_base: str,
    audio: np.ndarray,  # (C, L) float in [-1, 1]
    sample_rate: int = 48_000,
    fmt: str = "flac",
) -> str:
    """Save audio in the requested format; falls back to WAV without ffmpeg."""
    fmt = fmt.lower()
    if fmt in ("wav", "wav16"):
        return save_wav(path_base + ".wav", audio, sample_rate)
    if fmt == "wav32":
        from scipy.io import wavfile

        f32 = audio.T.astype(np.float32)
        if audio.dtype == np.int16:
            f32 = f32 / 32767.0
        wavfile.write(path_base + ".wav", sample_rate, f32)
        return path_base + ".wav"

    if fmt == "flac":
        # Native lossless encoder (no ffmpeg/torchaudio dependency) — FLAC is
        # the reference's DEFAULT output format (AudioSaver default_format).
        from acestep_tpu.utils import native_audio

        if audio.dtype == np.int16:
            pcm = np.ascontiguousarray(audio.T)
        else:
            pcm = np.round(np.clip(audio, -1.0, 1.0).T * 32767.0).astype(np.int16)
        blob = native_audio.flac_encode(pcm, sample_rate)
        if blob is not None:
            with open(path_base + ".flac", "wb") as f:
                f.write(blob)
            return path_base + ".flac"

    ff = _ffmpeg()
    if ff is None:
        return save_wav(path_base + ".wav", audio, sample_rate)
    tmp = path_base + ".tmp.wav"
    save_wav(tmp, audio, sample_rate)
    codec = {"flac": [], "mp3": ["-b:a", "320k"], "opus": ["-b:a", "128k"], "aac": ["-b:a", "256k"]}
    out = f"{path_base}.{fmt}"
    try:
        subprocess.run(
            [ff, "-y", "-loglevel", "error", "-i", tmp, *codec.get(fmt, []), out],
            check=True,
        )
        os.remove(tmp)
        return out
    except Exception:
        os.replace(tmp, path_base + ".wav")
        return path_base + ".wav"


def load_audio(path: str, target_sr: int = 48_000) -> np.ndarray:
    """Load audio file → (2, L) float32 at target_sr. WAV natively; else ffmpeg."""
    if path.lower().endswith(".wav"):
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        else:
            data = data.astype(np.float32)
        audio = data.T if data.ndim == 2 else data[None]
    elif path.lower().endswith(".flac") and _ffmpeg() is None:
        # FLAC decode without ffmpeg: native C++ decoder (full frame
        # grammar), pure-Python fallback when the library isn't built.
        from acestep_tpu.utils import flac as _flac, native_audio

        with open(path, "rb") as f:
            blob = f.read()
        got = native_audio.flac_decode(blob)
        if got is None:
            got = _flac.decode(blob)
        pcm, sr, bps = got
        audio = pcm.astype(np.float32) / float(1 << (bps - 1))
    else:
        ff = _ffmpeg()
        if ff is None:
            raise RuntimeError(f"ffmpeg required to load {path}")
        proc = subprocess.run(
            [ff, "-loglevel", "error", "-i", path, "-f", "f32le", "-ac", "2",
             "-ar", str(target_sr), "pipe:1"],
            check=True,
            capture_output=True,
        )
        audio = np.frombuffer(proc.stdout, np.float32).reshape(-1, 2).T
        return to_stereo(audio)
    audio = to_stereo(audio)
    if sr != target_sr:
        audio = resample(audio, sr, target_sr, axis=1).astype(np.float32)
    return audio


def is_silence(audio: np.ndarray, threshold_db: float = -60.0) -> bool:
    """True when peak level is below threshold_db dBFS (ref handler is_silence)."""
    peak = float(np.max(np.abs(audio))) if audio.size else 0.0
    if peak <= 0:
        return True
    return 20.0 * np.log10(peak) < threshold_db


def deterministic_uuid(params: Dict[str, Any]) -> str:
    """Stable UUID from generation params (ref audio_utils.py:393)."""
    blob = json.dumps(params, sort_keys=True, default=str).encode()
    return str(_uuid.UUID(hashlib.md5(blob).hexdigest()))
