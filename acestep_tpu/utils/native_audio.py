"""ctypes bindings for the native audio kernels (native/acestep_audio.cpp).

Builds `libacestep_audio.so` on first use (g++); every entry point falls back
to numpy/scipy when the native library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lib = None
_lib_lock = threading.Lock()
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


# Every symbol this binding configures; a stale .so built before a symbol
# existed must trigger a rebuild, not an AttributeError in the save path.
_REQUIRED_SYMBOLS = (
    "as_peak", "as_f32_to_i16", "as_i16_to_f32", "as_resample_poly",
    "as_flac_encode", "as_flac_probe", "as_flac_decode",
    "as_bf16_chunk_to_i16",
)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        so = os.path.join(_NATIVE_DIR, "libacestep_audio.so")

        def rebuild() -> bool:
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
                )
                return True
            except Exception:
                return False

        def open_checked():
            lib = ctypes.CDLL(so)
            for sym in _REQUIRED_SYMBOLS:
                getattr(lib, sym)  # AttributeError when the .so is stale
            return lib

        if not os.path.exists(so) and not rebuild():
            _lib = False  # sentinel: don't retry
            return None
        try:
            try:
                lib = open_checked()
            except (OSError, AttributeError):
                # stale or broken build — rebuild once from current sources
                try:
                    os.remove(so)
                except OSError:
                    pass
                if not rebuild():
                    _lib = False
                    return None
                lib = open_checked()
            lib.as_peak.restype = ctypes.c_float
            lib.as_peak.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.as_f32_to_i16.restype = None
            lib.as_f32_to_i16.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_int16),
            ]
            lib.as_i16_to_f32.restype = None
            lib.as_i16_to_f32.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.as_resample_poly.restype = ctypes.c_int64
            lib.as_resample_poly.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ]
            lib.as_flac_encode.restype = ctypes.c_int64
            lib.as_flac_encode.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
            lib.as_flac_probe.restype = ctypes.c_int64
            lib.as_flac_probe.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.as_flac_decode.restype = ctypes.c_int64
            lib.as_flac_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.as_bf16_chunk_to_i16.restype = None
            lib.as_bf16_chunk_to_i16.argtypes = [
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int,
            ]
            _lib = lib
            return lib
        except (OSError, AttributeError):
            _lib = False
            return None


def available() -> bool:
    return _load() is not None


def peak(x: np.ndarray) -> float:
    lib = _load()
    xf = np.ascontiguousarray(x, np.float32)
    if lib is None:
        return float(np.max(np.abs(xf))) if xf.size else 0.0
    return float(lib.as_peak(xf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), xf.size))


def f32_to_i16(audio: np.ndarray, target_gain: float = -1.0) -> np.ndarray:
    """(ch, n) float planar → (n, ch) int16 interleaved, normalized to target_gain."""
    lib = _load()
    a = np.ascontiguousarray(audio, np.float32)
    ch, n = a.shape
    if lib is None:
        pk = float(np.max(np.abs(a))) if a.size else 0.0
        if target_gain > 0 and pk > 1e-9:
            scale = target_gain / pk
        elif pk > 1.0:
            scale = 1.0 / pk
        else:
            scale = 1.0
        return np.round(np.clip(a.T * scale, -1, 1) * 32767).astype(np.int16)
    out = np.empty((n, ch), np.int16)
    lib.as_f32_to_i16(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, ch,
        ctypes.c_float(target_gain), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out


def i16_to_f32(pcm: np.ndarray) -> np.ndarray:
    """(n, ch) int16 interleaved → (ch, n) float planar."""
    lib = _load()
    p = np.ascontiguousarray(pcm, np.int16)
    n, ch = p.shape
    if lib is None:
        return (p.T.astype(np.float32)) / 32768.0
    out = np.empty((ch, n), np.float32)
    lib.as_i16_to_f32(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n, ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def bf16_chunk_to_i16(
    chunk: np.ndarray, scale: np.ndarray, out: np.ndarray, pos: int, take: int
) -> bool:
    """One decoded VAE chunk, bf16 (b, lc, ch) interleaved → scaled int16 PCM
    written into `out` (b, ch, total) at time offset `pos`.

    Fuses bf16→f32 + per-sample scale + clip + round-half-even quantize +
    the (b, lc, ch)→(b, ch, lc) transpose in one C++ pass (the numpy
    equivalent is ~5 full-array passes — real wall time on a small serving
    host). Returns False when the native library is unavailable or the input
    isn't a contiguous 2-byte-per-element array; callers keep the numpy path.
    """
    lib = _load()
    if lib is None:
        return False
    if chunk.ndim != 3 or chunk.dtype.name != "bfloat16":
        return False
    b, lc, ch = chunk.shape
    isz = chunk.dtype.itemsize
    # Logical shape is (b, lc, ch); the TPU runtime exports bf16 waveforms in
    # channel-major physical layout (strides say (b, ch, lc) planar) — detect
    # either dense layout and tell the kernel which walk to use.
    if chunk.strides == (lc * ch * isz, ch * isz, isz):
        planar = 0
    elif chunk.strides == (lc * ch * isz, isz, lc * isz):
        planar = 1
    else:
        return False
    take = int(min(take, lc))
    total = out.shape[2]
    if (
        out.shape[0] != b or out.shape[1] != ch or out.dtype != np.int16
        or not out.flags.c_contiguous or pos < 0 or pos + take > total
    ):
        return False
    sc = np.ascontiguousarray(scale.reshape(-1), np.float32)
    if sc.shape[0] != b:
        return False
    lib.as_bf16_chunk_to_i16(
        chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), b, lc, take, ch,
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), total, pos, planar,
    )
    return True


def flac_encode(pcm: np.ndarray, sample_rate: int = 48_000) -> Optional[bytes]:
    """Interleaved int16 (n, ch) → a complete FLAC stream (lossless; fixed
    predictors + Rice coding — native/acestep_audio.cpp as_flac_encode).
    Returns None when the native library is unavailable (callers fall back to
    ffmpeg or WAV)."""
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(pcm, np.int16)
    n, ch = p.shape
    cap = int(n * ch * 2 * 1.2) + 16384
    out = np.empty(cap, np.uint8)
    got = lib.as_flac_encode(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n, ch,
        int(sample_rate), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
    )
    if got <= 0:
        return None
    return out[:got].tobytes()


def flac_decode(blob: bytes):
    """FLAC stream → ((channels, samples) int32, sample_rate, bps) via the
    native decoder (full frame grammar). Returns None when the library is
    unavailable or the stream is malformed (callers fall back to the pure-
    Python decoder, which is ~100x slower but identical in coverage)."""
    lib = _load()
    if lib is None:
        return None
    data = np.frombuffer(blob, np.uint8)
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    bps = ctypes.c_int32()
    total = ctypes.c_int64()
    off = lib.as_flac_probe(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(blob),
        ctypes.byref(ch), ctypes.byref(sr), ctypes.byref(bps), ctypes.byref(total),
    )
    if off < 0 or total.value <= 0 or not (1 <= ch.value <= 8):
        return None
    # STREAMINFO is untrusted: a crafted/corrupt total_samples must not turn
    # into a huge allocation. Even all-constant frames cost ~17 bytes per
    # 4096×ch samples (≈500 samples/byte at stereo, ~780 at 8ch) — bound
    # decoded size by a generous multiple of the stream size instead of
    # trusting the header (2048 caps a 1 KB header at an 8 MB buffer).
    if total.value * ch.value > max(len(blob), 4096) * 2048:
        return None
    out = np.empty((total.value, ch.value), np.int32)
    got = lib.as_flac_decode(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(blob),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if got != total.value:
        return None
    return out.T, int(sr.value), int(bps.value)


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """(ch, n) planar float resampling."""
    if sr_in == sr_out:
        return audio
    lib = _load()
    a = np.ascontiguousarray(audio, np.float32)
    ch, n = a.shape
    if lib is None:
        from math import gcd

        from scipy.signal import resample_poly

        g = gcd(sr_in, sr_out)
        return resample_poly(a, sr_out // g, sr_in // g, axis=1).astype(np.float32)
    out_cap = int(np.ceil(n * sr_out / sr_in)) + 8
    out = np.zeros((ch, out_cap), np.float32)
    got = lib.as_resample_poly(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, ch, sr_in, sr_out,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[:, :got]
