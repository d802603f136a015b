"""Native FLAC encoder ↔ pure-Python decoder round-trip.

The C++ encoder (`native/acestep_audio.cpp as_flac_encode`) and the Python
decoder (`acestep_tpu/utils/flac.py`) were written independently from the
public FLAC format spec — bit-exact round-trips through both are strong
evidence each implements the format, not each other's bugs. FLAC is the
reference's DEFAULT output format (AudioSaver default_format='flac'), served
here without ffmpeg/torchaudio.
"""

import os

import numpy as np
import pytest

from acestep_tpu.utils import flac, native_audio
from acestep_tpu.utils.audio import load_audio, save_audio

pytestmark = pytest.mark.skipif(
    not native_audio.available(), reason="native library unavailable"
)


def _roundtrip(pcm: np.ndarray, sr: int = 48_000) -> np.ndarray:
    blob = native_audio.flac_encode(pcm, sr)
    assert blob is not None
    assert blob[:4] == b"fLaC"
    dec, got_sr, bps = flac.decode(blob)
    assert got_sr == sr
    assert bps == 16
    assert dec.shape == (pcm.shape[1], pcm.shape[0])
    return dec.T.astype(np.int16), blob


def test_roundtrip_stereo_noise_and_tones():
    rng = np.random.default_rng(0)
    n = 48_000 * 3 + 1234  # multi-block + partial last block
    t = np.arange(n) / 48_000
    left = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    right = 0.3 * np.sin(2 * np.pi * 523.25 * t) + 0.05 * rng.standard_normal(n)
    pcm = np.stack([left, right], axis=1)
    pcm = np.clip(pcm * 32767, -32768, 32767).astype(np.int16)
    dec, blob = _roundtrip(pcm)
    np.testing.assert_array_equal(dec, pcm)
    # Tonal+noise audio must still compress (fixed predictors + Rice)
    assert len(blob) < pcm.nbytes


def test_roundtrip_hard_cases():
    rng = np.random.default_rng(1)
    cases = [
        np.zeros((4096, 2), np.int16),                        # constant (silence)
        np.full((5000, 2), -32768, np.int16),                 # constant extreme
        rng.integers(-32768, 32768, (9000, 2)).astype(np.int16),  # white noise (escape path)
        np.tile(np.int16([32767, -32768]), (3, 1)).T.reshape(-1, 1)[:4097].reshape(-1, 1),  # alternating, mono, partial
        rng.integers(-3, 4, (300, 2)).astype(np.int16),       # tiny stream < one block
    ]
    for pcm in cases:
        pcm = np.ascontiguousarray(pcm)
        dec, _ = _roundtrip(pcm)
        np.testing.assert_array_equal(dec, pcm)


def test_roundtrip_mono_and_low_rate():
    rng = np.random.default_rng(2)
    ramp = np.cumsum(rng.integers(-50, 51, (20_000, 1)), axis=0).astype(np.int16)
    dec, _ = _roundtrip(np.ascontiguousarray(ramp), sr=16_000)
    np.testing.assert_array_equal(dec, ramp)


def test_save_and_load_flac_without_ffmpeg(tmp_path):
    """save_audio(fmt='flac') must produce real FLAC in this ffmpeg-less
    environment, and load_audio must read it back losslessly."""
    rng = np.random.default_rng(3)
    n = 48_000
    wav = np.clip(
        0.5 * np.sin(2 * np.pi * 220 * np.arange(n) / 48_000)
        + 0.02 * rng.standard_normal(n), -1, 1
    ).astype(np.float32)
    audio = np.stack([wav, -wav])
    path = save_audio(str(tmp_path / "x"), audio, 48_000, fmt="flac")
    assert path.endswith(".flac"), "fell back to WAV despite the native encoder"
    assert os.path.getsize(path) < audio.shape[1] * 4  # smaller than int16 raw

    back = load_audio(path, target_sr=48_000)
    assert back.shape == audio.shape
    # int16 quantization (round at *32767, load at /32768) is the only loss
    np.testing.assert_allclose(back, audio, atol=1.2 / 32768.0)


def test_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        flac.decode(b"RIFFxxxxWAVE")


def test_native_decoder_matches_python_decoder():
    """The C++ decoder (ingest path) must agree sample-for-sample with the
    pure-Python decoder (test oracle) on every content class — both written
    independently from the spec."""
    rng = np.random.default_rng(5)
    cases = []
    n = 30_000
    t = np.arange(n)
    smooth = 8000 * np.sin(2 * np.pi * t / 97)
    cases.append(np.stack([smooth, 0.95 * smooth + rng.normal(0, 10, n)], 1))  # mid/side
    cases.append(rng.integers(-32768, 32768, (n, 2)))                          # escape
    cases.append(np.cumsum(rng.integers(-30, 31, (n, 1)), axis=0))             # mono ramp
    for pcm in cases:
        pcm = np.ascontiguousarray(np.clip(pcm, -32768, 32767).astype(np.int16))
        blob = native_audio.flac_encode(pcm, 48_000)
        native = native_audio.flac_decode(blob)
        assert native is not None
        n_pcm, n_sr, n_bps = native
        p_pcm, p_sr, p_bps = flac.decode(blob)
        assert (n_sr, n_bps) == (p_sr, p_bps) == (48_000, 16)
        np.testing.assert_array_equal(n_pcm, p_pcm)
        np.testing.assert_array_equal(n_pcm.T.astype(np.int16), pcm)


def test_native_decoder_rejects_garbage():
    assert native_audio.flac_decode(b"RIFFxxxxWAVE....") is None
    assert native_audio.flac_decode(b"fLaC" + b"\x00" * 3) is None
    # truncated valid stream must fail cleanly, not crash
    pcm = np.ascontiguousarray(
        np.clip(np.random.default_rng(0).normal(0, 3000, (5000, 2)), -32768, 32767
                ).astype(np.int16))
    blob = native_audio.flac_encode(pcm, 48_000)
    assert native_audio.flac_decode(blob[: len(blob) // 2]) is None


def test_roundtrip_property_fuzz():
    """20 randomized cases over length/channels/sample-rate/content mix —
    every one must round-trip bit-exactly."""
    rng = np.random.default_rng(42)
    for case in range(20):
        n = int(rng.integers(16, 20_000))
        ch = int(rng.integers(1, 3))
        sr = int(rng.choice([8_000, 16_000, 44_100, 48_000]))
        kind = case % 4
        if kind == 0:  # smooth (good predictor fit)
            t = np.arange(n)
            base = 8000 * np.sin(2 * np.pi * t / max(50, n // 7))
            pcm = np.stack([base + rng.normal(0, 30, n) for _ in range(ch)], 1)
        elif kind == 1:  # white noise (escape / high rice params)
            pcm = rng.integers(-32768, 32768, (n, ch))
        elif kind == 2:  # near-constant with spikes
            pcm = np.full((n, ch), int(rng.integers(-100, 100)), float)
            idx = rng.integers(0, n, max(1, n // 100))
            pcm[idx] = rng.integers(-32768, 32768, (len(idx), ch))
        else:  # ramps (order-1/2 predictors)
            pcm = np.cumsum(rng.integers(-40, 41, (n, ch)), axis=0)
        pcm = np.clip(pcm, -32768, 32767).astype(np.int16)
        pcm = np.ascontiguousarray(pcm)
        blob = native_audio.flac_encode(pcm, sr)
        assert blob is not None, (case, n, ch, sr)
        dec, got_sr, _ = flac.decode(blob)
        assert got_sr == sr
        np.testing.assert_array_equal(dec.T.astype(np.int16), pcm,
                                      err_msg=f"case={case} n={n} ch={ch}")
