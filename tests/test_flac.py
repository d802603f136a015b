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


class _BW:
    """Minimal MSB-first bit writer for hand-built FLAC streams."""

    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def put_signed(self, v, n):
        self.put(v & ((1 << n) - 1), n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _stream_header(bw, channels, bs, total, sr=8000, bps=16):
    for ch in b"fLaC":
        bw.put(ch, 8)
    bw.put(1, 1)
    bw.put(0, 7)
    bw.put(34, 24)  # STREAMINFO
    bw.put(bs, 16)
    bw.put(bs, 16)
    bw.put(0, 24)
    bw.put(0, 24)
    bw.put(sr, 20)
    bw.put(channels - 1, 3)
    bw.put(bps - 1, 5)
    bw.put(total, 36)
    for _ in range(16):
        bw.put(0, 8)  # md5 unknown


def _frame_header(bw, bs, chan_assign):
    bw.put(0x3FFE, 14)
    bw.put(0, 1)
    bw.put(0, 1)
    bw.put(0b0111, 4)  # 16-bit blocksize at end
    bw.put(0b0000, 4)  # sr from STREAMINFO
    bw.put(chan_assign, 4)
    bw.put(0b100, 3)   # 16 bps
    bw.put(0, 1)
    bw.put(0, 8)       # coded frame number 0
    bw.put(bs - 1, 16)
    bw.put(0, 8)       # crc8 (decoders don't verify)


def test_decoders_agree_on_lpc_subframe():
    """Hand-built LPC stream (order 1, shift 1, coef 2 → pred = x[i-1]):
    real-world encoders emit LPC, which our own encoder never produces — this
    pins both decoders' LPC reconstruction against each other and against a
    hand-computed series."""
    bs = 8
    warmup = 100
    residuals = [5, -3, 7, 0, -2, 4, 1]
    expected = [warmup]
    for e in residuals:
        expected.append(e + ((2 * expected[-1]) >> 1))

    bw = _BW()
    _stream_header(bw, 1, bs, bs)
    _frame_header(bw, bs, chan_assign=0)
    bw.put(0, 1)           # subframe pad
    bw.put(0b100000, 6)    # LPC order 1
    bw.put(0, 1)           # no wasted bits
    bw.put_signed(warmup, 16)
    bw.put(4 - 1, 4)       # precision 4
    bw.put_signed(1, 5)    # shift 1
    bw.put_signed(2, 4)    # coef 2
    bw.put(0b00, 2)        # rice method
    bw.put(0, 4)           # partition order 0
    r = 2
    bw.put(r, 4)
    for e in residuals:
        u = (e << 1) if e >= 0 else ((-e) << 1) - 1  # zigzag
        bw.put(0, u >> r)  # unary zeros
        bw.put(1, 1)
        bw.put(u & ((1 << r) - 1), r)
    bw.align()
    bw.put(0, 16)          # crc16 (not verified)
    blob = bw.bytes()

    p_pcm, p_sr, p_bps = flac.decode(blob)
    assert p_pcm.shape == (1, bs) and (p_sr, p_bps) == (8000, 16)
    np.testing.assert_array_equal(p_pcm[0], expected)
    native = native_audio.flac_decode(blob)
    assert native is not None
    np.testing.assert_array_equal(native[0], p_pcm)


@pytest.mark.parametrize("chan_assign", [8, 9])
def test_decoders_agree_on_left_right_side(chan_assign):
    """left/side (8) and right/side (9) decorrelations via hand-built
    verbatim subframes — our encoder only emits independent or mid/side."""
    bs = 4
    left = [1000, -2000, 30000, -32768]
    right = [900, -2100, 29995, -32700]
    side = [l - r for l, r in zip(left, right)]

    bw = _BW()
    _stream_header(bw, 2, bs, bs)
    _frame_header(bw, bs, chan_assign=chan_assign)
    if chan_assign == 8:   # left (16) then side (17)
        subs = [(left, 16), (side, 17)]
    else:                  # side (17) then right (16)
        subs = [(side, 17), (right, 16)]
    for vals, bps in subs:
        bw.put(0, 1)
        bw.put(0b000001, 6)  # verbatim
        bw.put(0, 1)
        for v in vals:
            bw.put_signed(v, bps)
    bw.align()
    bw.put(0, 16)
    blob = bw.bytes()

    p_pcm, _, _ = flac.decode(blob)
    np.testing.assert_array_equal(p_pcm[0], left)
    np.testing.assert_array_equal(p_pcm[1], right)
    native = native_audio.flac_decode(blob)
    assert native is not None
    np.testing.assert_array_equal(native[0], p_pcm)


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
