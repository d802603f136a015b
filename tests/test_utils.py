"""Utils tests: memory config, local cache, progress estimates, env, audio I/O."""

import os
import time

import numpy as np
import pytest

from acestep_tpu.utils import audio as audio_utils
from acestep_tpu.utils.env import env_bool, env_int, load_dotenv
from acestep_tpu.utils.local_cache import LocalCache
from acestep_tpu.utils.memory_config import get_runtime_memory_config
from acestep_tpu.utils.progress import ProgressEstimator


def test_memory_config_tiers():
    big = get_runtime_memory_config(hbm_gb=95)  # v5p-ish
    assert big.max_batch_size == 8 and big.max_duration_s == 600
    assert big.lm_size == "4B" and big.allow_thinking

    small = get_runtime_memory_config(hbm_gb=16)  # v5e
    assert 1 <= small.max_batch_size <= 2
    assert small.lm_size in ("0.6B", "1.7B", "4B")

    tiny = get_runtime_memory_config(hbm_gb=8)
    assert tiny.max_batch_size == 1
    assert not tiny.allow_thinking or tiny.lm_size is not None


def test_memory_config_env_override(monkeypatch):
    monkeypatch.setenv("ACESTEP_MAX_HBM_GB", "95")
    cfg = get_runtime_memory_config()
    assert cfg.hbm_gb == 95


def test_local_cache(tmp_path):
    cache = LocalCache(str(tmp_path / "c.sqlite3"))
    cache.set("job:1", {"status": "done", "paths": ["a.wav"]})
    assert cache.get("job:1")["status"] == "done"
    assert cache.exists("job:1")
    cache.set("ttl", 1, ex=0.05)
    time.sleep(0.1)
    assert cache.get("ttl") is None
    cache.delete("job:1")
    assert not cache.exists("job:1")


def test_progress_estimator(tmp_path):
    est = ProgressEstimator(str(tmp_path / "p.json"))
    est.update(60, 2, 0.05)
    assert est.estimate_per_step(60, 2) == pytest.approx(0.05)
    est.update(60, 2, 0.15)  # moving average
    assert 0.05 < est.estimate_per_step(60, 2) < 0.15
    # persisted across instances
    est2 = ProgressEstimator(str(tmp_path / "p.json"))
    assert est2.estimate_per_step(60, 2) == est.estimate_per_step(60, 2)
    frac = est2.progress_fraction(time.time() - 0.2, 60, 2, 8)
    assert 0.0 < frac <= 0.99


def test_dotenv(tmp_path, monkeypatch):
    envfile = tmp_path / ".env"
    envfile.write_text("ACESTEP_TEST_KEY=hello\nACESTEP_TEST_INT=7\n# comment\nACESTEP_TEST_BOOL=true\n")
    monkeypatch.delenv("ACESTEP_TEST_KEY", raising=False)
    vals = load_dotenv(str(envfile))
    assert vals["ACESTEP_TEST_KEY"] == "hello"
    assert os.environ["ACESTEP_TEST_KEY"] == "hello"
    assert env_int("ACESTEP_TEST_INT", 0) == 7
    assert env_bool("ACESTEP_TEST_BOOL")


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 4800)) * 0.2).astype(np.float32)
    path = audio_utils.save_wav(str(tmp_path / "t.wav"), audio, 48000)
    back = audio_utils.load_audio(path)
    assert back.shape == audio.shape
    np.testing.assert_allclose(back, audio, atol=2e-4)


def test_int16_passthrough_save(tmp_path):
    pcm = (np.random.default_rng(1).integers(-3000, 3000, (2, 1000))).astype(np.int16)
    path = audio_utils.save_wav(str(tmp_path / "i.wav"), pcm, 48000)
    back = audio_utils.load_audio(path)
    np.testing.assert_allclose(back * 32768.0, pcm, atol=1)


def test_wav_header_matches_stdlib():
    """wav_header (the /v1/generate_stream response prefix) is byte-identical
    to the stdlib wave module's header for the same params — any WAV client
    that accepts our saved files accepts the streamed response."""
    import io
    import wave

    for frames, ch, sr in [(96000, 2, 48000), (1, 1, 44100), (12345, 2, 24000)]:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(b"\x00" * (frames * ch * 2))
        assert buf.getvalue()[:44] == audio_utils.wav_header(frames, ch, sr)


def test_deterministic_uuid():
    a = audio_utils.deterministic_uuid({"caption": "x", "seed": 1})
    b = audio_utils.deterministic_uuid({"seed": 1, "caption": "x"})
    c = audio_utils.deterministic_uuid({"caption": "x", "seed": 2})
    assert a == b and a != c


def test_native_audio_matches_numpy():
    from acestep_tpu.utils import native_audio as na

    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 9600)) * 0.4).astype(np.float32)
    pcm = na.f32_to_i16(x, 10 ** (-1 / 20))
    assert pcm.shape == (9600, 2) and pcm.dtype == np.int16
    peak_out = np.abs(pcm).max() / 32767.0
    assert peak_out == pytest.approx(10 ** (-1 / 20), abs=2e-3)
    back = na.i16_to_f32(pcm)
    assert back.shape == x.shape
    # resample a tone and verify frequency preservation
    t = np.arange(9600) / 48000
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    y = na.resample(tone, 48000, 24000)
    assert abs(y.shape[1] - 4800) <= 1


def test_native_bf16_chunk_to_i16_matches_numpy():
    """The fused C++ decode-finish kernel must be byte-identical to the numpy
    path it replaces (bf16→f32, slice to take, transpose, scale, clip,
    round-half-even int16) including the pos/take windowing."""
    import ml_dtypes

    from acestep_tpu.utils import native_audio as na

    if not na.available():  # pragma: no cover - env without g++
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    b, lc, ch, total, pos, take = 2, 777, 2, 2000, 301, 650
    # include values beyond ±1 so the clip leg is exercised
    chunk = (rng.standard_normal((b, lc, ch)) * 0.9).astype(ml_dtypes.bfloat16)
    scale = np.array([0.83, 1.9], np.float32)
    out = np.full((b, ch, total), 7, np.int16)
    assert na.bf16_chunk_to_i16(chunk, scale, out, pos, take)
    arr = chunk.astype(np.float32)
    pcm = np.clip(arr[:, :take].transpose(0, 2, 1) * scale.reshape(b, 1, 1), -1.0, 1.0)
    ref = np.round(pcm * 32767.0).astype(np.int16)
    assert np.array_equal(out[:, :, pos:pos + take], ref)
    # untouched outside the window
    assert (out[:, :, :pos] == 7).all() and (out[:, :, pos + take:] == 7).all()
    # planar physical layout — how the TPU runtime exports (b, lc, ch) bf16
    # device arrays (channel-major strides) — must produce the same bytes
    planar = np.ascontiguousarray(chunk.transpose(0, 2, 1)).transpose(0, 2, 1)
    assert not planar.flags.c_contiguous  # really the planar layout
    out2 = np.zeros_like(out)
    assert na.bf16_chunk_to_i16(planar, scale, out2, pos, take)
    assert np.array_equal(out2[:, :, pos:pos + take], ref)
    # f32 input (CPU-test decode dtype) is rejected → caller keeps numpy path
    assert not na.bf16_chunk_to_i16(
        chunk.astype(np.float32), scale, out, pos, take
    )
    # out-of-bounds window is rejected, not written
    assert not na.bf16_chunk_to_i16(chunk, scale, out, total - 5, take)

    # Hand-crafted EXACT half-integer products (both signs, odd and even
    # floor) so half-even vs half-away-from-zero actually diverge: with
    # scale 830/1024 (f32-exact) these bf16 values yield f32 products of
    # exactly ±1024.5 / ±3073.5, and ±1024.5 round DIFFERENTLY under the two
    # modes (half-even → ±1024; floor(x+0.5)-style half-away → 1025/-1025).
    ties = np.array([-0.11572265625, -0.03857421875, 0.03857421875,
                     0.11572265625], ml_dtypes.bfloat16)
    assert np.array_equal(ties.astype(np.float32), np.asarray(
        [-0.11572265625, -0.03857421875, 0.03857421875, 0.11572265625],
        np.float32))  # representable exactly in bf16
    tie_scale = np.array([0.810546875], np.float32)
    prod = ties.astype(np.float32) * tie_scale[0] * np.float32(32767.0)
    assert np.array_equal(prod, [-3073.5, -1024.5, 1024.5, 3073.5])
    tie_chunk = np.zeros((1, 4, 2), ml_dtypes.bfloat16)
    tie_chunk[0, :, 0] = ties
    tie_out = np.zeros((1, 2, 4), np.int16)
    assert na.bf16_chunk_to_i16(tie_chunk, tie_scale, tie_out, 0, 4)
    assert np.array_equal(tie_out[0, 0], [-3074, -1024, 1024, 3074])


def test_log_ring_buffer():
    import logging

    from acestep_tpu.utils.logbuffer import LogRingBuffer

    buf = LogRingBuffer(maxlen=3)
    logging.getLogger("t.ring").addHandler(buf)
    logging.getLogger("t.ring").warning("one")
    buf.append("two")
    for i in range(5):
        buf.append(f"x{i}")
    tail = buf.tail(10)
    assert len(tail) == 3  # maxlen enforced
    assert tail[-1]["line"] == "x4"
    assert all("t" in e for e in tail)


def test_verify_checkpoint_components(tmp_path):
    from acestep_tpu.utils.downloader import (
        DIT_CHECKPOINT_COMPONENTS, ensure_components, verify_checkpoint,
    )
    import os

    d = str(tmp_path / "ckpt")
    os.makedirs(os.path.join(d, "vae"))
    os.makedirs(os.path.join(d, "Qwen3-Embedding-0.6B"))
    for p in ("config.json", "model.safetensors", "silence_latent.pt",
              "vae/config.json", "vae/diffusion_pytorch_model.safetensors",
              "Qwen3-Embedding-0.6B/config.json",
              "Qwen3-Embedding-0.6B/model.safetensors"):
        open(os.path.join(d, p), "w").write("{}")
    status = verify_checkpoint(d)
    assert all(status.values()), status

    os.unlink(os.path.join(d, "silence_latent.pt"))
    status = verify_checkpoint(d)
    assert not status["silence_latent"]
    assert status["weights"] and status["vae"]

    # ensure_components reports missing pieces without re-download (no egress)
    out = ensure_components("ckpt", str(tmp_path))
    assert out["components"]["silence_latent"] is False


def test_checkpoint_catalog(tmp_path):
    """list_available_models (ref init_service_catalog:27-40): scans a root
    for acestep-* dirs with component verification."""
    import os

    from acestep_tpu.utils.downloader import list_available_models

    root = str(tmp_path)
    d = os.path.join(root, "acestep-v15-turbo")
    os.makedirs(os.path.join(d, "vae"))
    os.makedirs(os.path.join(d, "Qwen3-Embedding-0.6B"))
    for p in ("config.json", "model.safetensors", "silence_latent.pt",
              "vae/config.json", "vae/x.safetensors",
              "Qwen3-Embedding-0.6B/config.json",
              "Qwen3-Embedding-0.6B/m.safetensors"):
        open(os.path.join(d, p), "w").write("{}")
    os.makedirs(os.path.join(root, "acestep-5Hz-lm-0.6B"))
    os.makedirs(os.path.join(root, "not-a-model"))

    cat = list_available_models(root)
    names = [c["name"] for c in cat]
    assert names == ["acestep-5Hz-lm-0.6B", "acestep-v15-turbo"]
    by = {c["name"]: c for c in cat}
    assert by["acestep-v15-turbo"]["complete"]
    assert not by["acestep-5Hz-lm-0.6B"]["complete"]
