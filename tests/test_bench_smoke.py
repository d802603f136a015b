"""bench.py smoke test: the driver runs `python bench.py` unattended at round
end; an API break there loses the round's perf record. Exercises every
measurement function against tiny handlers on CPU (the real run only differs
in model size and device)."""

import importlib
import os

import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def bench(monkeypatch=None):
    os.environ["BENCH_DURATION_S"] = "2"
    os.environ["BENCH_REPS"] = "2"
    import bench as bench_mod

    importlib.reload(bench_mod)
    assert bench_mod.DURATION_S == 2.0
    return bench_mod


@pytest.fixture(scope="module")
def tiny_handlers():
    import acestep_tpu.pipeline.handler as H
    from acestep_tpu.lm.handler import LLMHandler
    from acestep_tpu.pipeline.handler import AceStepHandler
    from tests.test_service import TINY_DIT, TINY_LM, TINY_TEXT, TINY_VAE

    H.LATENT_BUCKETS = (64, 128)
    H.TEXT_BUCKETS = (32, 64)
    H.LYRIC_BUCKETS = (32, 64)
    dit = AceStepHandler(TINY_DIT, TINY_VAE, TINY_TEXT, dtype=jnp.float32)
    dit.initialize_service(random_init=True)
    llm = LLMHandler(TINY_LM, dtype=jnp.float32)
    llm.initialize(random_init=True)
    return dit, llm


def test_link_probe(bench):
    out = bench._link_probe()
    assert out["rtt_ms"] >= 0 and out["dtoh_mb_s"] > 0


def test_measure_point(bench, tiny_handlers):
    dit, _ = tiny_handlers
    p = bench._measure_point(dit, batch=2, reps=2)
    assert p["batch"] == 2
    assert p["median_wall_s"] > 0
    assert p["fast5_median_wall_s"] > 0
    assert p["noise_spread"] >= 1.0
    # device-vs-link attribution keys present for the record
    for key in ("diffusion_median_s", "decode_compute_wait_median_s",
                "decode_transfer_median_s", "pcm_bytes"):
        assert key in p
    assert p["pcm_bytes"] == int(2 * 2 * 48_000 * 2 * 2)


def test_measure_pipelined_with_control(bench, tiny_handlers):
    dit, _ = tiny_handlers
    out = bench._measure_pipelined(dit, batch=1, n_req=2)
    assert out["pipelined_audio_s_per_s"] > 0
    assert out["sequential_audio_s_per_s"] > 0
    assert isinstance(out["overlap_evidenced"], bool)
    assert len(out["trace"]) == 2
    assert all("denoise_done" in t and "finish_done" in t for t in out["trace"])
    assert out["rounds"]


def test_measure_think_point(bench, tiny_handlers):
    dit, llm = tiny_handlers
    p = bench._measure_think_point(dit, llm, batch=1, reps=2)
    assert p["median_wall_s"] > 0
    assert p["audio_s_per_s"] > 0
    assert p["lm_median_s"] >= 0
