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
    assert all("denoise_done" in t and "finish_done" in t and "finish_cost_s" in t
               for t in out["trace"])
    assert "control_transfer_median_s" in out and "pipelined_finish_median_s" in out
    # Always 3 recorded rounds; headline is the MEDIAN-ratio round, and the
    # link-bound flag + per-round win bit are present (VERDICT r3 next #4).
    assert len(out["rounds"]) == 3
    ratios = sorted(r["ratio"] for r in out["rounds"])
    assert out["ratio"] == ratios[1]
    assert isinstance(out["link_bound"], bool)
    assert isinstance(out["all_rounds_win"], bool)


def test_measure_think_point(bench, tiny_handlers):
    dit, llm = tiny_handlers
    p = bench._measure_think_point(dit, llm, batch=1, reps=2)
    assert p["median_wall_s"] > 0
    assert p["audio_s_per_s"] > 0
    assert p["lm_median_s"] >= 0


def test_bench_main_end_to_end(bench, tiny_handlers, monkeypatch, capsys):
    """Run the EXACT driver entry (`bench.main()`), with the full-size
    handler constructors patched to return the tiny ones: the one JSON line
    must parse and carry every field the record contract promises."""
    import json

    import acestep_tpu.lm.handler as lm_mod
    import acestep_tpu.pipeline.handler as pipe_mod

    dit, llm = tiny_handlers

    class FakeDit:
        def __new__(cls, *a, **k):
            return dit

    class FakeLLM:
        def __new__(cls, *a, **k):
            return llm

    monkeypatch.setattr(pipe_mod, "AceStepHandler", FakeDit)
    monkeypatch.setattr(lm_mod, "LLMHandler", FakeLLM)
    # The reachability probe spawns a subprocess that would inherit this test
    # env's axon PYTHONPATH and hang against the (possibly dead) tunnel.
    monkeypatch.setenv("BENCH_PROBE", "0")
    monkeypatch.setenv("BENCH_REPS", "2")
    monkeypatch.setenv("BENCH_BATCH", "1")
    monkeypatch.setenv("BENCH_QUIET_PASSES", "1")
    monkeypatch.setenv("BENCH_LONG_DURATION_S", "3")
    monkeypatch.setenv("BENCH_LONG_REPS", "1")
    monkeypatch.setenv("BENCH_THINK_REPS", "1")
    monkeypatch.setenv("BENCH_RETRY_WAIT_S", "0")
    monkeypatch.setenv("BENCH_LONG600_DURATION_S", "3")
    monkeypatch.setenv("BENCH_FULLSONG_DURATION_S", "2")
    monkeypatch.setenv("BENCH_FULLSONG_REPS", "1")
    monkeypatch.setenv("BENCH_TTFA_DURATION_S", "3")
    monkeypatch.setenv("BENCH_TTFA_REPS", "1")
    import importlib

    importlib.reload(bench)
    bench.main()
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    # FULL record: early stdout line + BENCH_DETAIL.json, identical contents.
    rec = json.loads(lines[0])
    assert rec["unit"] == "audio_s/s" and rec["value"] > 0
    d = rec["detail"]
    for key in ("value_plain_median", "plain_median_device", "link_probes",
                "pipelined", "thinking_on", "thinking_on_fullsong",
                "long_duration", "long_duration_600", "points",
                "pass_noise_spreads", "window_noisy"):
        assert key in d, key
    assert d["pipelined"]["rounds"]
    assert d["long_duration"]["audio_s_per_s"] > 0
    assert d["long_duration_600"]["audio_s_per_s"] > 0
    assert d["thinking_on"]["audio_s_per_s"] > 0
    assert d["thinking_on_fullsong"]["audio_s_per_s"] > 0
    # streaming TTFA point: first chunk must land no later than the wall
    ttfa = d["time_to_first_audio"]
    assert 0 < ttfa["ttfa_median_s"] <= ttfa["wall_median_s"]
    assert ttfa["chunks"] >= 1
    assert len(d["link_probes"]) >= 2
    # per-point contention probes quoted next to each point (r3 next #3)
    assert all(len(p["device_contention"]) == 2 for p in d["points"])
    detail_path = os.path.join(os.path.dirname(bench.__file__), "BENCH_DETAIL.json")
    with open(detail_path) as f:
        assert json.load(f)["value"] == rec["value"]

    # COMPACT final line: the DRIVER-FACING record. It must be last, small,
    # and still parse after the driver's 2 000-char tail truncation — the
    # exact failure that made BENCH_r03 unparseable (VERDICT r3 next #1).
    tail = out[-2000:]
    final = tail.strip().splitlines()[-1]
    compact = json.loads(final)
    assert len(final) <= 1300
    for key in ("metric", "value", "unit", "vs_baseline", "detail_file"):
        assert key in compact, key
    assert compact["value"] == rec["value"]
    assert compact["vs_baseline"] == rec["vs_baseline"]
    assert compact["detail_file"] == "BENCH_DETAIL.json"
    s = compact["summary"]
    assert "long_300s_audio_s_per_s_device" in s
    assert "long_600s_audio_s_per_s_device" in s
    assert "thinking_fullsong_audio_s_per_s" in s
    assert s["ttfa_300s_s"] > 0
    assert len(s["pipelined_ratios"]) == 3


def test_bench_records_outage_instead_of_hanging(monkeypatch, capsys, bench):
    """When the device backend is unreachable the driver's bench run must
    emit an explicit outage record (value 0 + error) rather than hang —
    and the final line stays compact/parseable."""
    import json

    monkeypatch.setenv("BENCH_PROBE", "1")
    monkeypatch.setattr(bench, "_backend_reachable", lambda *a, **k: False)
    bench.main()
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["value"] == 0 and "error" in rec["summary"]
    assert len(out.strip().splitlines()[-1]) <= 1300
