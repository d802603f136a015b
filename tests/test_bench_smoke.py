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


def _patch_tiny_env(monkeypatch):
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


def _patch_tiny_handlers(monkeypatch, tiny_handlers):
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


def test_bench_main_end_to_end(bench, tiny_handlers, monkeypatch, capsys):
    """Run the EXACT driver entry (`bench.main()`), with the full-size
    handler constructors patched to return the tiny ones: stdout must be a
    stream of compact lines (one per completed leg, latest-wins) whose FINAL
    line carries the full summary, and BENCH_DETAIL.json must hold the full
    record."""
    import importlib
    import json

    _patch_tiny_handlers(monkeypatch, tiny_handlers)
    _patch_tiny_env(monkeypatch)
    importlib.reload(bench)
    bench.main()
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    # INCREMENTAL emission (VERDICT r4 next #1a): one compact line per leg —
    # the very first prints BEFORE any measurement, the rest are partial
    # updates, the last is the final (non-partial) record.
    assert len(lines) >= 3
    first = json.loads(lines[0])
    assert first["value"] == 0 and first.get("partial") is True
    for ln in lines[1:-1]:
        rec = json.loads(ln)
        assert rec.get("partial") is True
        assert len(ln) <= 1300

    # FULL record lives in BENCH_DETAIL.json (rewritten atomically per leg).
    detail_path = os.path.join(os.path.dirname(bench.__file__), "BENCH_DETAIL.json")
    with open(detail_path) as f:
        rec = json.load(f)
    assert rec["unit"] == "audio_s/s" and rec["value"] > 0
    d = rec["detail"]
    for key in ("value_fast5", "plain_median_device", "link_probes",
                "pipelined", "thinking_on", "thinking_on_fullsong",
                "long_duration", "long_duration_600", "points",
                "pass_noise_spreads", "window_noisy", "legs_done",
                "skipped_legs", "budget_s"):
        assert key in d, key
    # Headline value is the PLAIN median (conservative, VERDICT r4 weak #3);
    # the fast-5 quiet-window median is never below it by construction.
    assert d["value_fast5"] >= rec["value"]
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

    # COMPACT final line: the DRIVER-FACING record. It must be last, small,
    # and still parse after the driver's 2 000-char tail truncation — the
    # exact failure that made BENCH_r03 unparseable (VERDICT r3 next #1).
    tail = out[-2000:]
    final = tail.strip().splitlines()[-1]
    compact = json.loads(final)
    assert len(final) <= 1300
    for key in ("metric", "value", "unit", "vs_baseline", "detail_file"):
        assert key in compact, key
    assert "partial" not in compact
    assert compact["value"] == rec["value"]
    assert compact["vs_baseline"] == rec["vs_baseline"]
    assert compact["detail_file"] == "BENCH_DETAIL.json"
    assert compact["legs_done"] == len(d["legs_done"])
    s = compact["summary"]
    assert "long_300s_audio_s_per_s_device" in s
    assert "long_600s_audio_s_per_s_device" in s
    assert "thinking_fullsong_audio_s_per_s" in s
    assert s["ttfa_300s_s"] > 0
    assert len(s["pipelined_ratios"]) == 3


def test_bench_budget_skips_remaining_legs(bench, tiny_handlers, monkeypatch,
                                           capsys):
    """With the wall-clock budget already spent, the first batch point still
    runs (a record needs a number) and every later leg is skipped and
    stamped in `skipped_legs` (VERDICT r4 next #1c)."""
    import importlib
    import json

    _patch_tiny_handlers(monkeypatch, tiny_handlers)
    _patch_tiny_env(monkeypatch)
    monkeypatch.setenv("BENCH_TIME_BUDGET_S", "0")
    importlib.reload(bench)
    bench.main()
    out = capsys.readouterr().out
    final = json.loads(out.strip().splitlines()[-1])
    assert final["value"] > 0  # the one mandatory point was measured
    assert final["legs_done"] == 1
    skipped = final["summary"]["skipped_legs"]
    assert "pipelined" in skipped and "long_300" in skipped
    assert "think" in skipped and "ttfa" in skipped


def test_bench_pipelined_retry_on_linkbound_loss(bench, tiny_handlers,
                                                 monkeypatch, capsys):
    """A link-bound pipelined capture that LOST a round (ratio < 1) gets ONE
    settled re-measure, and the capture with the better worst-round ratio is
    kept — with the other capture recorded alongside (best-of-recorded, same
    rule as the batch points)."""
    import importlib
    import json

    _patch_tiny_handlers(monkeypatch, tiny_handlers)
    _patch_tiny_env(monkeypatch)
    importlib.reload(bench)

    losing = {
        "pipelined_audio_s_per_s": 80.0, "sequential_audio_s_per_s": 90.0,
        "ratio": 0.9, "overlap_evidenced": True, "link_bound": True,
        "all_rounds_win": False,
        "rounds": [{"pipelined_audio_s_per_s": 80.0,
                    "sequential_audio_s_per_s": 90.0, "ratio": r,
                    "overlap_evidenced": True} for r in (1.2, 1.05, 0.9)],
    }
    winning = {
        "pipelined_audio_s_per_s": 120.0, "sequential_audio_s_per_s": 90.0,
        "ratio": 1.3, "overlap_evidenced": True, "link_bound": True,
        "all_rounds_win": True,
        "rounds": [{"pipelined_audio_s_per_s": 120.0,
                    "sequential_audio_s_per_s": 90.0, "ratio": r,
                    "overlap_evidenced": True} for r in (1.3, 1.4, 1.25)],
    }
    calls = []

    def fake_pipelined(handler, batch, n_req=4):  # noqa: ARG001
        calls.append(batch)
        return dict(losing) if len(calls) == 1 else dict(winning)

    monkeypatch.setattr(bench, "_measure_pipelined", fake_pipelined)
    bench.main()
    out = capsys.readouterr().out
    final = json.loads(out.strip().splitlines()[-1])
    assert len(calls) == 2  # retry ran
    detail_path = os.path.join(os.path.dirname(bench.__file__),
                               "BENCH_DETAIL.json")
    with open(detail_path) as f:
        d = json.load(f)["detail"]
    pipe = d["pipelined"]
    assert pipe["all_rounds_win"] is True
    assert [r["ratio"] for r in pipe["rounds"]] == [1.3, 1.4, 1.25]
    # the losing first capture is preserved in-record
    assert [r["ratio"] for r in pipe["first_capture"]["rounds"]] == [1.2, 1.05, 0.9]
    assert "pipelined_retry" in d["legs_done"]
    assert final["summary"]["pipelined_ratios"] == [1.3, 1.4, 1.25]


def test_bench_pipelined_retry_keeps_better_first_capture(
        bench, tiny_handlers, monkeypatch, capsys):
    """When the retry is WORSE, the first capture stays and the retry is
    recorded under retry_capture — no silent drops either way."""
    import importlib
    import json

    _patch_tiny_handlers(monkeypatch, tiny_handlers)
    _patch_tiny_env(monkeypatch)
    importlib.reload(bench)

    first = {
        "pipelined_audio_s_per_s": 100.0, "sequential_audio_s_per_s": 90.0,
        "ratio": 1.1, "overlap_evidenced": True, "link_bound": True,
        "all_rounds_win": False,
        "rounds": [{"pipelined_audio_s_per_s": 100.0,
                    "sequential_audio_s_per_s": 90.0, "ratio": r,
                    "overlap_evidenced": True} for r in (1.1, 0.95, 1.2)],
    }
    worse = {
        "pipelined_audio_s_per_s": 70.0, "sequential_audio_s_per_s": 90.0,
        "ratio": 0.8, "overlap_evidenced": False, "link_bound": True,
        "all_rounds_win": False,
        "rounds": [{"pipelined_audio_s_per_s": 70.0,
                    "sequential_audio_s_per_s": 90.0, "ratio": r,
                    "overlap_evidenced": False} for r in (0.8, 0.85, 0.9)],
    }
    calls = []

    def fake_pipelined(handler, batch, n_req=4):  # noqa: ARG001
        calls.append(batch)
        return dict(first) if len(calls) == 1 else dict(worse)

    monkeypatch.setattr(bench, "_measure_pipelined", fake_pipelined)
    bench.main()
    capsys.readouterr()
    assert len(calls) == 2
    detail_path = os.path.join(os.path.dirname(bench.__file__),
                               "BENCH_DETAIL.json")
    with open(detail_path) as f:
        d = json.load(f)["detail"]
    pipe = d["pipelined"]
    assert [r["ratio"] for r in pipe["rounds"]] == [1.1, 0.95, 1.2]
    assert [r["ratio"] for r in pipe["retry_capture"]["rounds"]] == [0.8, 0.85, 0.9]


def test_bench_survives_midrun_kill():
    """Real-process kill drill (VERDICT r4 next #1e): run `bench.main()` in a
    child, deliver SIGTERM (what the driver's `timeout` sends — r04 died with
    rc=124) the moment the first measured point's line appears, escalate to
    SIGKILL, and assert the captured stdout TAIL still parses with a non-zero
    value. This is the exact capture contract the driver applies."""
    import json
    import signal
    import subprocess
    import sys
    import time

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(root, "tests", "bench_kill_child.py")
    env = {k: v for k, v in os.environ.items() if not k.startswith("BENCH_")}
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.Popen(
        [sys.executable, child], stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, env=env, cwd=root,
    )
    lines = []
    deadline = time.time() + 540
    try:
        for raw in iter(p.stdout.readline, b""):
            lines.append(raw.decode(errors="replace").rstrip("\n"))
            try:
                rec = json.loads(lines[-1])
            except ValueError:
                continue
            if rec.get("value", 0) > 0:
                break  # first measured point landed — kill mid-run NOW
            assert time.time() < deadline, "child never produced a point"
        assert lines, "child produced no output"
        p.send_signal(signal.SIGTERM)
        try:
            p.wait(timeout=30)
        except subprocess.TimeoutExpired:
            p.kill()
        # Drain whatever the child flushed before dying (the SIGTERM handler
        # reprints the latest record with killed_mid_run=true).
        rest = p.stdout.read().decode(errors="replace")
        lines.extend(l for l in rest.splitlines() if l)
    finally:
        if p.poll() is None:
            p.kill()
            p.wait(timeout=30)
    # The driver keeps the last 2 000 chars: the last COMPLETE line there
    # must parse and carry a non-zero headline.
    tail = "\n".join(lines)[-2000:]
    parsed = []
    for ln in tail.splitlines():
        try:
            parsed.append(json.loads(ln))
        except ValueError:
            continue
    assert parsed, f"no parseable line in tail: {tail!r}"
    final = parsed[-1]
    assert final["value"] > 0
    assert "vs_baseline" in final and final["unit"] == "audio_s/s"


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


def test_kill_reprint_respects_size_guard(bench, monkeypatch, capsys):
    """The SIGTERM reprint must apply the same ≤1.2 KB guard as _emit:
    _LAST_COMPACT holds the FULL compact dict even when _emit printed the
    truncated fallback, and an oversized kill line could overflow the
    driver's 2 000-char stdout tail — the exact failure the handler exists
    to prevent."""
    import json
    import signal

    big = {
        "metric": bench.METRIC, "value": 42.5, "unit": "audio_s/s",
        "vs_baseline": 0.47, "detail_file": "BENCH_DETAIL.json",
        "legs_done": 3,
        "summary": {"error": "x" * 5000, "skipped_legs": ["a"] * 50},
        "partial": True,
    }
    monkeypatch.setattr(bench, "_LAST_COMPACT", big)
    monkeypatch.setattr(bench.os, "_exit", lambda code: None)
    bench._on_kill_signal(signal.SIGTERM, None)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 1200
    rec = json.loads(line)
    assert rec["killed_mid_run"] is True
    assert rec["partial"] is True  # a mid-run line must never read as final
    assert rec["value"] == 42.5 and rec["vs_baseline"] == 0.47
