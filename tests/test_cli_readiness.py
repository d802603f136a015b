"""Real-weights readiness drill (VERDICT r2 next #10): the documented
`download` → `verify-checkpoint` → `tools/parity_check.py` certification
sequence, dry-run against a fabricated reference-layout checkpoint (the
golden fixture) in a zero-egress environment.

Ref failure semantics: `model_downloader.py:210-308` (per-component ensure)
and `init_service_loader.py:116-161` (hard-fail on missing components).
"""

import os
import shutil

from acestep_tpu.cli import main

CKPT = os.path.join(os.path.dirname(__file__), "goldens", "checkpoint_tiny")


def test_verify_checkpoint_complete(capsys):
    assert main(["verify-checkpoint", CKPT]) == 0
    out = capsys.readouterr().out
    assert "complete" in out
    for comp in ("config", "weights", "silence_latent", "vae", "text_encoder"):
        assert f"{comp}: ok" in out.replace("  ", " ").replace("   ", " ") or comp in out


def test_verify_checkpoint_incomplete(tmp_path, capsys):
    broken = tmp_path / "acestep-broken"
    broken.mkdir()
    (broken / "config.json").write_text("{}")
    assert main(["verify-checkpoint", str(broken)]) == 1
    out = capsys.readouterr().out
    assert "INCOMPLETE" in out
    assert "weights" in out and "vae" in out


def test_verify_checkpoint_lm_layout(tmp_path, capsys):
    lmdir = tmp_path / "acestep-5Hz-lm-0.6B"
    shutil.copytree(os.path.join(CKPT, "acestep-5Hz-lm-0.6B"), lmdir)
    # fixture LM dir ships config + weights but no tokenizer.json → incomplete
    assert main(["verify-checkpoint", str(lmdir)]) == 1
    (lmdir / "tokenizer.json").write_text("{}")
    (lmdir / "tokenizer_config.json").write_text("{}")
    assert main(["verify-checkpoint", str(lmdir)]) == 0
    assert "tokenizer" in capsys.readouterr().out


def test_download_complete_local_no_network(tmp_path, capsys):
    """With a complete local dir, `download` certifies it without any network
    (ensure_components re-checks in place; zero-egress env ⇒ no source)."""
    shutil.copytree(CKPT, tmp_path / "acestep-v15-turbo")
    assert main(["download", "--models", "acestep-v15-turbo",
                 "--cache-dir", str(tmp_path)]) == 0
    assert "complete" in capsys.readouterr().out


def test_download_missing_model_fails_cleanly(tmp_path, capsys):
    assert main(["download", "--models", "acestep-v15-turbo",
                 "--cache-dir", str(tmp_path)]) == 1
    out = capsys.readouterr().out
    assert "MISSING" in out


def test_run_warmup_compiles_each_shape():
    """`serve --warmup '1x30,2x60'` runs one generation per shape before the
    port binds (first-request compile moved to startup)."""
    from acestep_tpu.cli import run_warmup

    calls = []

    class Fake:
        def generate_music(self, **kw):
            calls.append((kw["batch_size"], kw["audio_duration"]))
            assert len(kw["captions"]) == kw["batch_size"]
            assert kw["decode_audio"] is True
            return {"time_costs": {}}

    run_warmup(Fake(), "1x30, 2x60,4x")
    assert calls == [(1, 30.0), (2, 60.0), (4, 30.0)]


def test_run_warmup_lm_token():
    """The 'lm' warmup token compiles the planner draft programs (a cold
    first sample_mode/chat request otherwise pays minutes of compile), and
    degrades to a skip when no LM is initialized."""
    from acestep_tpu.cli import run_warmup

    dit_calls, lm_calls = [], []

    class FakeDit:
        def generate_music(self, **kw):
            dit_calls.append(kw["batch_size"])
            return {"time_costs": {}}

    class FakeLM:
        initialized = True

        def create_sample_from_query(self, query, **kw):
            lm_calls.append(query)
            return {"metadata": {}}

    run_warmup(FakeDit(), "1x30, lm", llm=FakeLM())
    assert dit_calls == [1] and lm_calls == ["warmup"]

    # No LM → the token is skipped, DiT legs still run, no crash.
    dit_calls.clear()
    run_warmup(FakeDit(), "lm,1x30", llm=None)
    assert dit_calls == [1]


def test_serve_aborts_on_incomplete_checkpoint(tmp_path, capsys):
    broken = tmp_path / "acestep-v15-turbo"
    broken.mkdir()
    (broken / "config.json").write_text("{}")
    rc = main(["serve", "--checkpoint-dir", str(broken), "--port", "0"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "incomplete" in err and "weights" in err


def test_compile_cache_enable(tmp_path, monkeypatch):
    """The persistent XLA compile cache is wired at CLI launch (warm restarts
    replay compiles); ACESTEP_COMPILE_CACHE=0 disables it."""
    import jax

    from acestep_tpu.utils import compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("ACESTEP_COMPILE_CACHE", str(tmp_path / "xla"))
        got = compile_cache.enable()
        assert got == str(tmp_path / "xla") and os.path.isdir(got)
        assert jax.config.jax_compilation_cache_dir == got

        monkeypatch.setenv("ACESTEP_COMPILE_CACHE", "0")
        assert compile_cache.enable() is None
    finally:
        # tmp_path is deleted after the test; don't leave the global cache
        # config pointing at it for the rest of the pytest session
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cli_profile_matrix(tmp_path, monkeypatch, capsys):
    """`cli profile` produces the Duration×Batch matrix with the transfer
    split column and device-throughput field in the JSON."""
    import json

    import jax.numpy as jnp

    import acestep_tpu.pipeline.handler as H
    from tests.test_service import TINY_DIT, TINY_TEXT, TINY_VAE

    H.LATENT_BUCKETS = (64, 128)
    H.TEXT_BUCKETS = (32, 64)
    H.LYRIC_BUCKETS = (32, 64)
    tiny = H.AceStepHandler(TINY_DIT, TINY_VAE, TINY_TEXT, dtype=jnp.float32)
    tiny.initialize_service(random_init=True)

    import acestep_tpu.cli as cli_mod

    class FakeDit:
        def __new__(cls, *a, **k):
            return tiny

    monkeypatch.setattr(H, "AceStepHandler", FakeDit)
    out_json = tmp_path / "matrix.json"
    rc = main(["profile", "--random-init", "--durations", "2", "--batches", "1,2",
               "--think", "false", "--json-out", str(out_json)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Xfer(s)" in text and "audio_s/s" in text
    rows = json.load(open(out_json))
    assert len(rows) == 2
    for r in rows:
        assert r["throughput"] > 0 and r["throughput_device"] >= r["throughput"]
        assert "transfer" in r and "vae" in r


def test_cli_generate_examples(tmp_path, monkeypatch):
    """`cli generate-examples` writes N LM-drafted params files in the
    Sample-example format (ref generate_examples.py role)."""
    import json

    import jax.numpy as jnp

    import acestep_tpu.lm.handler as lm_handler_mod
    from tests.test_service import TINY_LM

    tiny = lm_handler_mod.LLMHandler(TINY_LM, dtype=jnp.float32)
    tiny.initialize(random_init=True)

    class FakeLLM:
        def __new__(cls, *a, **k):
            return tiny

    monkeypatch.setattr(lm_handler_mod, "LLMHandler", FakeLLM)
    out = tmp_path / "ex"
    rc = main(["generate-examples", "--random-init", "--num", "2",
               "--output-dir", str(out)])
    assert rc == 0
    files = sorted(out.glob("example_*.json"))
    assert len(files) == 2
    for f in files:
        md = json.load(open(f))
        assert "caption" in md and "lyrics" in md and "duration" in md
