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
