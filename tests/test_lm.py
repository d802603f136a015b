"""Tests for the constrained FSM decoder, sampling ops, and LLMHandler."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.config import Qwen3Config
from acestep_tpu.lm import sampling
from acestep_tpu.lm.constrained import ConstrainedDecoderFSM
from acestep_tpu.lm.handler import LLMHandler
from acestep_tpu.utils.tokenizer import ByteFallbackTokenizer

TOK = ByteFallbackTokenizer()


def drive_fsm(fsm, pick=lambda ids: ids[0], max_steps=2000):
    """Drive the FSM with a deterministic chooser; returns decoded text."""
    out = []
    for _ in range(max_steps):
        if fsm.finished:
            break
        spec = fsm.step_spec()
        if spec.kind == "force":
            t = spec.token
        elif spec.kind == "eos":
            t = spec.token
        elif spec.kind == "allow":
            t = pick(spec.ids)
        elif spec.kind == "block":
            t = TOK.encode("x")[0]  # arbitrary non-blocked token
            assert t not in (spec.ids or [])
        elif spec.kind == "codes":
            t = fsm.code_token_start  # never hit with byte tokenizer
        else:
            t = TOK.encode("y")[0]
        fsm.advance(t)
        out.append(t)
    return TOK.decode(out)


def test_fsm_produces_valid_cot_format():
    fsm = ConstrainedDecoderFSM(TOK)
    fsm.reset(phase="cot", stop_at_reasoning=True)
    text = drive_fsm(fsm)
    assert fsm.finished
    m = re.match(
        r"<think>\nbpm: (\d+)\ncaption: (.+)\nduration: (\d+)\nkeyscale: (.+)\n"
        r"language: (\w+)\ntimesignature: (\d)\n</think>",
        text,
        re.DOTALL,
    )
    assert m, text
    assert 30 <= int(m.group(1)) <= 300
    assert 10 <= int(m.group(3)) <= 600
    assert int(m.group(6)) in (2, 3, 4, 6)


def test_fsm_user_metadata_injection():
    fsm = ConstrainedDecoderFSM(TOK)
    fsm.reset(
        phase="cot",
        stop_at_reasoning=True,
        user_metadata={"bpm": "120", "duration": "45", "keyscale": "G major"},
    )
    text = drive_fsm(fsm)
    assert "bpm: 120\n" in text
    assert "duration: 45\n" in text
    assert "keyscale: G major\n" in text
    assert fsm.parsed_duration == 45.0
    assert fsm.codes_budget() == 225


def test_fsm_value_constrained_to_valid_set():
    fsm = ConstrainedDecoderFSM(TOK)
    fsm.reset(phase="cot", stop_at_reasoning=True)
    # pick the LAST allowed id each time — still must produce valid values
    text = drive_fsm(fsm, pick=lambda ids: ids[-1])
    m = re.search(r"bpm: (\d+)\n", text)
    assert m and 30 <= int(m.group(1)) <= 300
    m = re.search(r"timesignature: (\d)\n", text)
    assert m and int(m.group(1)) in (2, 3, 4, 6)
    m = re.search(r"keyscale: (.+)\nlanguage", text)
    from acestep_tpu.utils.constants import VALID_KEYSCALES
    assert m and m.group(1) in VALID_KEYSCALES


def test_sampling_allow_block():
    logits = jnp.asarray(np.linspace(0, 1, 50)[None].astype(np.float32))
    allow = jnp.asarray([[3, 7, -1, -1]])
    tok = sampling.sample_allow(logits, allow, jax.random.PRNGKey(0), temperature=0.0)
    assert int(tok[0]) == 7  # greedy among {3, 7}

    block = jnp.asarray([[49, 48, -1, -1]])
    tok = sampling.sample_block(logits, block, jax.random.PRNGKey(0), temperature=0.0)
    assert int(tok[0]) == 47  # greedy excluding blocked top-2


def test_cfg_combine():
    cond = jnp.asarray([[1.0, 2.0]])
    uncond = jnp.asarray([[0.0, 3.0]])
    out = sampling.cfg_combine(cond, uncond, 2.0)
    np.testing.assert_allclose(np.asarray(out), [[2.0, 1.0]])


def test_top_p_keeps_top_token():
    logits = jnp.asarray([[10.0, 1.0, 0.5, 0.1]])
    tok = sampling.sample(logits, jax.random.PRNGKey(0), 1.0, top_k=0, top_p=0.01)
    assert int(tok[0]) == 0


TINY_LM = Qwen3Config(
    vocab_size=300,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=8,
)


@pytest.fixture(scope="module")
def lm_handler():
    h = LLMHandler(TINY_LM, dtype=jnp.float32)
    h.initialize(random_init=True)
    return h


def test_llm_handler_cot_generation(lm_handler):
    out = lm_handler.generate_with_stop_condition(
        "energetic synthwave", "[Instrumental]",
        temperature=0.8, stop_at_reasoning=True, seed=0,
    )
    md = out["metadata"]
    assert "<think>" in out["cot_text"]
    assert isinstance(md.get("bpm"), int) and 30 <= md["bpm"] <= 300
    assert isinstance(md.get("duration"), int) and 10 <= md["duration"] <= 600
    assert md.get("timesignature") in ("2", "3", "4", "6")
    assert "lm_cot_time_cost" in out["time_costs"]


def test_llm_handler_full_generation_with_codes(lm_handler):
    out = lm_handler.generate_with_stop_condition(
        "calm piano", "", temperature=0.8, target_duration=3.0, seed=1,
    )
    assert len(out["codes"]) == 15  # 3 s × 5 codes/s
    assert all(0 <= c < 64000 for c in out["codes"])
    assert out["audio_codes"].startswith("<|audio_code_")


def test_llm_handler_user_metadata(lm_handler):
    out = lm_handler.generate_with_stop_condition(
        "rock", "", stop_at_reasoning=True,
        user_metadata={"bpm": "140", "duration": "60"}, seed=2,
    )
    assert out["metadata"]["bpm"] == 140
    assert out["metadata"]["duration"] == 60


def test_parse_lm_output():
    text = (
        "<think>\nbpm: 95\ncaption: A haunting melody.\nduration: 120\n"
        "keyscale: D minor\nlanguage: en\ntimesignature: 4\n</think>\n"
        "<|audio_code_1|><|audio_code_2|>"
    )
    md, codes = LLMHandler.parse_lm_output(text)
    assert md["bpm"] == 95
    assert md["duration"] == 120
    assert md["keyscale"] == "D minor"
    assert md["caption"] == "A haunting melody."
    assert codes == "<|audio_code_1|><|audio_code_2|>"


def test_llm_handler_batch_generation(lm_handler):
    out = lm_handler.generate_with_stop_condition(
        "lofi beats", "", temperature=0.8, target_duration=2.0, seed=5, batch_size=3,
    )
    assert len(out["batch_codes"]) == 3
    for codes in out["batch_codes"]:
        assert len(codes) == 10  # 2 s × 5 codes/s
    assert len(out["batch_metadata"]) == 3
    assert out["codes"] == out["batch_codes"][0]


# ---------------------------------------------------------------------------
# Prefill dedup + prefix cache (nano-vllm prefix-caching parity, SURVEY §2.3)
# ---------------------------------------------------------------------------


def test_prefill_cache_dedup_matches_plain_prefill(lm_handler):
    """Deduped prefill (2 unique rows broadcast to 4) must equal plain prefill."""
    import numpy as np
    from acestep_tpu.lm.prefix_cache import PrefillCache
    from acestep_tpu.models import qwen3

    h = lm_handler
    p1 = h.build_formatted_prompt("warm piano", "")
    p2 = h.build_formatted_prompt("dark techno", "")
    ids, mask, bucket = h._encode_prompts([p1, p1, p2, p2], budget=16)
    total = bucket + 16

    cache_plain = qwen3.KVCache.create(h.config, 4, total, h.dtype)
    logits_plain, cache_plain = qwen3.prefill(
        h.params, h.config, jnp.asarray(ids), jnp.asarray(mask), cache_plain
    )

    pc = PrefillCache()
    logits_c, cache_c = pc.prefill(h.params, h.config, ids, mask, total, h.dtype)
    assert pc.stats()["dedup_rows_saved"] == 2
    assert pc.stats()["misses"] == 2

    np.testing.assert_allclose(
        np.asarray(logits_c, np.float32), np.asarray(logits_plain, np.float32),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cache_c.k, np.float32), np.asarray(cache_plain.k, np.float32),
        rtol=2e-4, atol=2e-4,
    )
    assert int(cache_c.length) == int(cache_plain.length)


def test_prefill_cache_cross_request_hit(lm_handler):
    """Second request with the same prompt reuses cached KV (no new prefill)."""
    import numpy as np
    from acestep_tpu.lm.prefix_cache import PrefillCache

    h = lm_handler
    prompt = h.build_formatted_prompt("lofi beats", "")
    ids, mask, bucket = h._encode_prompts([prompt], budget=8)
    total = bucket + 8

    pc = PrefillCache()
    logits1, cache1 = pc.prefill(h.params, h.config, ids, mask, total, h.dtype)
    assert pc.stats()["misses"] == 1 and pc.stats()["hits"] == 0
    logits2, cache2 = pc.prefill(h.params, h.config, ids, mask, total, h.dtype)
    assert pc.stats()["hits"] == 1
    np.testing.assert_array_equal(np.asarray(logits1), np.asarray(logits2))
    np.testing.assert_array_equal(np.asarray(cache1.k), np.asarray(cache2.k))

    # Different capacity must NOT hit (shapes are part of the key).
    pc.prefill(h.params, h.config, ids, mask, total + 8, h.dtype)
    assert pc.stats()["misses"] == 2


def test_prefill_cache_lru_eviction(lm_handler):
    from acestep_tpu.lm.prefix_cache import PrefillCache

    h = lm_handler
    prompt = h.build_formatted_prompt("ambient", "")
    ids, mask, bucket = h._encode_prompts([prompt], budget=8)
    pc = PrefillCache(max_bytes=1)  # everything evicts immediately
    pc.prefill(h.params, h.config, ids, mask, bucket + 8, h.dtype)
    assert pc.stats()["entries"] == 0
    pc.prefill(h.params, h.config, ids, mask, bucket + 8, h.dtype)
    assert pc.stats()["misses"] == 2  # no stale reuse after eviction


def test_llm_handler_generation_unaffected_by_cache(lm_handler):
    """End-to-end: same seed with and without the prefix cache → same codes."""
    import os

    out1 = lm_handler.generate_with_stop_condition(
        "calm piano", "", temperature=0.8, target_duration=2.0, seed=5,
    )
    os.environ["ACESTEP_TPU_LM_PREFIX_CACHE"] = "0"
    try:
        out2 = lm_handler.generate_with_stop_condition(
            "calm piano", "", temperature=0.8, target_duration=2.0, seed=5,
        )
    finally:
        os.environ.pop("ACESTEP_TPU_LM_PREFIX_CACHE")
    assert out1["codes"] == out2["codes"]
    assert out1["cot_text"] == out2["cot_text"]


def test_prefiltered_nucleus_matches_exact_for_peaked_dists():
    """Big-vocab top-p uses a top-K prefilter (no full sort). When the 0.9
    nucleus fits inside K (every realistic trained-model step), the sampled
    token must equal the exact full-vocab nucleus sample for the same key."""
    V = 151_936
    key = jax.random.PRNGKey(0)
    base = jnp.full((2, V), -30.0)
    peaks = jax.random.normal(jax.random.PRNGKey(1), (2, 64)) * 2.0
    logits = base.at[:, 100:164].set(peaks)

    exact = sampling._filter_top_p(logits / 0.85, 0.9)
    for s in range(5):
        k = jax.random.PRNGKey(s)
        got = sampling.sample(logits, k, 0.85, top_k=0, top_p=0.9)
        # reproduce the prefilter path's RNG consumption: categorical over the
        # top-512 gathered values equals categorical over the exact-masked
        # full row only in distribution, so compare against an explicit
        # recomputation of the same path instead:
        vals, idx = jax.lax.top_k(logits / 0.85, 512)
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs < 0.9).at[..., 0].set(True)
        vals = jnp.where(keep, vals, sampling.NEG)
        choice = jax.random.categorical(k, vals, axis=-1)
        want = jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]
        assert (got == want).all()
        # and every sampled token must lie inside the EXACT nucleus set
        picked = jnp.take_along_axis(exact, got[..., None], axis=-1)[..., 0]
        assert (picked > sampling.NEG / 2).all()


def test_host_fallback_cot_skips_genres(lm_handler, monkeypatch):
    """Main-generation CoT never emits a genres line (ref llm_inference.py:1233)
    — including on the HOST-FSM fallback path with a genres vocab loaded,
    which must enforce the same grammar as the device DFA."""
    monkeypatch.setenv("ACESTEP_TPU_NO_DEVICE_FSM", "1")
    monkeypatch.setattr(
        lm_handler, "genres_vocab", ["synthwave", "lofi", "ambient"],
        raising=False,
    )
    out = lm_handler.generate_with_stop_condition(
        "bright synth arps", "", temperature=0.8, stop_at_reasoning=True, seed=4,
    )
    assert "<think>" in out["cot_text"]
    assert "genres:" not in out["cot_text"], out["cot_text"]


def test_first_code_respects_repetition_penalty(lm_handler, monkeypatch):
    """The FIRST sampled audio code honors the prompt-seeded repetition
    penalty (HF full-context semantics), not just the scan's later steps:
    logits at prompt-seen code indices must arrive at the first sample()
    call already moved by exactly the HF penalty rule."""
    import numpy as np

    import acestep_tpu.lm.sampling as sampling_mod

    # Point the "code token" range at plain byte ids so the prompt text
    # itself seeds the penalty set (the dev tokenizer has no native codes).
    monkeypatch.setattr(lm_handler.fsm, "code_token_start", 100, raising=False)
    monkeypatch.setattr(lm_handler.fsm, "num_code_tokens", 64, raising=False)

    first_logits = []
    orig = sampling_mod.sample

    def spy(logits, key, temperature=1.0, **kw):
        try:
            # Only concrete (eager) calls — the module-global `sample` is
            # also hit by tracers inside jitted scan bodies.
            first_logits.append(np.asarray(logits, np.float32))
        except jax.errors.TracerArrayConversionError:
            pass
        return orig(logits, key, temperature, **kw)

    monkeypatch.setattr(sampling_mod, "sample", spy)

    cot = "<think>\nbpm: 100\n</think>"
    kw = dict(temperature=0.7, cfg_scale=1.0, top_k=0, top_p=1.0,
              negative_prompt="", seed=0)
    lm_handler._generate_codes("test", "", [cot], 4, repetition_penalty=1.0, **kw)
    base = first_logits[0]
    first_logits.clear()
    lm_handler._generate_codes("test", "", [cot], 4, repetition_penalty=25.0, **kw)
    pen = first_logits[0]

    diff = ~np.isclose(base, pen)
    assert diff.any(), "prompt text contains no ids in the patched code range"
    changed_b, changed_p = base[diff], pen[diff]
    expect = np.where(changed_b > 0, changed_b / 25.0, changed_b * 25.0)
    np.testing.assert_allclose(changed_p, expect, rtol=1e-5)
