"""End-to-end pipeline test (tiny configs, random weights, CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from acestep_tpu.config import AceStepConfig, OobleckConfig, Qwen3Config
from acestep_tpu.pipeline.handler import AceStepHandler

TINY_DIT = AceStepConfig(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    sliding_window=8,
    text_hidden_dim=32,
    num_lyric_encoder_hidden_layers=2,
    num_timbre_encoder_hidden_layers=1,
    num_attention_pooler_hidden_layers=1,
    fsq_dim=64,
    timbre_fix_frame=10,
)
TINY_VAE = OobleckConfig(
    # encoder_hidden_size = 2 × latent dim so the encode mean matches the
    # DiT's 64-dim acoustic latents (as in the real checkpoint config).
    encoder_hidden_size=128,
    downsampling_ratios=(2, 4, 4),
    channel_multiples=(1, 1, 1),
    decoder_channels=16,
    decoder_input_channels=64,
    audio_channels=2,
    sampling_rate=800,  # hop 32 → 25 latent fps keeps duration math consistent
)
TINY_TEXT = Qwen3Config(
    vocab_size=300,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=8,
)


@pytest.fixture(scope="module")
def handler(monkeypatch_module=None):
    import acestep_tpu.pipeline.handler as H

    # shrink buckets for the tiny test
    H.LATENT_BUCKETS = (64, 128, 256)
    H.TEXT_BUCKETS = (32, 64)
    H.LYRIC_BUCKETS = (32, 64)
    h = AceStepHandler(TINY_DIT, TINY_VAE, TINY_TEXT, dtype=jnp.float32)
    h.sample_rate = TINY_VAE.sampling_rate * 60  # keep LATENT_HOP math harmless
    h.initialize_service(random_init=True)
    return h


def test_text2music_end_to_end(handler):
    out = handler.generate_music(
        captions="an energetic synthwave track",
        lyrics="[Instrumental]",
        audio_duration=2.0,
        batch_size=1,
        seeds=[3],
        use_random_seed=False,
        shift=3.0,
    )
    t_exact = int(2.0 * 25)
    assert out["latents"].shape == (1, t_exact, 64)
    assert np.isfinite(out["latents"]).all()
    assert out["audios"].shape[0] == 1 and out["audios"].shape[1] == 2
    assert out["audios"].shape[2] == t_exact * TINY_VAE.hop_length
    assert np.abs(out["audios"]).max() <= 1.0 + 1e-5
    assert out["num_steps"] == 8
    assert "diffusion_time_cost" in out["time_costs"]


def test_generation_is_seed_deterministic(handler):
    kw = dict(
        captions="calm piano",
        lyrics="[Instrumental]",
        audio_duration=2.0,
        batch_size=1,
        seeds=[11],
        use_random_seed=False,
        decode_audio=False,
    )
    a = handler.generate_music(**kw)["latents"]
    b = handler.generate_music(**kw)["latents"]
    np.testing.assert_array_equal(a, b)


def test_repaint_spans(handler):
    out = handler.generate_music(
        captions="rock",
        lyrics="la la la",
        audio_duration=2.0,
        batch_size=1,
        seeds=[5],
        use_random_seed=False,
        task_type="repaint",
        repainting_start=[0.5],
        repainting_end=[1.5],
        target_latents=np.zeros((1, 64, 64), np.float32),
        decode_audio=False,
    )
    kind, s, e = out["spans"][0]
    assert kind == "repainting" and 0 < s < e


def test_audio_code_roundtrip_and_cover(handler):
    codes = handler.format_audio_codes([5, 123, 63999, 0])
    assert handler.parse_audio_codes(codes) == [5, 123, 63999, 0]
    # out-of-range clamps
    assert handler.parse_audio_codes("<|audio_code_99999|>") == [63999]

    out = handler.generate_music(
        captions="cover test",
        lyrics="[Instrumental]",
        audio_duration=2.0,
        batch_size=1,
        seeds=[7],
        use_random_seed=False,
        task_type="cover",
        audio_code_strings=[handler.format_audio_codes(list(range(10)))],
        decode_audio=False,
    )
    assert np.isfinite(out["latents"]).all()


def test_extract_lego_complete_tasks(handler):
    """Stem tasks (ref constants.py:74-109): instruction templates resolve and
    the DiT path runs with target audio as src context."""
    assert "DRUMS" in handler.generate_instruction("extract", track_name="drums")
    assert "BASS" in handler.generate_instruction("lego", track_name="bass")
    instr = handler.generate_instruction("complete", complete_track_classes=["drums", "bass"])
    assert "DRUMS | BASS" in instr
    assert handler.generate_instruction("extract") == "Extract the track from the audio:"

    for task, kwargs in [
        ("extract", {}),
        ("lego", {}),
        ("complete", {}),
    ]:
        out = handler.generate_music(
            captions="stem task",
            lyrics="[Instrumental]",
            audio_duration=2.0,
            batch_size=1,
            seeds=[3],
            use_random_seed=False,
            task_type=task,
            target_latents=np.ones((1, 64, 64), np.float32) * 0.1,
            decode_audio=False,
            **kwargs,
        )
        assert np.isfinite(out["latents"]).all(), task
        assert out["latents"].shape[1] == 50  # 2 s at 25 fps


def test_multi_reference_timbre(handler):
    """Multiple reference audios per sample (ref conditioning_embed.py:18-70
    List[List[Tensor]] + order-mask semantics): 2 refs on sample 0, none on
    sample 1 (silence fallback), duplicate arrays encoded once."""
    sr = handler.sample_rate // 2  # 0.5 s refs keep the CPU encode cheap
    ref1 = (np.random.default_rng(0).standard_normal((2, sr)) * 0.1).astype(np.float32)
    ref2 = (np.random.default_rng(1).standard_normal((2, sr)) * 0.1).astype(np.float32)

    calls = []
    orig = handler.encode_reference_audio

    def counting(audio):
        calls.append(1)
        return orig(audio)

    handler.encode_reference_audio = counting
    try:
        out = handler.generate_music(
            captions="two refs",
            lyrics="[Instrumental]",
            audio_duration=2.0,
            batch_size=2,
            seeds=[1, 2],
            use_random_seed=False,
            reference_audios=[[ref1, ref2, ref1], None],
            decode_audio=False,
        )
    finally:
        handler.encode_reference_audio = orig
    assert np.isfinite(out["latents"]).all()
    assert out["latents"].shape[0] == 2
    # ref1 appears twice but is encoded once (id-dedupe, ref data_ptr cache)
    assert len(calls) == 2

    # single ndarray (back-compat) still accepted
    out = handler.generate_music(
        captions="one ref",
        lyrics="[Instrumental]",
        audio_duration=2.0,
        batch_size=1,
        seeds=[1],
        use_random_seed=False,
        reference_audios=[ref1],
        decode_audio=False,
    )
    assert np.isfinite(out["latents"]).all()

    # Regression: mixed batch (real refs + silence fallback) on a song SHORTER
    # than timbre_fix_frame — the silence ref row must still be tf frames
    # (silence_tiled is only t_latent long there; real refs pad to tf).
    import dataclasses
    old_cfg = handler.config
    handler.config = dataclasses.replace(old_cfg, timbre_fix_frame=100)  # > 64-frame bucket
    try:
        out = handler.generate_music(
            captions="short song refs",
            lyrics="[Instrumental]",
            audio_duration=2.0,
            batch_size=2,
            seeds=[1, 2],
            use_random_seed=False,
            reference_audios=[[ref1], None],
            decode_audio=False,
        )
    finally:
        handler.config = old_cfg
    assert np.isfinite(out["latents"]).all()


def test_async_finish_pipelining(handler):
    """async_finish returns a finish() closure; interleaved requests produce
    bit-identical audio to the serial path (sustained-throughput serving)."""
    kw = dict(captions="pipelined", lyrics="[Instrumental]", audio_duration=2.0,
              batch_size=1, use_random_seed=False, return_int16=True)
    ref1 = handler.generate_music(**kw, seeds=[11])
    ref2 = handler.generate_music(**kw, seeds=[22])

    a = handler.generate_music(**kw, seeds=[11], async_finish=True)
    assert "audios" not in a and callable(a["finish"])
    b = handler.generate_music(**kw, seeds=[22], async_finish=True)
    wav_a = a["finish"]()
    wav_b = b["finish"]()
    np.testing.assert_array_equal(wav_a, ref1["audios"])
    np.testing.assert_array_equal(wav_b, ref2["audios"])
    assert a["time_costs"]["total_time_cost"] > 0
