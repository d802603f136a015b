"""LRC pipeline test: attention capture → DTW → LRC text."""

import numpy as np
import pytest

import jax.numpy as jnp

from acestep_tpu.config import AceStepConfig, OobleckConfig, Qwen3Config
from acestep_tpu.pipeline.handler import AceStepHandler

TINY_DIT = AceStepConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=4,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16, sliding_window=8,
    text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
    num_timbre_encoder_hidden_layers=1, num_attention_pooler_hidden_layers=1,
    fsq_dim=64, timbre_fix_frame=10,
)
TINY_VAE = OobleckConfig(
    encoder_hidden_size=16, downsampling_ratios=(2, 4, 4), channel_multiples=(1, 2, 4),
    decoder_channels=16, decoder_input_channels=64, audio_channels=2, sampling_rate=800,
)
TINY_TEXT = Qwen3Config(
    vocab_size=300, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=8,
)


def test_lyric_timestamps_end_to_end():
    import acestep_tpu.pipeline.handler as H

    H.LATENT_BUCKETS = (64, 128)
    H.TEXT_BUCKETS = (32, 64)
    H.LYRIC_BUCKETS = (64, 128)
    handler = AceStepHandler(TINY_DIT, TINY_VAE, TINY_TEXT, dtype=jnp.float32)
    handler.initialize_service(random_init=True)
    handler.custom_layers_config = {1: [0, 1], 2: [2]}

    lyrics = "hello world\nsecond line"
    out = handler.generate_music(
        captions="test", lyrics=lyrics, audio_duration=2.0, batch_size=1,
        seeds=[1], use_random_seed=False, decode_audio=False,
        return_condition=True,
    )
    assert "condition" in out and "lyric_token_ids" in out

    lrc = handler.get_lyric_timestamps(
        out["latents"], out["condition"], out["lyric_token_ids"],
        lyrics_text=lyrics, total_duration_seconds=2.0,
        vocal_language="en", inference_steps=8, seed=42,
        lyric_mask=out["lyric_mask"],
    )
    assert lrc["success"], lrc.get("error")
    assert lrc["lrc_text"].startswith("[00:")
    assert len(lrc["sentence_timestamps"]) >= 1
    assert len(lrc["token_timestamps"]) > 0
    for s in lrc["sentence_timestamps"]:
        assert 0.0 <= s["start"] <= s["end"] <= 2.5
