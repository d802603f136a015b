"""Stacked (scan) layer execution must match the unrolled path exactly."""

import numpy as np

import jax
import jax.numpy as jnp

from acestep_tpu.config import AceStepConfig
from acestep_tpu.models import dit
from acestep_tpu.params import init_acestep_params

TINY = AceStepConfig(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    sliding_window=4,
    text_hidden_dim=32,
    num_lyric_encoder_hidden_layers=2,
    num_timbre_encoder_hidden_layers=2,
    num_attention_pooler_hidden_layers=2,
    fsq_dim=64,
    timbre_fix_frame=10,
)


def test_stacked_dit_forward_matches_unrolled():
    params = init_acestep_params(jax.random.PRNGKey(0), TINY, jnp.float32)
    stacked = dit.stack_acestep_params(params, TINY)

    rng = np.random.default_rng(0)
    b, t, enc_len = 2, 12, 9
    xt = jnp.asarray(rng.standard_normal((b, t, 64)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((b, t, 128)).astype(np.float32))
    enc = jnp.asarray(rng.standard_normal((b, enc_len, TINY.hidden_size)).astype(np.float32))
    tt = jnp.full((b,), 0.5)

    kv_list = dit.precompute_cross_kv(params["decoder"], TINY, enc)
    out_list = dit.dit_forward(params["decoder"], TINY, xt, tt, tt, ctx, kv_list)

    kv_stack = dit.precompute_cross_kv(stacked["decoder"], TINY, enc)
    out_stack = dit.dit_forward(stacked["decoder"], TINY, xt, tt, tt, ctx, kv_stack)

    np.testing.assert_allclose(np.asarray(out_list), np.asarray(out_stack), atol=2e-5, rtol=1e-4)


def test_stacked_encoder_and_tokenizer_match():
    params = init_acestep_params(jax.random.PRNGKey(1), TINY, jnp.float32)
    stacked = dit.stack_acestep_params(params, TINY)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 10, 64)).astype(np.float32))
    q1, i1 = dit.audio_tokenize(params["tokenizer"], TINY, x)
    q2, i2 = dit.audio_tokenize(stacked["tokenizer"], TINY, x)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=2e-5, rtol=1e-4)

    d1 = dit.detokenizer(params["detokenizer"], TINY, q1)
    d2 = dit.detokenizer(stacked["detokenizer"], TINY, q2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-5, rtol=1e-4)

    lyric = jnp.asarray(rng.standard_normal((2, 7, TINY.text_hidden_dim)).astype(np.float32))
    mask = jnp.ones((2, 7), jnp.int32)
    l1 = dit.lyric_encoder(params["encoder"]["lyric_encoder"], TINY, lyric, mask)
    l2 = dit.lyric_encoder(stacked["encoder"]["lyric_encoder"], TINY, lyric, mask)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-5, rtol=1e-4)


def test_can_stack_detection():
    assert dit.can_stack_layers(TINY, 4)
    assert not dit.can_stack_layers(TINY, 3)
    cfg_custom = AceStepConfig(layer_types=("full_attention", "full_attention"))
    assert not dit.can_stack_layers(cfg_custom, 2)
