"""Qwen3 JAX implementation vs transformers' Qwen3Model (library oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.config import Qwen3Config
from acestep_tpu.models import qwen3

torch = pytest.importorskip("torch")

TINY = Qwen3Config(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=8,
    tie_word_embeddings=True,
)


def _make_hf_model():
    from transformers.models.qwen3 import Qwen3Config as HFConfig, Qwen3Model

    hf_cfg = HFConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        head_dim=TINY.head_dim,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        attention_dropout=0.0,
        use_cache=False,
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = Qwen3Model(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def models():
    hf = _make_hf_model()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = qwen3.convert_torch_qwen3_state(state, TINY, jnp.float32)
    return hf, params


def test_forward_hidden_matches_hf(models):
    hf, params = models
    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 11))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    out = qwen3.forward_hidden(params, TINY, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_forward_hidden_with_padding_mask(models):
    hf, params = models
    rng = np.random.default_rng(1)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 9))
    mask = np.ones((2, 9), dtype=np.int64)
    mask[0, 6:] = 0
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    out = np.asarray(qwen3.forward_hidden(params, TINY, jnp.asarray(ids), jnp.asarray(mask)))
    # compare only valid positions
    np.testing.assert_allclose(out[0, :6], ref[0, :6], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(out[1], ref[1], atol=2e-4, rtol=1e-3)


def test_prefill_decode_matches_full_forward(models):
    """Incremental decoding must reproduce the full-context forward logits."""
    _, params = models
    rng = np.random.default_rng(2)
    b, prompt_len, gen_len, max_len = 2, 6, 4, 16
    prompt = rng.integers(0, TINY.vocab_size, size=(b, prompt_len))
    prompt_mask = np.ones((b, prompt_len), np.int32)

    cache = qwen3.KVCache.create(TINY, b, max_len, jnp.float32)
    logits, cache = qwen3.prefill(params, TINY, jnp.asarray(prompt), jnp.asarray(prompt_mask), cache)

    toks = [np.asarray(jnp.argmax(logits, axis=-1))]
    positions = np.full((b,), prompt_len, np.int32)
    for step in range(gen_len - 1):
        logits, cache = qwen3.decode_step(
            params, TINY, jnp.asarray(toks[-1]), jnp.asarray(positions), cache
        )
        toks.append(np.asarray(jnp.argmax(logits, axis=-1)))
        positions = positions + 1

    # Oracle: full forward over prompt + generated prefix
    full_ids = np.concatenate([prompt, np.stack(toks[:-1], axis=1)], axis=1)
    hidden = qwen3.forward_hidden(params, TINY, jnp.asarray(full_ids))
    full_logits = qwen3.logits_from_hidden(params, TINY, hidden)
    expect_last = np.asarray(jnp.argmax(full_logits[:, -1], axis=-1))
    np.testing.assert_array_equal(toks[-1], expect_last)


def test_embed_tokens(models):
    _, params = models
    ids = jnp.asarray([[1, 2, 3]])
    out = qwen3.embed_tokens(params, ids)
    assert out.shape == (1, 3, TINY.hidden_size)
