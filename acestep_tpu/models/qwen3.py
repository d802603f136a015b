"""Qwen3 transformer — JAX implementation serving two roles:

1. Text encoder: Qwen3-Embedding-0.6B used for prompt/lyric embeddings
   (reference `init_service_loader.py:146-161`, `conditioning_embed.py:73-81`
   — causal forward, last_hidden_state; lyric path uses the raw embedding
   table).
2. The 5 Hz planner LM (acestep-5Hz-lm-*): autoregressive decoding with a
   preallocated HBM KV cache — the TPU-native replacement for the reference's
   nano-vllm engine (`third_parts/nano-vllm`). Prefill and decode are separate
   jitted programs; the cache is updated in place via dynamic_update_slice
   (the XLA equivalent of nano-vllm's Triton `store_kvcache` scatter kernel).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import Qwen3Config
from acestep_tpu.ops.attention import attention, make_attention_bias
from acestep_tpu.ops.basic import linear, mlp_swiglu, rms_norm
from acestep_tpu.ops.rope import apply_rope, rope_cos_sin

Params = Dict[str, Any]


class KVCache(NamedTuple):
    """Per-layer stacked KV cache: k/v are (L, B, max_len, n_kv, head_dim)."""

    k: jax.Array
    v: jax.Array
    length: jax.Array  # () int32 — number of valid positions

    @staticmethod
    def create(cfg: Qwen3Config, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
        return KVCache(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype), length=jnp.zeros((), jnp.int32)
        )


def _split_heads(x, n, h):
    return x.reshape(x.shape[0], x.shape[1], n, h)


def _layer_forward(
    p: Params,
    cfg: Qwen3Config,
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    kv_mask: Optional[jax.Array],
    cache_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
):
    """One Qwen3 decoder layer. Returns (x, (k, v)) — new K/V for caching."""
    h = rms_norm(p["input_layernorm"]["weight"], x, cfg.rms_norm_eps)
    a = p["self_attn"]
    q = _split_heads(linear(a["q_proj"], h), cfg.num_attention_heads, cfg.head_dim)
    q = rms_norm(a["q_norm"]["weight"], q, cfg.rms_norm_eps)
    k = _split_heads(linear(a["k_proj"], h), cfg.num_key_value_heads, cfg.head_dim)
    k = rms_norm(a["k_norm"]["weight"], k, cfg.rms_norm_eps)
    v = _split_heads(linear(a["v_proj"], h), cfg.num_key_value_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache_kv is not None:
        k_all, v_all = cache_kv
    else:
        k_all, v_all = k, v
    o = attention(q, k_all, v_all, kv_mask=kv_mask, causal=True, scale=cfg.head_dim**-0.5)
    o = linear(a["o_proj"], o.reshape(x.shape[0], x.shape[1], -1))
    x = x + o
    h = rms_norm(p["post_attention_layernorm"]["weight"], x, cfg.rms_norm_eps)
    x = x + mlp_swiglu(p["mlp"], h)
    return x, (k, v)


def forward_hidden(
    params: Params,
    cfg: Qwen3Config,
    input_ids: jax.Array,  # (B, L)
    attention_mask: Optional[jax.Array] = None,  # (B, L) — key padding
) -> jax.Array:
    """Full causal forward → last_hidden_state (text-encoder role)."""
    x = params["embed_tokens"]["weight"][input_ids]
    l = x.shape[1]
    cos, sin = rope_cos_sin(l, cfg.head_dim, cfg.rope_theta)
    for lp in params["layers"]:
        x, _ = _layer_forward(lp, cfg, x, cos, sin, attention_mask)
    return rms_norm(params["norm"]["weight"], x, cfg.rms_norm_eps)


def embed_tokens(params: Params, input_ids: jax.Array) -> jax.Array:
    """Raw embedding-table lookup (lyric path, ref conditioning_embed.py:78-81)."""
    return params["embed_tokens"]["weight"][input_ids]


def logits_from_hidden(params: Params, cfg: Qwen3Config, hidden: jax.Array) -> jax.Array:
    head = params.get("lm_head")
    if head is None:  # tied embeddings
        w = params["embed_tokens"]["weight"]
        return jnp.dot(hidden, w.T.astype(hidden.dtype), preferred_element_type=jnp.float32)
    return jnp.dot(hidden, head["kernel"].astype(hidden.dtype), preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# LM prefill / decode with KV cache
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill(
    params: Params,
    cfg: Qwen3Config,
    input_ids: jax.Array,  # (B, L) — right-padded to a bucket
    prompt_mask: jax.Array,  # (B, L) 1 for real tokens
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """Process the whole prompt; returns (logits_at_last_token (B, V), cache)."""
    b, l = input_ids.shape
    x = params["embed_tokens"]["weight"][input_ids]
    cos, sin = rope_cos_sin(l, cfg.head_dim, cfg.rope_theta)

    new_k, new_v = [], []
    for lp in params["layers"]:
        x, (k, v) = _layer_forward(lp, cfg, x, cos, sin, prompt_mask)
        new_k.append(k)
        new_v.append(v)
    x = rms_norm(params["norm"]["weight"], x, cfg.rms_norm_eps)

    k_stack = jnp.stack(new_k)  # (layers, B, L, n_kv, h)
    v_stack = jnp.stack(new_v)
    cache_k = jax.lax.dynamic_update_slice(cache.k, k_stack.astype(cache.k.dtype), (0, 0, 0, 0, 0))
    cache_v = jax.lax.dynamic_update_slice(cache.v, v_stack.astype(cache.v.dtype), (0, 0, 0, 0, 0))

    # Last real token per sequence (right-padded prompts).
    last_idx = jnp.sum(prompt_mask.astype(jnp.int32), axis=1) - 1  # (B,)
    last_hidden = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)[:, 0]
    logits = logits_from_hidden(params, cfg, last_hidden[:, None, :])[:, 0]
    # cache length = max prompt length used (per-batch lengths equal after padding)
    return logits, KVCache(cache_k, cache_v, jnp.max(last_idx) + 1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_step(
    params: Params,
    cfg: Qwen3Config,
    token_ids: jax.Array,  # (B,) current tokens
    positions: jax.Array,  # (B,) positions of these tokens
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """Single autoregressive step → (logits (B, V), updated cache)."""
    b = token_ids.shape[0]
    max_len = cache.k.shape[2]
    x = params["embed_tokens"]["weight"][token_ids][:, None, :]  # (B, 1, D)

    # Per-position rope (positions may differ per batch row).
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim)
    )
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None]  # (B, h/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)[:, None, :]  # (B, 1, h)
    cos, sin = jnp.cos(emb)[:, :, None, :], jnp.sin(emb)[:, :, None, :]

    kv_pos = jnp.arange(max_len)
    kv_mask = (kv_pos[None, :] <= positions[:, None])[:, None, None, :]  # (B,1,1,max)

    cache_k, cache_v = cache.k, cache.v
    for i, lp in enumerate(params["layers"]):
        h = rms_norm(lp["input_layernorm"]["weight"], x, cfg.rms_norm_eps)
        a = lp["self_attn"]
        q = _split_heads(linear(a["q_proj"], h), cfg.num_attention_heads, cfg.head_dim)
        q = rms_norm(a["q_norm"]["weight"], q, cfg.rms_norm_eps)
        k = _split_heads(linear(a["k_proj"], h), cfg.num_key_value_heads, cfg.head_dim)
        k = rms_norm(a["k_norm"]["weight"], k, cfg.rms_norm_eps)
        v = _split_heads(linear(a["v_proj"], h), cfg.num_key_value_heads, cfg.head_dim)
        qf = (q.astype(jnp.float32) * cos + _rot_half(q.astype(jnp.float32)) * sin).astype(q.dtype)
        kf = (k.astype(jnp.float32) * cos + _rot_half(k.astype(jnp.float32)) * sin).astype(k.dtype)

        # Scatter new K/V at per-row positions (dynamic_update_slice per row —
        # the one-hot-blend alternative reads and rewrites the WHOLE cache
        # every token; this writes one row). The TPU equivalent of nano-vllm's
        # Triton `store_kvcache` scatter (`nanovllm/layers/attention.py:38-59`).
        # dynamic_update_slice clamps out-of-range starts, which would silently
        # overwrite the NEWEST row once a position reaches the allocation; make
        # pos >= max_len an explicit no-op by writing the existing row back.
        def _upd_one(c, new, pos):
            cur = jax.lax.dynamic_slice(c, (pos, 0, 0), (1,) + c.shape[1:])
            val = jnp.where(pos < max_len, new.astype(c.dtype), cur)
            return jax.lax.dynamic_update_slice(c, val, (pos, 0, 0))

        upd = jax.vmap(_upd_one)
        ki = upd(cache_k[i], kf, positions)
        vi = upd(cache_v[i], v, positions)
        cache_k = cache_k.at[i].set(ki)
        cache_v = cache_v.at[i].set(vi)

        o = attention(qf, ki, vi, mask=kv_mask, scale=cfg.head_dim**-0.5)
        x = x + linear(a["o_proj"], o.reshape(b, 1, -1))
        h2 = rms_norm(lp["post_attention_layernorm"]["weight"], x, cfg.rms_norm_eps)
        x = x + mlp_swiglu(lp["mlp"], h2)

    x = rms_norm(params["norm"]["weight"], x, cfg.rms_norm_eps)
    logits = logits_from_hidden(params, cfg, x)[:, 0]
    return logits, KVCache(cache_k, cache_v, cache.length + 1)


def _rot_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


# ---------------------------------------------------------------------------
# Init + conversion
# ---------------------------------------------------------------------------


def init_qwen3_params(key, cfg: Qwen3Config, dtype=jnp.bfloat16, with_lm_head: Optional[bool] = None) -> Params:
    from acestep_tpu.params import _KeyGen, _linear

    kg = _KeyGen(key)
    d = cfg.hidden_size

    def attn_p():
        return {
            "q_proj": _linear(kg, d, cfg.num_attention_heads * cfg.head_dim, dtype, bias=False),
            "k_proj": _linear(kg, d, cfg.num_key_value_heads * cfg.head_dim, dtype, bias=False),
            "v_proj": _linear(kg, d, cfg.num_key_value_heads * cfg.head_dim, dtype, bias=False),
            "o_proj": _linear(kg, cfg.num_attention_heads * cfg.head_dim, d, dtype, bias=False),
            "q_norm": {"weight": jnp.ones((cfg.head_dim,), dtype)},
            "k_norm": {"weight": jnp.ones((cfg.head_dim,), dtype)},
        }

    layers = [
        {
            "input_layernorm": {"weight": jnp.ones((d,), dtype)},
            "self_attn": attn_p(),
            "post_attention_layernorm": {"weight": jnp.ones((d,), dtype)},
            "mlp": {
                "gate_proj": _linear(kg, d, cfg.intermediate_size, dtype, bias=False),
                "up_proj": _linear(kg, d, cfg.intermediate_size, dtype, bias=False),
                "down_proj": _linear(kg, cfg.intermediate_size, d, dtype, bias=False),
            },
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    params = {
        "embed_tokens": {
            "weight": jax.random.normal(kg(), (cfg.vocab_size, d), jnp.float32).astype(dtype) * 0.02
        },
        "layers": layers,
        "norm": {"weight": jnp.ones((d,), dtype)},
    }
    if with_lm_head is None:
        with_lm_head = not cfg.tie_word_embeddings
    if with_lm_head:
        params["lm_head"] = _linear(kg, d, cfg.vocab_size, dtype, bias=False)
    return params


def convert_torch_qwen3_state(state: Dict[str, Any], cfg: Qwen3Config, dtype=jnp.bfloat16) -> Params:
    """Convert an HF Qwen3Model / Qwen3ForCausalLM state_dict."""

    def get(name):
        for cand in (name, "model." + name):
            if cand in state:
                return np.asarray(state[cand], dtype=np.float32)
        raise KeyError(name)

    def lin(prefix):
        return {"kernel": jnp.asarray(get(prefix + ".weight").T).astype(dtype)}

    def norm(prefix):
        return {"weight": jnp.asarray(get(prefix + ".weight")).astype(dtype)}

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"layers.{i}"
        layers.append({
            "input_layernorm": norm(pre + ".input_layernorm"),
            "self_attn": {
                "q_proj": lin(pre + ".self_attn.q_proj"),
                "k_proj": lin(pre + ".self_attn.k_proj"),
                "v_proj": lin(pre + ".self_attn.v_proj"),
                "o_proj": lin(pre + ".self_attn.o_proj"),
                "q_norm": norm(pre + ".self_attn.q_norm"),
                "k_norm": norm(pre + ".self_attn.k_norm"),
            },
            "post_attention_layernorm": norm(pre + ".post_attention_layernorm"),
            "mlp": {
                "gate_proj": lin(pre + ".mlp.gate_proj"),
                "up_proj": lin(pre + ".mlp.up_proj"),
                "down_proj": lin(pre + ".mlp.down_proj"),
            },
        })
    params = {
        "embed_tokens": {"weight": jnp.asarray(get("embed_tokens.weight")).astype(dtype)},
        "layers": layers,
        "norm": norm("norm"),
    }
    if "lm_head.weight" in state and not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": jnp.asarray(np.asarray(state["lm_head.weight"], dtype=np.float32).T).astype(dtype)}
    return params
