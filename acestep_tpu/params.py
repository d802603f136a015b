"""Parameter pytree construction: random init and torch-checkpoint conversion.

The pytree layout mirrors the reference checkpoint's module names
(`modeling_acestep_v15_turbo.py` state_dict keys) so conversion is a pure
rename/transpose pass:

- torch ``nn.Linear.weight`` (out, in)      → ``kernel`` (in, out)
- torch ``nn.Conv1d.weight`` (out, in, K)   → ``kernel`` (K, in, out)
- torch ``nn.ConvTranspose1d.weight`` (in, out, K) → ``kernel`` (K, in, out)
- norms keep ``weight``; tables/tokens keep their shapes.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import AceStepConfig, OobleckConfig, Qwen3Config

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Random init (std=0.02 normals, matching reference _init_weights :555-571)
# ---------------------------------------------------------------------------


class _KeyGen:
    def __init__(self, key):
        self.key = key

    def __call__(self):
        self.key, sub = jax.random.split(self.key)
        return sub


def _linear(kg, d_in, d_out, dtype, bias=True, std=0.02):
    p = {"kernel": jax.random.normal(kg(), (d_in, d_out), jnp.float32).astype(dtype) * std}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def _norm(d, dtype):
    return {"weight": jnp.ones((d,), dtype)}


def _attn(kg, cfg: AceStepConfig, dtype):
    d = cfg.hidden_size
    return {
        "q_proj": _linear(kg, d, cfg.num_attention_heads * cfg.head_dim, dtype, cfg.attention_bias),
        "k_proj": _linear(kg, d, cfg.num_key_value_heads * cfg.head_dim, dtype, cfg.attention_bias),
        "v_proj": _linear(kg, d, cfg.num_key_value_heads * cfg.head_dim, dtype, cfg.attention_bias),
        "o_proj": _linear(kg, cfg.num_attention_heads * cfg.head_dim, d, dtype, cfg.attention_bias),
        "q_norm": _norm(cfg.head_dim, dtype),
        "k_norm": _norm(cfg.head_dim, dtype),
    }


def _mlp(kg, cfg: AceStepConfig, dtype):
    d, i = cfg.hidden_size, cfg.intermediate_size
    return {
        "gate_proj": _linear(kg, d, i, dtype, bias=False),
        "up_proj": _linear(kg, d, i, dtype, bias=False),
        "down_proj": _linear(kg, i, d, dtype, bias=False),
    }


def _encoder_layer(kg, cfg: AceStepConfig, dtype):
    return {
        "self_attn": _attn(kg, cfg, dtype),
        "input_layernorm": _norm(cfg.hidden_size, dtype),
        "post_attention_layernorm": _norm(cfg.hidden_size, dtype),
        "mlp": _mlp(kg, cfg, dtype),
    }


def _dit_layer(kg, cfg: AceStepConfig, dtype):
    d = cfg.hidden_size
    return {
        "self_attn_norm": _norm(d, dtype),
        "self_attn": _attn(kg, cfg, dtype),
        "cross_attn_norm": _norm(d, dtype),
        "cross_attn": _attn(kg, cfg, dtype),
        "mlp_norm": _norm(d, dtype),
        "mlp": _mlp(kg, cfg, dtype),
        "scale_shift_table": (
            jax.random.normal(kg(), (1, 6, d), jnp.float32) / d**0.5
        ).astype(dtype),
    }


def _encoder_stack_params(kg, cfg: AceStepConfig, n_layers, d_in, dtype, embed_bias=True):
    return {
        "embed_tokens": _linear(kg, d_in, cfg.hidden_size, dtype, embed_bias),
        "layers": [_encoder_layer(kg, cfg, dtype) for _ in range(n_layers)],
        "norm": _norm(cfg.hidden_size, dtype),
    }


def init_acestep_params(key, cfg: AceStepConfig, dtype=jnp.bfloat16) -> Params:
    kg = _KeyGen(key)
    d = cfg.hidden_size

    decoder = {
        "layers": [_dit_layer(kg, cfg, dtype) for _ in range(cfg.num_hidden_layers)],
        "proj_in": {
            "kernel": jax.random.normal(kg(), (cfg.patch_size, cfg.in_channels, d), jnp.float32).astype(dtype) * 0.02,
            "bias": jnp.zeros((d,), dtype),
        },
        "time_embed": {
            "linear_1": _linear(kg, 256, d, dtype),
            "linear_2": _linear(kg, d, d, dtype),
            "time_proj": _linear(kg, d, d * 6, dtype),
        },
        "time_embed_r": {
            "linear_1": _linear(kg, 256, d, dtype),
            "linear_2": _linear(kg, d, d, dtype),
            "time_proj": _linear(kg, d, d * 6, dtype),
        },
        "condition_embedder": _linear(kg, d, d, dtype),
        "norm_out": _norm(d, dtype),
        "proj_out": {
            "kernel": jax.random.normal(
                kg(), (cfg.patch_size, d, cfg.audio_acoustic_hidden_dim), jnp.float32
            ).astype(dtype) * 0.02,
            "bias": jnp.zeros((cfg.audio_acoustic_hidden_dim,), dtype),
        },
        "scale_shift_table": (jax.random.normal(kg(), (1, 2, d), jnp.float32) / d**0.5).astype(dtype),
    }

    encoder = {
        "text_projector": _linear(kg, cfg.text_hidden_dim, d, dtype, bias=False),
        "lyric_encoder": _encoder_stack_params(
            kg, cfg, cfg.num_lyric_encoder_hidden_layers, cfg.text_hidden_dim, dtype
        ),
        "timbre_encoder": _encoder_stack_params(
            kg, cfg, cfg.num_timbre_encoder_hidden_layers, cfg.timbre_hidden_dim, dtype
        ),
    }

    tokenizer = {
        "audio_acoustic_proj": _linear(kg, cfg.audio_acoustic_hidden_dim, d, dtype),
        "attention_pooler": {
            "embed_tokens": _linear(kg, d, d, dtype),
            "special_token": jax.random.normal(kg(), (1, 1, d), jnp.float32).astype(dtype) * 0.02,
            "layers": [_encoder_layer(kg, cfg, dtype) for _ in range(cfg.num_attention_pooler_hidden_layers)],
            "norm": _norm(d, dtype),
        },
        "quantizer": {
            "project_in": _linear(kg, cfg.fsq_dim, len(cfg.fsq_levels), dtype),
            "project_out": _linear(kg, len(cfg.fsq_levels), cfg.fsq_dim, dtype),
        },
    }

    detok = {
        "embed_tokens": _linear(kg, d, d, dtype),
        "special_tokens": jax.random.normal(kg(), (1, cfg.pool_window_size, d), jnp.float32).astype(dtype) * 0.02,
        "layers": [_encoder_layer(kg, cfg, dtype) for _ in range(cfg.num_attention_pooler_hidden_layers)],
        "norm": _norm(d, dtype),
        "proj_out": _linear(kg, d, cfg.audio_acoustic_hidden_dim, dtype),
    }

    return {
        "decoder": decoder,
        "encoder": encoder,
        "tokenizer": tokenizer,
        "detokenizer": detok,
        "null_condition_emb": jax.random.normal(kg(), (1, 1, d), jnp.float32).astype(dtype),
    }


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (safetensors → pytree)
# ---------------------------------------------------------------------------


def _to_jnp(t, dtype):
    arr = np.asarray(t, dtype=np.float32)
    return jnp.asarray(arr).astype(dtype)


def convert_torch_state_dict(
    state: Dict[str, Any], cfg: AceStepConfig, dtype=jnp.bfloat16
) -> Params:
    """Convert a reference AceStepConditionGenerationModel state_dict.

    Accepts a flat {name: array-like} mapping (torch tensors or numpy arrays).
    """

    def get(name):
        return state[name]

    def lin(prefix, bias=None):
        w = np.asarray(get(prefix + ".weight"), dtype=np.float32)
        p = {"kernel": jnp.asarray(w.T).astype(dtype)}
        if (bias is None and (prefix + ".bias") in state) or bias:
            p["bias"] = _to_jnp(get(prefix + ".bias"), dtype)
        return p

    def norm(prefix):
        return {"weight": _to_jnp(get(prefix + ".weight"), dtype)}

    def attn(prefix):
        return {
            "q_proj": lin(prefix + ".q_proj"),
            "k_proj": lin(prefix + ".k_proj"),
            "v_proj": lin(prefix + ".v_proj"),
            "o_proj": lin(prefix + ".o_proj"),
            "q_norm": norm(prefix + ".q_norm"),
            "k_norm": norm(prefix + ".k_norm"),
        }

    def mlp(prefix):
        return {
            "gate_proj": lin(prefix + ".gate_proj"),
            "up_proj": lin(prefix + ".up_proj"),
            "down_proj": lin(prefix + ".down_proj"),
        }

    def enc_layer(prefix):
        return {
            "self_attn": attn(prefix + ".self_attn"),
            "input_layernorm": norm(prefix + ".input_layernorm"),
            "post_attention_layernorm": norm(prefix + ".post_attention_layernorm"),
            "mlp": mlp(prefix + ".mlp"),
        }

    def conv(prefix):
        w = np.asarray(get(prefix + ".weight"), dtype=np.float32)  # (out, in, K)
        p = {"kernel": jnp.asarray(np.transpose(w, (2, 1, 0))).astype(dtype)}
        if prefix + ".bias" in state:
            p["bias"] = _to_jnp(get(prefix + ".bias"), dtype)
        return p

    def conv_t(prefix):
        w = np.asarray(get(prefix + ".weight"), dtype=np.float32)  # (in, out, K)
        p = {"kernel": jnp.asarray(np.transpose(w, (2, 0, 1))).astype(dtype)}
        if prefix + ".bias" in state:
            p["bias"] = _to_jnp(get(prefix + ".bias"), dtype)
        return p

    def enc_stack(prefix, n):
        return {
            "embed_tokens": lin(prefix + ".embed_tokens"),
            "layers": [enc_layer(f"{prefix}.layers.{i}") for i in range(n)],
            "norm": norm(prefix + ".norm"),
        }

    decoder = {
        "layers": [
            {
                "self_attn_norm": norm(f"decoder.layers.{i}.self_attn_norm"),
                "self_attn": attn(f"decoder.layers.{i}.self_attn"),
                "cross_attn_norm": norm(f"decoder.layers.{i}.cross_attn_norm"),
                "cross_attn": attn(f"decoder.layers.{i}.cross_attn"),
                "mlp_norm": norm(f"decoder.layers.{i}.mlp_norm"),
                "mlp": mlp(f"decoder.layers.{i}.mlp"),
                "scale_shift_table": _to_jnp(get(f"decoder.layers.{i}.scale_shift_table"), dtype),
            }
            for i in range(cfg.num_hidden_layers)
        ],
        # proj_in is nn.Sequential(Lambda, Conv1d, Lambda) → index 1
        "proj_in": conv("decoder.proj_in.1"),
        "time_embed": {
            "linear_1": lin("decoder.time_embed.linear_1"),
            "linear_2": lin("decoder.time_embed.linear_2"),
            "time_proj": lin("decoder.time_embed.time_proj"),
        },
        "time_embed_r": {
            "linear_1": lin("decoder.time_embed_r.linear_1"),
            "linear_2": lin("decoder.time_embed_r.linear_2"),
            "time_proj": lin("decoder.time_embed_r.time_proj"),
        },
        "condition_embedder": lin("decoder.condition_embedder"),
        "norm_out": norm("decoder.norm_out"),
        "proj_out": conv_t("decoder.proj_out.1"),
        "scale_shift_table": _to_jnp(get("decoder.scale_shift_table"), dtype),
    }

    encoder = {
        "text_projector": lin("encoder.text_projector"),
        "lyric_encoder": enc_stack("encoder.lyric_encoder", cfg.num_lyric_encoder_hidden_layers),
        "timbre_encoder": enc_stack("encoder.timbre_encoder", cfg.num_timbre_encoder_hidden_layers),
    }

    tokenizer = {
        "audio_acoustic_proj": lin("tokenizer.audio_acoustic_proj"),
        "attention_pooler": {
            "embed_tokens": lin("tokenizer.attention_pooler.embed_tokens"),
            "special_token": _to_jnp(get("tokenizer.attention_pooler.special_token"), dtype),
            "layers": [
                enc_layer(f"tokenizer.attention_pooler.layers.{i}")
                for i in range(cfg.num_attention_pooler_hidden_layers)
            ],
            "norm": norm("tokenizer.attention_pooler.norm"),
        },
        "quantizer": {
            "project_in": lin("tokenizer.quantizer.project_in"),
            "project_out": lin("tokenizer.quantizer.project_out"),
        },
    }

    detok = {
        "embed_tokens": lin("detokenizer.embed_tokens"),
        "special_tokens": _to_jnp(get("detokenizer.special_tokens"), dtype),
        "layers": [
            enc_layer(f"detokenizer.layers.{i}")
            for i in range(cfg.num_attention_pooler_hidden_layers)
        ],
        "norm": norm("detokenizer.norm"),
        "proj_out": lin("detokenizer.proj_out"),
    }

    return {
        "decoder": decoder,
        "encoder": encoder,
        "tokenizer": tokenizer,
        "detokenizer": detok,
        "null_condition_emb": _to_jnp(get("null_condition_emb"), dtype),
    }


def load_safetensors_state(path: str) -> Dict[str, np.ndarray]:
    """Load one or more .safetensors files into a flat numpy dict (no torch needed)."""
    from safetensors import safe_open  # type: ignore

    state: Dict[str, np.ndarray] = {}
    files = []
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".safetensors")]
    else:
        files = [path]
    for f in files:
        with safe_open(f, framework="np") as sf:
            for k in sf.keys():
                state[k] = sf.get_tensor(k)
    return state


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def unstack_decoder_params(params: Params, cfg: AceStepConfig) -> Params:
    """Recover the per-layer decoder list from the stacked serving layout.

    The serving handler stacks the alternating sliding/full decoder layers into
    two scan-able pytrees; LoRA training addresses layers individually, so both
    the CLI train path and the training REST API unstack through here (single
    source of truth — the layouts must stay interchangeable)."""
    dec = params["decoder"]
    if not isinstance(dec["layers"], dict):
        return params
    layers = []
    for i in range(cfg.num_hidden_layers):
        parity = "sliding" if i % 2 == 0 else "full"
        layers.append(jax.tree.map(lambda x: x[i // 2], dec["layers"][parity]))
    new_dec = dict(dec)
    new_dec["layers"] = layers
    return {**params, "decoder": new_dec}
