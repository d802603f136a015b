"""Rotary position embeddings (Qwen3-style, duplicated-halves layout).

Matches transformers' Qwen3RotaryEmbedding + apply_rotary_pos_emb as used by
the reference (`modeling_acestep_v15_turbo.py:33-39`): ``inv_freq`` computed in
float32, cos/sin tables of shape (L, head_dim) with the frequency vector
concatenated with itself, and rotate-half application.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(0, 1))
def rope_cos_sin(seq_len: int, head_dim: int, theta: float = 1e6):
    """Return (cos, sin), each (seq_len, head_dim), float32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    pos = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)  # (L, head_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (L, head_dim)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding.

    x: (..., L, num_heads, head_dim); cos/sin: (L, head_dim) or broadcastable.
    """
    cos = cos.astype(jnp.float32)[..., :, None, :]
    sin = sin.astype(jnp.float32)[..., :, None, :]
    xf = x.astype(jnp.float32)
    return (xf * cos + _rotate_half(xf) * sin).astype(x.dtype)
