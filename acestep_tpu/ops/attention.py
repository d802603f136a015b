"""Grouped-query attention with geometric (causal / sliding-window) and padding masks.

This is the XLA-fused reference path. The Pallas flash-attention kernel in
`acestep_tpu.ops.pallas_attention` implements the same interface for the hot
DiT shapes; `attention()` dispatches to it when enabled.

Mask semantics reproduce the reference's `create_4d_mask`
(`modeling_acestep_v15_turbo.py:53-132`): boolean "allowed" geometry
(causal and/or |i-j|<=window) AND-ed with a key-padding mask, converted to an
additive bias at softmax time.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def make_attention_bias(
    q_len: int,
    kv_len: Optional[int] = None,
    *,
    kv_mask: Optional[jax.Array] = None,  # (B, Lk) bool/0-1: valid keys
    window: Optional[int] = None,
    causal: bool = False,
) -> Optional[jax.Array]:
    """Build a boolean allowed-mask of shape (B or 1, 1, Lq, Lk), or None if all-allowed."""
    kv_len = q_len if kv_len is None else kv_len
    geom = None
    if causal or window is not None:
        qi = jnp.arange(q_len)[:, None]
        kj = jnp.arange(kv_len)[None, :]
        diff = qi - kj
        allowed = jnp.ones((q_len, kv_len), dtype=bool)
        if causal:
            allowed &= diff >= 0
            if window is not None:
                allowed &= diff <= window
        elif window is not None:
            allowed &= jnp.abs(diff) <= window
        geom = allowed[None, None]
    if kv_mask is not None:
        pad = kv_mask.astype(bool)[:, None, None, :]  # (B,1,1,Lk)
        geom = pad if geom is None else (geom & pad)
    return geom


def attention(
    q: jax.Array,  # (B, Lq, Nq, H)
    k: jax.Array,  # (B, Lk, Nkv, H)
    v: jax.Array,  # (B, Lk, Nkv, H)
    *,
    mask: Optional[jax.Array] = None,  # (B|1, 1, Lq, Lk) bool — True = attend
    scale: Optional[float] = None,
) -> jax.Array:
    """GQA attention, fp32 softmax, returns (B, Lq, Nq, H) in q.dtype."""
    b, lq, nq, h = q.shape
    _, lk, nkv, _ = k.shape
    groups = nq // nkv
    scale = h**-0.5 if scale is None else scale

    qg = q.reshape(b, lq, nkv, groups, h)
    # scores: (B, Nkv, G, Lq, Lk)
    scores = jnp.einsum("bqngh,bsnh->bngqs", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=scores.dtype)
        # mask (B|1,1,Lq,Lk) -> (B|1,1,1,Lq,Lk) to broadcast over (Nkv,G)
        scores = jnp.where(mask[:, :, None, :, :], scores, neg)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bngqs,bsnh->bqngh", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(b, lq, nq, h).astype(q.dtype)
