"""Grouped-query attention with geometric (causal / sliding-window) and padding masks.

Two execution paths behind one interface:
- Pallas flash attention (`acestep_tpu.ops.pallas_attention`) — used on TPU for
  large sequences; sliding-window layers do O(L·w) work.
- XLA einsum + fp32 softmax — fallback (CPU tests, tiny sequences, explicit
  4-D masks).

Mask semantics reproduce the reference's `create_4d_mask`
(`modeling_acestep_v15_turbo.py:53-132`): boolean "allowed" geometry
(causal and/or |i-j|<=window) AND-ed with a key-padding mask.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_FLASH_MIN_LEN = 256
_flash_override: Optional[bool] = None


def set_flash_enabled(value: Optional[bool]) -> None:
    """Force flash attention on/off (None = auto: TPU and big enough)."""
    global _flash_override
    _flash_override = value


def _flash_wanted(lq: int, lk: int, head_dim: int) -> bool:
    if _flash_override is not None:
        return _flash_override
    if os.environ.get("ACESTEP_TPU_NO_FLASH", "0") == "1":
        return False
    if head_dim % 128 or min(lq, lk) < _FLASH_MIN_LEN:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


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


def attention_xla(
    q: jax.Array,  # (B, Lq, Nq, H)
    k: jax.Array,  # (B, Lk, Nkv, H)
    v: jax.Array,  # (B, Lk, Nkv, H)
    *,
    mask: Optional[jax.Array] = None,  # (B|1, 1, Lq, Lk) bool — True = attend
    scale: Optional[float] = None,
) -> jax.Array:
    """GQA attention via einsum, fp32 softmax; returns (B, Lq, Nq, H) in q.dtype."""
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
        scores = jnp.where(mask[:, :, None, :, :], scores, neg)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bngqs,bsnh->bqngh", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(b, lq, nq, h).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_diff(static, q, k, v, kv_mask):
    """Differentiable wrapper: Pallas kernel forward, XLA-recompute backward.

    pallas_call has no transpose rule, so `jax.grad` through the raw kernel
    fails (this is the training path on TPU). The VJP recomputes the
    attention with the einsum formulation and differentiates that — the
    standard flash-attention trade: no stored probabilities, O(L²) recompute
    in the backward only.
    """
    window, causal, scale, interpret = static
    from acestep_tpu.ops.pallas_attention import flash_attention

    return flash_attention(
        q, k, v, kv_mask, scale=scale, window=window, causal=causal, interpret=interpret
    )


def _flash_diff_fwd(static, q, k, v, kv_mask):
    return _flash_diff(static, q, k, v, kv_mask), (q, k, v, kv_mask)


def _flash_diff_bwd(static, res, g):
    window, causal, scale, _ = static
    q, k, v, kv_mask = res

    def ref(q, k, v):
        mask = make_attention_bias(
            q.shape[1], k.shape[1], kv_mask=kv_mask, window=window, causal=causal
        )
        return attention_xla(q, k, v, mask=mask, scale=scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def attention(
    q: jax.Array,  # (B, Lq, Nq, H)
    k: jax.Array,  # (B, Lk, Nkv, H)
    v: jax.Array,  # (B, Lk, Nkv, H)
    *,
    mask: Optional[jax.Array] = None,  # explicit 4-D mask → forces XLA path
    kv_mask: Optional[jax.Array] = None,  # (B, Lk) key-padding
    window: Optional[int] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Structured-mask attention; dispatches to Pallas flash or XLA einsum."""
    lq, lk = q.shape[1], k.shape[1]
    if mask is None and _flash_wanted(lq, lk, q.shape[-1]):
        interpret = os.environ.get("ACESTEP_TPU_FLASH_INTERPRET", "0") == "1"
        scale = q.shape[-1] ** -0.5 if scale is None else scale
        return _flash_diff((window, causal, scale, interpret), q, k, v, kv_mask)
    if mask is None and (kv_mask is not None or window is not None or causal):
        mask = make_attention_bias(lq, lk, kv_mask=kv_mask, window=window, causal=causal)
    return attention_xla(q, k, v, mask=mask, scale=scale)
