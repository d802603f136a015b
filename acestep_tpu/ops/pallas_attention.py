"""Pallas TPU flash attention for the ACE-Step DiT / encoders.

One kernel covers the model's whole attention surface (replacing the
reference's flash-attn/SDPA/eager fallback ladder, SURVEY §7.1):

- bidirectional self-attention (DiT decoder + all encoders)
- sliding-window attention |i−j| ≤ w (alternating DiT layers,
  ref `create_4d_mask` geometry, `modeling_acestep_v15_turbo.py:93-102`) —
  the kernel only *visits* key blocks inside the window, so sliding layers
  do O(L·w) work instead of O(L²)
- optional causal masking (LM prefill)
- GQA: q heads map onto fewer K/V heads without materializing repeats
- optional key-padding mask (bucketed static shapes)

Online-softmax accumulation in fp32; K/V for one (batch, kv-head) stay
resident in VMEM across all query blocks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(
    q_ref,  # (1, 1, bq, h)
    k_ref,  # (1, 1, lk, h)
    v_ref,  # (1, 1, lk, h)
    mask_ref,  # (1, 1, lk) int32
    o_ref,  # (1, 1, bq, h)
    *,
    scale: float,
    window: Optional[int],
    causal: bool,
    bk: int,
    lk: int,
    bq: int,
    has_mask: bool,
):
    qi = pl.program_id(2)
    q_start = qi * bq

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (bq, h)
    h = q.shape[-1]

    row = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    nkb = lk // bk
    if window is not None:
        # Static trip count, dynamic base: visit the ≤n_visit key blocks that
        # intersect [q_start − w, q_start + bq − 1 + w]. A static loop keeps
        # Mosaic's pipeline fully unrollable (dynamic bounds serialize badly).
        n_visit = min((bq + 2 * window - 1) // bk + 2, nkb)
        kb0 = jnp.clip((q_start - window) // bk, 0, nkb - n_visit)
        lo, hi = 0, n_visit
        base = kb0
    elif causal:
        lo = 0
        hi = jnp.minimum((q_start + bq - 1) // bk + 1, nkb)
        base = jnp.int32(0)
    else:
        lo, hi = 0, nkb
        base = jnp.int32(0)

    def body(kb, carry):
        acc, m, l = carry
        k_start = (base + kb) * bk
        kb_idx = pl.ds(k_start, bk)
        kblk = k_ref[0, 0, kb_idx, :].astype(jnp.float32)  # (bk, h)
        vblk = v_ref[0, 0, kb_idx, :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)

        col = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        valid = jnp.ones((bq, bk), dtype=jnp.bool_)
        if causal:
            valid &= col <= row
        if window is not None:
            diff = row - col
            if causal:
                valid &= diff <= window
            else:
                valid &= jnp.abs(diff) <= window
        if has_mask:
            valid &= mask_ref[0, 0, kb_idx] > 0
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, vblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, h), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(lo, hi, body, (acc0, m0, l0))

    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "window", "causal", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jax.Array,  # (B, Lq, Nq, H)
    k: jax.Array,  # (B, Lk, Nkv, H)
    v: jax.Array,  # (B, Lk, Nkv, H)
    kv_mask: Optional[jax.Array] = None,  # (B, Lk) — 1 = valid key
    *,
    scale: Optional[float] = None,
    window: Optional[int] = None,
    causal: bool = False,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention with the `acestep_tpu.ops.attention.attention` interface."""
    b, lq, nq, h = q.shape
    _, lk, nkv, _ = k.shape
    groups = nq // nkv
    scale = h**-0.5 if scale is None else scale
    block_q = min(block_q, max(128, lq))
    block_k = min(block_k, max(128, lk))

    # Head-major layout for the kernel.
    qh = _pad_to(q.transpose(0, 2, 1, 3), 2, block_q)
    kh = _pad_to(k.transpose(0, 2, 1, 3), 2, block_k)
    vh = _pad_to(v.transpose(0, 2, 1, 3), 2, block_k)
    lq_p, lk_p = qh.shape[2], kh.shape[2]

    if kv_mask is not None:
        maskp = _pad_to(kv_mask.astype(jnp.int32), 1, block_k)
        has_mask = True
    elif lk_p != lk:
        maskp = _pad_to(jnp.ones((b, lk), jnp.int32), 1, block_k)
        has_mask = True
    else:
        maskp = jnp.zeros((b, lk_p), jnp.int32)
        has_mask = False
    maskp = maskp[:, None, :]  # (B, 1, lk_p) — TPU block-tiling friendly

    grid = (b, nq, lq_p // block_q)

    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        window=window,
        causal=causal,
        bk=block_k,
        lk=lk_p,
        bq=block_q,
        has_mask=has_mask,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, h), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, lk_p, h), lambda bi, hi, qi, g=groups: (bi, hi // g, 0, 0)),
            pl.BlockSpec((1, 1, lk_p, h), lambda bi, hi, qi, g=groups: (bi, hi // g, 0, 0)),
            pl.BlockSpec((1, 1, lk_p), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, h), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq, lq_p, h), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, maskp)

    return out[:, :, :lq, :].transpose(0, 2, 1, 3)
