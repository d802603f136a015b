"""Pallas TPU flash attention for the ACE-Step DiT / encoders.

One kernel covers the model's whole attention surface (replacing the
reference's flash-attn/SDPA/eager fallback ladder, SURVEY §7.1):

- bidirectional self-attention (DiT decoder + all encoders)
- sliding-window attention |i−j| ≤ w (alternating DiT layers,
  ref `create_4d_mask` geometry, `modeling_acestep_v15_turbo.py:93-102`) —
  the kernel only *reads* the key band that intersects the window, so
  sliding layers do O(L·w) work instead of O(L²)
- optional causal masking (LM prefill)
- GQA: q heads map onto fewer K/V heads without materializing repeats
- optional key-padding mask (bucketed static shapes)

Design note (v5e+): VMEM is large enough (~128 MiB) to hold an entire
(block_q, L_k) score tile for every sequence length this model produces
(≤ 7 500 DiT tokens for a 600 s song, ≤ 4 096 LM tokens). A loop-free
kernel — one QKᵀ dot, exact fp32 softmax, one PV dot — beats the classic
online-softmax K-block loop by ~4× here, because the loop's carry
(rescale by alpha each block) serializes the MXU pipeline. All dots take
bf16 inputs with fp32 accumulation (bf16×bf16→fp32 is the MXU fast path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # CompilerParams lives in the TPU-specific namespace
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover - non-TPU jax builds
    pltpu = None

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

_LANE = 128  # TPU lane width; K-band starts align to it

# Perf note (measured on v5e, seq 3840, tools/probe_kernel_parts.py): the
# kernel is MXU-dot-bound — stripping the entire softmax ("dots" mode)
# changes nothing (~33 TFLOPS either way), a polynomial exp2 replacement
# is likewise neutral, and the official
# jax.experimental.pallas.ops.tpu.flash_attention measures ~40% SLOWER at
# this shape (21 vs 33 TFLOPS). head_dim-128 attention dots sit well below
# the chip's big-matmul rate (~176 TFLOPS) on every implementation tried;
# keep the simple exact-softmax form.


def _band_kernel(
    q_ref,  # (1, 1, bq, h)
    k_ref,  # (1, 1, lk, h)
    v_ref,  # (1, 1, lk, h)
    mask_ref,  # (1, 1, lk) int32
    o_ref,  # (1, 1, bq, h)
    *,
    scale: float,
    window: Optional[int],
    causal: bool,
    lk: int,
    bq: int,
    band: int,
    has_mask: bool,
):
    qi = pl.program_id(2)
    q_start = qi * bq

    q = q_ref[0, 0]  # (bq, h) — storage dtype (bf16) for the MXU fast path

    if band == lk:
        k_start = 0
        kblk = k_ref[0, 0]  # (lk, h)
        vblk = v_ref[0, 0]
    else:
        # Lane-aligned band start covering [q_start − w, q_start + bq − 1 + w].
        w = window or 0
        k_start = jnp.clip((q_start - w) // _LANE, 0, (lk - band) // _LANE) * _LANE
        kblk = k_ref[0, 0, pl.ds(k_start, band), :]  # (band, h)
        vblk = v_ref[0, 0, pl.ds(k_start, band), :]

    s = jax.lax.dot_general(
        q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, band) fp32 accumulation
    s = s * scale

    row = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, band), 0)
    col = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, band), 1)
    valid = jnp.ones((bq, band), dtype=jnp.bool_)
    if causal:
        valid &= col <= row
    if window is not None:
        diff = row - col
        if causal:
            valid &= diff <= window
        else:
            valid &= jnp.abs(diff) <= window
    if has_mask:
        if band == lk:
            valid &= mask_ref[0, 0] > 0
        else:
            valid &= mask_ref[0, 0, pl.ds(k_start, band)] > 0
    s = jnp.where(valid, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
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
    block_k: int = 256,  # kept for API compatibility; band kernel ignores it
    interpret: bool = False,
) -> jax.Array:
    """Flash attention with the `acestep_tpu.ops.attention.attention` interface."""
    del block_k
    b, lq, nq, h = q.shape
    _, lk, nkv, _ = k.shape
    groups = nq // nkv
    scale = h**-0.5 if scale is None else scale

    # One q block when the whole row fits comfortably (grid-step overhead
    # dominates at these sizes); otherwise tile queries.
    if lq <= 1024:
        block_q = -(-lq // _LANE) * _LANE
    else:
        block_q = min(block_q, max(_LANE, lq))

    # Head-major layout for the kernel.
    qh = _pad_to(q.transpose(0, 2, 1, 3), 2, block_q)
    kh = _pad_to(k.transpose(0, 2, 1, 3), 2, _LANE)
    vh = _pad_to(v.transpose(0, 2, 1, 3), 2, _LANE)
    lq_p, lk_p = qh.shape[2], kh.shape[2]

    if window is not None:
        # Band covering [q_start − w, q_start + bq − 1 + w] from any
        # lane-aligned start ≤ q_start − w (+_LANE slack for alignment).
        band = min(lk_p, -(-(block_q + 2 * window) // _LANE) * _LANE + _LANE)
    else:
        band = lk_p

    if kv_mask is not None:
        maskp = _pad_to(kv_mask.astype(jnp.int32), 1, _LANE)
        has_mask = True
    elif lk_p != lk:
        maskp = _pad_to(jnp.ones((b, lk), jnp.int32), 1, _LANE)
        has_mask = True
    else:
        maskp = jnp.zeros((b, lk_p), jnp.int32)
        has_mask = False
    maskp = maskp[:, None, :]  # (B, 1, lk_p) — TPU block-tiling friendly

    grid = (b, nq, lq_p // block_q)

    kernel = functools.partial(
        _band_kernel,
        scale=scale,
        window=window,
        causal=causal,
        lk=lk_p,
        bq=block_q,
        band=band,
        has_mask=has_mask,
    )

    # Raise the scoped-VMEM ceiling: at lk=7500+ (the 300/600 s buckets) the
    # one-shot tile — fp32 scores + probs (bq × lk_p) plus the K/V band —
    # exceeds the compiler's default scoped limit (16 MiB on some toolchains);
    # v5e/v5p have ≥128 MiB physical VMEM, so grant the kernel what it needs.
    compiler_params = None
    if pltpu is not None:
        need = (
            2 * 4 * block_q * band  # scores + probs, fp32
            + 2 * 2 * band * h  # K + V band, bf16
            + 4 * block_q * h  # q + out tiles
            + 4 * lk_p
        )
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=min(max(32 * 2**20, need + need // 2), 120 * 2**20)
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=compiler_params,
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
