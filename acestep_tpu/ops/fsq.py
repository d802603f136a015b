"""Finite Scalar Quantization (FSQ) and the single-quantizer ResidualFSQ wrapper.

Reimplements the math of vector-quantize-pytorch's FSQ/ResidualFSQ as used by
the reference audio tokenizer (`modeling_acestep_v15_turbo.py:41,1193-1197`):

- levels L = (8, 8, 8, 5, 5, 5) → codebook 64 000, code dim 6
- ``bound``: (z + shift)·tanh scaled into [-(L-1)/2, (L-1)/2] with an offset of
  0.5 for even levels (shift = atanh(offset / half_l), eps = 1e-3)
- quantize: round(bound(z)) / (L // 2)  → values in [-1, 1]
- index encoding: mixed-radix over ``basis = cumprod([1, *levels[:-1]])``

The LM emits these indices as ``<|audio_code_N|>`` tokens; decode parity with
the torch package is required so LM codes detokenize into the same latents
(SURVEY §7.3 "ResidualFSQ parity"). Quantization runs in float32 (the torch
implementation forces f32 too).

ResidualFSQ with num_quantizers=1 reduces to: project_in (dim→6) → FSQ →
project_out (6→dim); per-quantizer scales are (levels-1)^-i = 1 for i=0.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _levels_arrays(levels: Sequence[int]):
    lv = np.asarray(levels, dtype=np.float32)
    basis = np.concatenate([[1.0], np.cumprod(lv[:-1])]).astype(np.float32)
    half_width = (np.asarray(levels, dtype=np.int32) // 2).astype(np.float32)
    return lv, basis, half_width


def fsq_bound(z: jax.Array, levels: Sequence[int], eps: float = 1e-3) -> jax.Array:
    lv, _, _ = _levels_arrays(levels)
    lv = jnp.asarray(lv)
    half_l = (lv - 1.0) * (1.0 + eps) / 2.0
    offset = jnp.where(jnp.asarray(levels) % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def fsq_quantize(z: jax.Array, levels: Sequence[int]) -> jax.Array:
    """Quantize bounded z to normalized code values in [-1, 1]. float32 math."""
    _, _, half_width = _levels_arrays(levels)
    zf = z.astype(jnp.float32)
    quantized = jnp.round(fsq_bound(zf, levels))
    return quantized / jnp.asarray(half_width)


def fsq_codes_to_indices(codes: jax.Array, levels: Sequence[int]) -> jax.Array:
    """Normalized codes (..., d) → integer indices (...)."""
    lv, basis, half_width = _levels_arrays(levels)
    scaled = codes.astype(jnp.float32) * jnp.asarray(half_width) + jnp.asarray(half_width)
    return jnp.sum(scaled * jnp.asarray(basis), axis=-1).astype(jnp.int32)


def fsq_indices_to_codes(indices: jax.Array, levels: Sequence[int]) -> jax.Array:
    """Integer indices (...) → normalized codes (..., d) in [-1, 1], float32."""
    lv, basis, half_width = _levels_arrays(levels)
    idx = indices.astype(jnp.float32)[..., None]
    codes_non_centered = jnp.mod(jnp.floor(idx / jnp.asarray(basis)), jnp.asarray(lv))
    return (codes_non_centered - jnp.asarray(half_width)) / jnp.asarray(half_width)


def residual_fsq_forward(
    params, z: jax.Array, levels: Sequence[int]
) -> Tuple[jax.Array, jax.Array]:
    """project_in → FSQ → project_out. Returns (quantized_out, indices).

    params: {"project_in": linear, "project_out": linear} with torch-Linear
    semantics (kernel stored (in, out), bias present).
    z: (..., dim). Single-quantizer path (scale = 1).
    """
    from acestep_tpu.ops.basic import linear

    zc = linear(params["project_in"], z).astype(jnp.float32)
    codes = fsq_quantize(zc, levels)
    indices = fsq_codes_to_indices(codes, levels)
    out = linear(params["project_out"], codes.astype(z.dtype))
    return out, indices


def residual_fsq_decode_indices(params, indices: jax.Array, levels: Sequence[int], dtype=jnp.bfloat16) -> jax.Array:
    """ResidualFSQ.get_output_from_indices for num_quantizers=1.

    indices: (..., ) or (..., 1) int — the trailing quantizer axis is squeezed.
    Returns (..., dim).
    """
    from acestep_tpu.ops.basic import linear

    if indices.shape and indices.shape[-1] == 1:
        indices = indices[..., 0]
    codes = fsq_indices_to_codes(indices, levels)
    return linear(params["project_out"], codes.astype(dtype))
