"""Pallas fused kernel for Oobleck decoder residual-unit chains.

The VAE decoder's hot stages run at audio-adjacent rates (up to 2.88M frames
per 60 s batch) with 128–256 channels. XLA executes each Snake → k7-dilated
conv → Snake → k1 conv → residual as separate HBM round trips; this kernel
fuses a whole 3-res-unit chain (dilations 1/3/9, ref OobleckDecoderBlock
structure mirrored at `acestep/models/mlx/vae_model.py:119-142`) into one
VMEM-resident pass: read x once, write the result once.

Tiling: grid (B, L/TILE); each program DMA-reads its tile plus a static halo
(Σ 3·dilation per unit = 39 frames each side), computes everything in VMEM
(Snake in fp32 on the VPU, conv taps as MXU matmuls with fp32 accumulation),
and writes the central TILE rows.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DILATIONS = (1, 3, 9)
HALO_PER_UNIT = tuple(3 * d for d in DILATIONS)
NEEDED_HALO = sum(HALO_PER_UNIT)  # 39
TOTAL_HALO = 40  # sublane-aligned (>= NEEDED_HALO, multiple of 8)


def _snake_f32(x_f32, alpha, beta):
    # sin² via the range-reduced even polynomial (ops.basic.sin2_f32):
    # math.sin on the VPU costs ~19 ms per full-rate activation at 48 kHz
    # stereo scale and dominated this kernel; the polynomial runs at ALU rate.
    from acestep_tpu.ops.basic import sin2_f32

    a = jnp.exp(alpha.astype(jnp.float32))
    b = jnp.exp(beta.astype(jnp.float32))
    return x_f32 + (1.0 / (b + 1e-9)) * sin2_f32(a * x_f32)


def _res_units_kernel(
    x_ref,  # (1, tile + 2*TOTAL_HALO, C)
    *refs,
):
    """refs layout: per unit (w1 (7,C,C), b1, a1, b1s, w2 (C,C), b2, a2, b2s) ×3, out_ref."""
    out_ref = refs[-1]
    params = refs[:-1]

    h = x_ref[0]  # (T0, C) in x dtype
    valid = h.shape[0]
    for u in range(3):
        (w1, b1, al1, be1, w2, b2, al2, be2) = params[u * 8 : (u + 1) * 8]
        d = DILATIONS[u]
        shrink = 3 * d
        new_valid = valid - 2 * shrink

        hf = _snake_f32(h.astype(jnp.float32), al1[0], be1[0])
        a16 = hf.astype(x_ref.dtype)

        acc = jnp.zeros((new_valid, h.shape[1]), jnp.float32)
        for j in range(7):
            off = j * d
            seg = jax.lax.dynamic_slice_in_dim(a16, off, new_valid, axis=0)
            acc += jax.lax.dot_general(
                seg, w1[j], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        acc += b1[0].astype(jnp.float32)

        zf = _snake_f32(acc, al2[0], be2[0])
        z = jax.lax.dot_general(
            zf.astype(x_ref.dtype), w2[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2[0].astype(jnp.float32)

        h_center = jax.lax.dynamic_slice_in_dim(h, shrink, new_valid, axis=0)
        h = (h_center.astype(jnp.float32) + z).astype(x_ref.dtype)
        valid = new_valid

    out_ref[0] = h


def res_units_pallas(
    x: jax.Array,  # (B, L, C)
    unit_params: Sequence[Dict[str, Any]],
    *,
    tile: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Fused 3-res-unit chain (public entry).

    Halo handling without overlapping blocks: the (padded) input is passed
    three times with index maps (ti−1, ti, ti+1); the kernel assembles
    tile+2·HALO rows from the neighbor blocks' edges, so no windowed copy of
    the activation ever materializes in HBM.
    """
    b, l, c = x.shape
    tile = min(tile, l if l % 8 == 0 else l + (-l) % 8)
    n_tiles = -(-l // tile)
    pad_r = n_tiles * tile - l
    xp = jnp.pad(x, ((0, 0), (0, pad_r), (0, 0)))
    seq_len = l

    flat_params = []
    for u in range(3):
        p = unit_params[u]
        flat_params += [
            p["conv1"]["kernel"].astype(x.dtype),  # (7, C, C)
            p["conv1"]["bias"].reshape(1, -1).astype(jnp.float32),
            p["snake1"]["alpha"].reshape(1, -1).astype(jnp.float32),
            p["snake1"]["beta"].reshape(1, -1).astype(jnp.float32),
            p["conv2"]["kernel"][0].astype(x.dtype),  # (C, C)
            p["conv2"]["bias"].reshape(1, -1).astype(jnp.float32),
            p["snake2"]["alpha"].reshape(1, -1).astype(jnp.float32),
            p["snake2"]["beta"].reshape(1, -1).astype(jnp.float32),
        ]

    grid = (b, n_tiles)
    last = n_tiles - 1
    in_specs = [
        pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, tile, c),
            lambda bi, ti: (bi, jnp.maximum(ti - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, tile, c),
            lambda bi, ti, _last=last: (bi, jnp.minimum(ti + 1, _last), 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    for u in range(3):
        in_specs += [
            pl.BlockSpec((7, c, c), lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ]

    t_in = tile + 2 * TOTAL_HALO

    def kernel(cur_ref, prev_ref, next_ref, *refs):
        out_ref = refs[-1]
        params = refs[:-1]
        ti = pl.program_id(1)

        # Assemble tile + halo rows; zero halo at the grid boundary (sequence
        # zero-padding semantics of the torch convs).
        prev_tail = prev_ref[0, tile - TOTAL_HALO :, :]
        next_head = next_ref[0, :TOTAL_HALO, :]
        zero = jnp.zeros_like(prev_tail)
        left = jnp.where(ti > 0, prev_tail, zero)
        right = jnp.where(ti < pl.num_programs(1) - 1, next_head, zero)
        h = jnp.concatenate([left, cur_ref[0], right], axis=0)  # (t_in, C)

        valid = t_in
        offset = 0
        for u in range(3):
            (w1, b1, al1, be1, w2, b2, al2, be2) = params[u * 8 : (u + 1) * 8]
            d = DILATIONS[u]
            shrink = 3 * d
            new_valid = valid - 2 * shrink

            # Zero rows outside [0, seq_len) so every unit sees the same
            # zero-padded input as the sequential reference chain.
            row_global = (
                ti * tile - TOTAL_HALO + offset
                + jax.lax.broadcasted_iota(jnp.int32, (valid, 1), 0)
            )
            in_seq = (row_global >= 0) & (row_global < seq_len)
            h = jnp.where(in_seq, h, jnp.zeros_like(h))

            hf = _snake_f32(h.astype(jnp.float32), al1[0], be1[0])
            a16 = hf.astype(cur_ref.dtype)

            acc = jnp.zeros((new_valid, c), jnp.float32)
            for j in range(7):
                seg = jax.lax.slice_in_dim(a16, j * d, j * d + new_valid, axis=0)
                acc += jax.lax.dot_general(
                    seg, w1[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc += b1[0]

            zf = _snake_f32(acc, al2[0], be2[0])
            z = jax.lax.dot_general(
                zf.astype(cur_ref.dtype), w2[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2[0]

            h_center = jax.lax.slice_in_dim(h, shrink, shrink + new_valid, axis=0)
            h = (h_center.astype(jnp.float32) + z).astype(cur_ref.dtype)
            valid = new_valid
            offset += shrink
        # h covers [ti*tile - (TOTAL_HALO - NEEDED_HALO), ...): slice the tile.
        margin = TOTAL_HALO - NEEDED_HALO
        out_ref[0] = jax.lax.slice_in_dim(h, margin, margin + tile, axis=0)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile, c), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, *flat_params)

    return out[:, :l, :]
