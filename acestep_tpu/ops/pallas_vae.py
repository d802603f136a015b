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


def _res_chain_body(h, params, c, dtype, *, row_base, seq_len, t_in):
    """Shared 3-res-unit chain on a VMEM tile with halo.

    `h` is (t_in, C); returns (t_in − 2·NEEDED_HALO, C). Rows whose global
    index (row_base + i) falls outside [0, seq_len) are zeroed before each
    unit — the zero-padding semantics of the sequential torch chain.
    """
    valid = t_in
    offset = 0
    for u in range(3):
        (w1, b1, al1, be1, w2, b2, al2, be2) = params[u * 8 : (u + 1) * 8]
        d = DILATIONS[u]
        shrink = 3 * d
        new_valid = valid - 2 * shrink

        row_global = (
            row_base + offset + jax.lax.broadcasted_iota(jnp.int32, (valid, 1), 0)
        )
        in_seq = (row_global >= 0) & (row_global < seq_len)
        h = jnp.where(in_seq, h, jnp.zeros_like(h))

        hf = _snake_f32(h.astype(jnp.float32), al1[0], be1[0])
        a16 = hf.astype(dtype)

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
            zf.astype(dtype), w2[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2[0]

        h_center = jax.lax.slice_in_dim(h, shrink, shrink + new_valid, axis=0)
        h = (h_center.astype(jnp.float32) + z).astype(dtype)
        valid = new_valid
        offset += shrink
    return h


def res_units_pallas(
    x: jax.Array,  # (B, L, C)
    unit_params: Sequence[Dict[str, Any]],
    *,
    tile: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fused 3-res-unit chain (public entry).

    Halo handling without overlapping blocks: the (padded) input is passed
    three times with index maps (ti−1, ti, ti+1); the kernel assembles
    tile+2·HALO rows from the neighbor blocks' edges, so no windowed copy of
    the activation ever materializes in HBM.
    """
    b, l, c = x.shape
    if tile == 0:
        # Keep the kernel's fp32 temporaries (~4-5 live (tile+2·HALO, C)
        # buffers) inside the ~16 MB scoped-VMEM stack budget.
        tile = 1024 if c <= 256 else (512 if c <= 512 else 256)
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

        h = _res_chain_body(
            h, params, c, cur_ref.dtype,
            row_base=ti * tile - TOTAL_HALO, seq_len=seq_len, t_in=t_in,
        )
        margin = TOTAL_HALO - NEEDED_HALO
        out_ref[0] = jax.lax.slice_in_dim(h, margin, margin + tile, axis=0)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, xp, *flat_params)

    return out[:, :l, :]


# ---------------------------------------------------------------------------
# Fully fused decoder block: Snake → ConvTranspose(K=2s, pad s/2) → 3 res units
# ---------------------------------------------------------------------------


def _upsample_halo(s: int) -> int:
    """Input halo rows per side: ≥ TOTAL_HALO/s + 1 (conv_t neighbor), ×8-aligned."""
    need = -(-TOTAL_HALO // s) + 1
    return -(-need // 8) * 8


def decoder_block_pallas(
    x: jax.Array,  # (B, L_in, C_in)
    block_params: Dict[str, Any],
    stride: int,
    *,
    tile_out: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """One whole Oobleck decoder block in a single VMEM pass.

    vs the split path (XLA snake+conv_t, then `res_units_pallas`): the
    transposed conv's einsum temporaries (≈6× the upsampled activation in HBM
    churn) never materialize, and the upsampled activation itself is never
    written to or re-read from HBM. The conv_t is computed as three dense
    matmuls in the (rows, s·C_out) layout — output phase r lives in columns
    [r·C_out, (r+1)·C_out), so neighbor contributions are lane-aligned column
    slices and the phase→time unpack is one contiguous reshape.

    Matches `models/vae.decoder_block` (torch ConvTranspose1d semantics,
    ref diffusers AutoencoderOobleck / acestep/models/mlx/vae_model.py:119-142).
    """
    s = stride
    assert s % 2 == 0, "Oobleck decoder strides are even"
    b, l_in, ci = x.shape
    co = block_params["conv_t1"]["kernel"].shape[2]
    l_out = l_in * s

    # tile_out must be divisible by 8·s so that tile_in = tile_out/s is a
    # sublane-aligned row count (strides 6 and 10 are not powers of two).
    step = 8 * s
    tile_out = min(tile_out, -(-l_out // step) * step)
    tile_out = max(step, (tile_out // step) * step)
    tile_in = tile_out // s
    hin = _upsample_halo(s)
    if hin > tile_in:  # tiny sequences: single tile covers everything
        tile_in = -(-l_in // 8) * 8
        tile_out = tile_in * s
        hin = min(hin, tile_in)
    margin_up = hin * s - TOTAL_HALO  # ≥ s by construction

    n_tiles = -(-l_in // tile_in)
    pad_r = n_tiles * tile_in - l_in
    xp = jnp.pad(x, ((0, 0), (0, pad_r), (0, 0)))

    # --- weight prep (host/XLA, once per call; tiny) ---
    kf = block_params["conv_t1"]["kernel"].astype(x.dtype)  # (2s, Ci, Co)
    half = s // 2
    w_mid = jnp.transpose(kf[half : half + s], (1, 0, 2)).reshape(ci, s * co)
    w_prev = jnp.transpose(kf[3 * half :], (1, 0, 2)).reshape(ci, half * co)
    w_next = jnp.transpose(kf[:half], (1, 0, 2)).reshape(ci, half * co)
    bias = block_params["conv_t1"].get("bias")
    bias_tiled = (
        jnp.tile(bias.astype(jnp.float32), s).reshape(1, s * co)
        if bias is not None
        else jnp.zeros((1, s * co), jnp.float32)
    )
    sn_a = block_params["snake1"]["alpha"].reshape(1, -1).astype(jnp.float32)
    sn_b = block_params["snake1"]["beta"].reshape(1, -1).astype(jnp.float32)

    unit_flat = []
    for name in ("res_unit1", "res_unit2", "res_unit3"):
        p = block_params[name]
        unit_flat += [
            p["conv1"]["kernel"].astype(x.dtype),
            p["conv1"]["bias"].reshape(1, -1).astype(jnp.float32),
            p["snake1"]["alpha"].reshape(1, -1).astype(jnp.float32),
            p["snake1"]["beta"].reshape(1, -1).astype(jnp.float32),
            p["conv2"]["kernel"][0].astype(x.dtype),
            p["conv2"]["bias"].reshape(1, -1).astype(jnp.float32),
            p["snake2"]["alpha"].reshape(1, -1).astype(jnp.float32),
            p["snake2"]["beta"].reshape(1, -1).astype(jnp.float32),
        ]

    grid = (b, n_tiles)
    last = n_tiles - 1
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda bi, ti, _nd=len(shape): (0,) * _nd, memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((1, tile_in, ci), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, tile_in, ci), lambda bi, ti: (bi, jnp.maximum(ti - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, tile_in, ci), lambda bi, ti, _last=last: (bi, jnp.minimum(ti + 1, _last), 0),
            memory_space=pltpu.VMEM,
        ),
        const_spec((ci, s * co)),
        const_spec((ci, half * co)),
        const_spec((ci, half * co)),
        const_spec((1, s * co)),
        const_spec((1, ci)),
        const_spec((1, ci)),
    ]
    for _ in range(3):
        in_specs += [
            const_spec((7, co, co)), const_spec((1, co)), const_spec((1, co)),
            const_spec((1, co)), const_spec((co, co)), const_spec((1, co)),
            const_spec((1, co)), const_spec((1, co)),
        ]

    rows = tile_in + 2 * hin
    t_up = tile_out + 2 * TOTAL_HALO
    hc = half * co

    def kernel(cur_ref, prev_ref, next_ref, wm_ref, wp_ref, wn_ref, bt_ref,
               sa_ref, sb_ref, *refs):
        out_ref = refs[-1]
        unit_params = refs[:-1]
        ti = pl.program_id(1)

        prev_tail = prev_ref[0, tile_in - hin :, :]
        next_head = next_ref[0, :hin, :]
        zero = jnp.zeros_like(prev_tail)
        left = jnp.where(ti > 0, prev_tail, zero)
        right = jnp.where(ti < pl.num_programs(1) - 1, next_head, zero)
        h_in = jnp.concatenate([left, cur_ref[0], right], axis=0)  # (rows, Ci)

        # Zero rows outside the true input sequence, then Snake.
        row_g = ti * tile_in - hin + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        h_in = jnp.where((row_g >= 0) & (row_g < l_in), h_in, jnp.zeros_like(h_in))
        s16 = _snake_f32(h_in.astype(jnp.float32), sa_ref[0], sb_ref[0]).astype(cur_ref.dtype)

        # Transposed conv in phase-column layout: (rows, s·Co).
        a = jax.lax.dot_general(s16, wm_ref[:, :], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p_ = jax.lax.dot_general(s16, wp_ref[:, :], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        n_ = jax.lax.dot_general(s16, wn_ref[:, :], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # Output block t takes x[t−1]'s prev-taps (low phases) and x[t+1]'s
        # next-taps (high phases). Edge garbage from the roll lands inside the
        # trimmed margin (margin_up ≥ s).
        p_sh = pltpu.roll(p_, 1, 0)
        n_sh = pltpu.roll(n_, rows - 1, 0)
        y = jnp.concatenate([a[:, :hc] + p_sh, a[:, hc:] + n_sh], axis=1) + bt_ref[0]
        y = y.reshape(rows * s, co).astype(cur_ref.dtype)

        h_up = jax.lax.slice_in_dim(y, margin_up, margin_up + t_up, axis=0)
        h = _res_chain_body(
            h_up, unit_params, co, cur_ref.dtype,
            row_base=ti * tile_out - TOTAL_HALO, seq_len=l_out, t_in=t_up,
        )
        margin = TOTAL_HALO - NEEDED_HALO
        out_ref[0] = jax.lax.slice_in_dim(h, margin, margin + tile_out, axis=0)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile_out, co), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile_out, co), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, xp, w_mid, w_prev, w_next, bias_tiled, sn_a, sn_b, *unit_flat)

    return out[:, :l_out, :]
