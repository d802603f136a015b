"""Oobleck waveform VAE (Stable-Audio style) — TPU-native JAX implementation.

Architecture parity with diffusers' AutoencoderOobleck as loaded by the
reference (`init_service_loader.py:123-144`; structure mirrored at
`acestep/models/mlx/vae_model.py`):

  Snake1d → OobleckResidualUnit (k7 dilated + k1) → Encoder/DecoderBlock
  (3 res units, dil 1/3/9 + strided conv / conv-transpose) → Encoder/Decoder.

All tensors are NLC (channels-last) — the natural TPU conv layout. Snake runs
in float32 (exp/sin overflow in low precision).

Includes overlap-discard tiled encode/decode equivalent to the reference's
`vae_encode_chunks.py` / `vae_decode_chunks.py`, implemented with static
chunk grids so every chunk shares one compiled conv program.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import OobleckConfig
from acestep_tpu.ops.basic import sin2_f32
from acestep_tpu.ops.conv import conv1d, conv_transpose1d

Params = Dict[str, Any]


def snake(p: Params, x: jax.Array) -> jax.Array:
    """Snake activation x + (1/beta)·sin²(alpha·x); alpha/beta stored log-scale.

    sin² evaluates via the polynomial `ops.basic.sin2_f32` (~8× faster than
    `sin` on the TPU VPU, error ≪ bf16 ulp); set ACESTEP_TPU_EXACT_SNAKE=1 to
    use transcendental sin for debugging.
    """
    import os

    alpha = jnp.exp(p["alpha"].astype(jnp.float32))
    beta = jnp.exp(p["beta"].astype(jnp.float32))
    xf = x.astype(jnp.float32)
    if os.environ.get("ACESTEP_TPU_EXACT_SNAKE", "0") == "1":
        s2 = jnp.square(jnp.sin(alpha * xf))
    else:
        s2 = sin2_f32(alpha * xf)
    out = xf + (1.0 / (beta + 1e-9)) * s2
    return out.astype(x.dtype)


def residual_unit(p: Params, x: jax.Array, dilation: int) -> jax.Array:
    pad = ((7 - 1) * dilation) // 2
    h = snake(p["snake1"], x)
    h = conv1d(h, p["conv1"]["kernel"], p["conv1"].get("bias"), padding=pad, dilation=dilation)
    h = snake(p["snake2"], h)
    h = conv1d(h, p["conv2"]["kernel"], p["conv2"].get("bias"))
    return x + h


def encoder_block(p: Params, x: jax.Array, stride: int) -> jax.Array:
    x = residual_unit(p["res_unit1"], x, 1)
    x = residual_unit(p["res_unit2"], x, 3)
    x = residual_unit(p["res_unit3"], x, 9)
    x = snake(p["snake1"], x)
    return conv1d(
        x, p["conv1"]["kernel"], p["conv1"].get("bias"),
        stride=stride, padding=-(-stride // 2),
    )


def _use_fused_res_units(c: int, limit: int = 1024) -> bool:
    """Fused-kernel gate by channel count: the kernel keeps all res-unit
    weights VMEM-resident (3·(7+1)·c² values), viable up to c=1024 (~48 MB).
    The fully fused block additionally holds the conv_t weights, so its
    gate is tighter (512 → ~23 MB more)."""
    import os

    if os.environ.get("ACESTEP_TPU_NO_FUSED_VAE", "0") == "1":
        return False
    try:
        return c <= limit and jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _fused_block_supports(l_in: int, stride: int) -> bool:
    """Sequences too short for the fused decoder block's halo invariant
    (margin_up = hin·s − TOTAL_HALO ≥ s needs the 8-aligned tile to hold the
    full input halo) take the unfused path instead of crashing at trace."""
    from acestep_tpu.ops.pallas_vae import _upsample_halo

    return -(-l_in // 8) * 8 >= _upsample_halo(stride)


def _res_units_supports(l: int) -> bool:
    """res_units_pallas assembles tile−TOTAL_HALO edge slices; tiles shorter
    than the halo make those slices negative-start. Short activations run the
    plain XLA chain."""
    from acestep_tpu.ops.pallas_vae import TOTAL_HALO

    return -(-l // 8) * 8 >= TOTAL_HALO


def decoder_block(p: Params, x: jax.Array, stride: int) -> jax.Array:
    c_out = p["conv_t1"]["kernel"].shape[2]
    if (
        stride % 2 == 0
        and _use_fused_res_units(c_out, 512)
        and _fused_block_supports(x.shape[1], stride)
    ):
        # Whole block (snake → conv_t → 3 res units) in one VMEM pass: the
        # transposed conv's HBM temporaries and the upsampled activation
        # round-trip disappear entirely.
        from acestep_tpu.ops.pallas_vae import decoder_block_pallas

        return decoder_block_pallas(x, p, stride)
    x = snake(p["snake1"], x)
    x = conv_transpose1d(
        x, p["conv_t1"]["kernel"], p["conv_t1"].get("bias"),
        stride=stride, padding=-(-stride // 2),
    )
    if _use_fused_res_units(x.shape[-1]) and _res_units_supports(x.shape[1]):
        from acestep_tpu.ops.pallas_vae import res_units_pallas

        return res_units_pallas(x, (p["res_unit1"], p["res_unit2"], p["res_unit3"]))
    x = residual_unit(p["res_unit1"], x, 1)
    x = residual_unit(p["res_unit2"], x, 3)
    return residual_unit(p["res_unit3"], x, 9)


def encode_raw(p: Params, cfg: OobleckConfig, audio: jax.Array) -> jax.Array:
    """(B, L_audio, C_audio) → (B, L_latent, 2*latent_dim) mean+scale."""
    x = conv1d(audio, p["encoder"]["conv1"]["kernel"], p["encoder"]["conv1"].get("bias"), padding=3)
    for i, stride in enumerate(cfg.downsampling_ratios):
        x = encoder_block(p["encoder"]["block"][i], x, stride)
    x = snake(p["encoder"]["snake1"], x)
    return conv1d(x, p["encoder"]["conv2"]["kernel"], p["encoder"]["conv2"].get("bias"), padding=1)


def encode_mean(p: Params, cfg: OobleckConfig, audio: jax.Array) -> jax.Array:
    h = encode_raw(p, cfg, audio)
    mean, _ = jnp.split(h, 2, axis=-1)
    return mean


def encode_sample(p: Params, cfg: OobleckConfig, audio: jax.Array, key) -> jax.Array:
    h = encode_raw(p, cfg, audio)
    mean, scale = jnp.split(h, 2, axis=-1)
    std = jax.nn.softplus(scale.astype(jnp.float32)) + 1e-4
    noise = jax.random.normal(key, mean.shape, dtype=jnp.float32)
    return (mean.astype(jnp.float32) + std * noise).astype(mean.dtype)


def decode(p: Params, cfg: OobleckConfig, latents: jax.Array) -> jax.Array:
    """(B, L_latent, latent_dim) → (B, L_audio, C_audio)."""
    d = p["decoder"]
    x = conv1d(latents, d["conv1"]["kernel"], d["conv1"].get("bias"), padding=3)
    ups = tuple(reversed(cfg.downsampling_ratios))
    for i, stride in enumerate(ups):
        x = decoder_block(d["block"][i], x, stride)
    x = snake(d["snake1"], x)
    return conv1d(x, d["conv2"]["kernel"], d["conv2"].get("bias"), padding=3)


# ---------------------------------------------------------------------------
# Overlap-discard tiling (ref vae_decode_chunks.py:13-166, vae_encode.py:15-82)
# ---------------------------------------------------------------------------


def tiled_decode(
    p: Params,
    cfg: OobleckConfig,
    latents: jax.Array,  # (B, T, latent_dim)
    *,
    chunk_frames: int = 512,
    overlap_frames: int = 16,
    decode_fn=None,
) -> jax.Array:
    """Decode long latents chunk-by-chunk with overlap-discard stitching.

    Every chunk has identical static shape, so XLA compiles the decoder once.
    `decode_fn(params, latents)` may be a pre-jitted decoder.
    """
    b, t, d = latents.shape
    hop = cfg.hop_length
    if decode_fn is None:
        decode_fn = lambda pp, z: decode(pp, cfg, z)
    if t <= chunk_frames:
        return decode_fn(p, latents)

    core = chunk_frames - 2 * overlap_frames
    n_chunks = -(-t // core)
    pad_t = n_chunks * core - t
    # padded length = overlap + t + pad_t + overlap = n_chunks*core + 2*overlap
    padded = jnp.pad(latents, ((0, 0), (overlap_frames, pad_t + overlap_frames), (0, 0)), mode="edge")

    outs = []
    for ci in range(n_chunks):
        start = ci * core
        chunk = jax.lax.dynamic_slice_in_dim(padded, start, core + 2 * overlap_frames, axis=1)
        wav = decode_fn(p, chunk)
        outs.append(wav[:, overlap_frames * hop : (overlap_frames + core) * hop, :])
    wav_full = jnp.concatenate(outs, axis=1)
    return wav_full[:, : t * hop, :]


def tiled_encode(
    p: Params,
    cfg: OobleckConfig,
    audio: jax.Array,  # (B, L, C)
    *,
    chunk_seconds: int = 20,
    overlap_seconds: int = 2,
    encode_fn=None,
) -> jax.Array:
    """Encode long audio with overlap-discard, returning mean latents (B, T, 64)."""
    b, l, c = audio.shape
    sr = cfg.sampling_rate
    hop = cfg.hop_length
    chunk_len = chunk_seconds * sr
    if encode_fn is None:
        encode_fn = lambda pp, a: encode_mean(pp, cfg, a)
    if l <= chunk_len:
        return encode_fn(p, audio)

    ov = overlap_seconds * sr
    core = chunk_len - 2 * ov
    n_chunks = -(-l // core)
    pad_l = n_chunks * core - l
    padded = jnp.pad(audio, ((0, 0), (ov, pad_l + ov), (0, 0)))

    outs = []
    ov_frames = ov // hop
    core_frames = core // hop
    for ci in range(n_chunks):
        start = ci * core
        chunk = jax.lax.dynamic_slice_in_dim(padded, start, core + 2 * ov, axis=1)
        z = encode_fn(p, chunk)
        outs.append(z[:, ov_frames : ov_frames + core_frames, :])
    z_full = jnp.concatenate(outs, axis=1)
    return z_full[:, : l // hop, :]


# ---------------------------------------------------------------------------
# Init + torch conversion
# ---------------------------------------------------------------------------


def _conv_init(kg, k, cin, cout, dtype, bias=True, std=0.02):
    p = {"kernel": jax.random.normal(kg(), (k, cin, cout), jnp.float32).astype(dtype) * std}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _snake_init(c, dtype):
    return {"alpha": jnp.zeros((c,), dtype), "beta": jnp.zeros((c,), dtype)}


def _res_unit_init(kg, c, dtype):
    return {
        "snake1": _snake_init(c, dtype),
        "conv1": _conv_init(kg, 7, c, c, dtype),
        "snake2": _snake_init(c, dtype),
        "conv2": _conv_init(kg, 1, c, c, dtype),
    }


def init_oobleck_params(key, cfg: OobleckConfig, dtype=jnp.float32) -> Params:
    from acestep_tpu.params import _KeyGen

    kg = _KeyGen(key)
    cm = (1,) + tuple(cfg.channel_multiples)
    ehs = cfg.encoder_hidden_size

    enc_blocks = []
    for i, stride in enumerate(cfg.downsampling_ratios):
        cin, cout = ehs * cm[i], ehs * cm[i + 1]
        enc_blocks.append({
            "res_unit1": _res_unit_init(kg, cin, dtype),
            "res_unit2": _res_unit_init(kg, cin, dtype),
            "res_unit3": _res_unit_init(kg, cin, dtype),
            "snake1": _snake_init(cin, dtype),
            "conv1": _conv_init(kg, 2 * stride, cin, cout, dtype),
        })
    encoder = {
        "conv1": _conv_init(kg, 7, cfg.audio_channels, ehs, dtype),
        "block": enc_blocks,
        "snake1": _snake_init(ehs * cm[-1], dtype),
        "conv2": _conv_init(kg, 3, ehs * cm[-1], ehs, dtype),
    }

    ch = cfg.decoder_channels
    ups = tuple(reversed(cfg.downsampling_ratios))
    n = len(ups)
    dec_blocks = []
    for i, stride in enumerate(ups):
        cin, cout = ch * cm[n - i], ch * cm[n - i - 1]
        dec_blocks.append({
            "snake1": _snake_init(cin, dtype),
            "conv_t1": _conv_init(kg, 2 * stride, cin, cout, dtype),
            "res_unit1": _res_unit_init(kg, cout, dtype),
            "res_unit2": _res_unit_init(kg, cout, dtype),
            "res_unit3": _res_unit_init(kg, cout, dtype),
        })
    decoder = {
        "conv1": _conv_init(kg, 7, cfg.decoder_input_channels, ch * cm[-1], dtype),
        "block": dec_blocks,
        "snake1": _snake_init(ch, dtype),
        "conv2": _conv_init(kg, 7, ch, cfg.audio_channels, dtype, bias=False),
    }
    return {"encoder": encoder, "decoder": decoder}


def convert_torch_vae_state(state: Dict[str, Any], cfg: OobleckConfig, dtype=jnp.float32) -> Params:
    """Convert diffusers AutoencoderOobleck state_dict (weight-norm folded).

    diffusers stores weight-normalized convs as ``weight_v``/``weight_g`` (or
    parametrizations.*); this folds them into plain kernels.
    """

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    def conv(prefix, transpose=False):
        if prefix + ".weight" in state:
            w = get(prefix + ".weight")
        elif prefix + ".weight_v" in state:
            v = get(prefix + ".weight_v")
            g = get(prefix + ".weight_g")
            norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1).reshape(-1, 1, 1)
            w = g * v / np.maximum(norm, 1e-12)
        elif prefix + ".parametrizations.weight.original0" in state:
            g = get(prefix + ".parametrizations.weight.original0")
            v = get(prefix + ".parametrizations.weight.original1")
            norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1).reshape(-1, 1, 1)
            w = g * v / np.maximum(norm, 1e-12)
        else:  # pragma: no cover
            raise KeyError(prefix)
        # torch conv (out, in, K) / conv_t (in, out, K) → (K, in, out)
        w = np.transpose(w, (2, 1, 0)) if not transpose else np.transpose(w, (2, 0, 1))
        p = {"kernel": jnp.asarray(w).astype(dtype)}
        if prefix + ".bias" in state:
            p["bias"] = jnp.asarray(get(prefix + ".bias")).astype(dtype)
        return p

    def snake_p(prefix):
        return {
            "alpha": jnp.asarray(get(prefix + ".alpha").reshape(-1)).astype(dtype),
            "beta": jnp.asarray(get(prefix + ".beta").reshape(-1)).astype(dtype),
        }

    def res_unit(prefix):
        return {
            "snake1": snake_p(prefix + ".snake1"),
            "conv1": conv(prefix + ".conv1"),
            "snake2": snake_p(prefix + ".snake2"),
            "conv2": conv(prefix + ".conv2"),
        }

    enc_blocks = []
    for i in range(len(cfg.downsampling_ratios)):
        pre = f"encoder.block.{i}"
        enc_blocks.append({
            "res_unit1": res_unit(pre + ".res_unit1"),
            "res_unit2": res_unit(pre + ".res_unit2"),
            "res_unit3": res_unit(pre + ".res_unit3"),
            "snake1": snake_p(pre + ".snake1"),
            "conv1": conv(pre + ".conv1"),
        })
    dec_blocks = []
    for i in range(len(cfg.downsampling_ratios)):
        pre = f"decoder.block.{i}"
        dec_blocks.append({
            "snake1": snake_p(pre + ".snake1"),
            "conv_t1": conv(pre + ".conv_t1", transpose=True),
            "res_unit1": res_unit(pre + ".res_unit1"),
            "res_unit2": res_unit(pre + ".res_unit2"),
            "res_unit3": res_unit(pre + ".res_unit3"),
        })
    return {
        "encoder": {
            "conv1": conv("encoder.conv1"),
            "block": enc_blocks,
            "snake1": snake_p("encoder.snake1"),
            "conv2": conv("encoder.conv2"),
        },
        "decoder": {
            "conv1": conv("decoder.conv1"),
            "block": dec_blocks,
            "snake1": snake_p("decoder.snake1"),
            "conv2": conv("decoder.conv2"),
        },
    }
