"""INT8 weight-only quantization for the DiT decoder.

Role parity with the reference's torchao INT8 weight-only path
(`init_service_loader.py:85-114`, DiT-only filter), TPU-native: weights are
stored int8 with per-output-channel fp32 scales, halving the HBM weight
traffic that bounds small-batch denoise steps. The Pallas matmul kernel reads
int8 tiles, multiplies on the MXU in bf16 (fp32 accumulation), and applies the
column scales on the output tile — the dequantized weights never touch HBM.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_int8(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(in, out) float → (int8 (in, out), fp32 scale (out,)) symmetric per column."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_matmul_kernel(x_ref, w_ref, s_ref, o_ref, *, bk: int, k: int):
    """x (bm, k) bf16 · w (k, bn) int8 → o (bm, bn), scaled by s (1, bn)."""
    nk = k // bk
    acc = jnp.zeros((x_ref.shape[0], w_ref.shape[1]), jnp.float32)

    def body(i, acc):
        xs = x_ref[:, pl.ds(i * bk, bk)]
        ws = w_ref[pl.ds(i * bk, bk), :].astype(xs.dtype)
        return acc + jax.lax.dot_general(
            xs, ws, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc = jax.lax.fori_loop(0, nk, body, acc)
    o_ref[...] = (acc * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def int8_matmul(
    x: jax.Array,  # (M, K) bf16/f32
    w_q: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (N,) fp32
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:  # pragma: no cover
            interpret = True
    m, k = x.shape
    _, n = w_q.shape
    bm = min(block_m, m) if m % 8 == 0 else m
    bn = min(block_n, n)
    bk = min(block_k, k)
    if m % bm or n % bn or k % bk:
        # Irregular shapes: plain XLA dequant fallback.
        return (
            jnp.dot(x, w_q.astype(x.dtype), preferred_element_type=jnp.float32)
            * scale[None, :]
        ).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, bk=bk, k=k),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, -1))
    return out


def linear_int8(params: Dict[str, Any], x: jax.Array) -> jax.Array:
    """Apply an int8-quantized linear: params {kernel_int8, scale[, bias]}."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    m = x2.shape[0]
    pad = (-m) % 256  # keep every call on the Pallas tile path
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    y = int8_matmul(x2, params["kernel_int8"], params["scale"])
    if pad:
        y = y[:m]
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(y.dtype)
    return y.reshape(*shape[:-1], -1)


_QUANT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def quantize_decoder_params(decoder: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize all attention/MLP projection kernels in a decoder tree.

    Works on both per-layer-list and stacked layouts (stacked kernels (L, in,
    out) quantize per (layer, out-column)).
    """

    def walk(node, name=""):
        if isinstance(node, dict):
            if "kernel" in node and any(t in name for t in _QUANT_TARGETS):
                kern = node["kernel"]
                if kern.ndim == 2:
                    q, s = quantize_int8(kern)
                else:  # stacked (L, in, out)
                    q, s = jax.vmap(quantize_int8)(kern)
                new = {k: v for k, v in node.items() if k != "kernel"}
                new["kernel_int8"] = q
                new["scale"] = s
                return new
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return node

    return walk(decoder)
