"""Elementary neural-net ops: linear, RMSNorm, SwiGLU MLP.

Parameter convention: a linear layer is a dict ``{"kernel": (in, out)[, "bias": (out,)]}``
so application is ``x @ kernel`` — the natural MXU layout (contraction over the
last axis). Torch checkpoints store ``weight`` as (out, in); the converter
transposes at load time.

Numerics mirror the reference building blocks (Qwen3RMSNorm / Qwen3MLP used at
reference `modeling_acestep_v15_turbo.py:33-39`): RMSNorm statistics in
float32, output cast back to the input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(params, x: jax.Array) -> jax.Array:
    """Apply a linear layer; computes in the dtype of x with fp32 accumulation.

    Dispatches to the int8 weight-only path when the layer was quantized
    (`acestep_tpu.ops.quant.quantize_decoder_params`).
    """
    if "kernel_int8" in params:
        from acestep_tpu.ops.quant import linear_int8

        return linear_int8(params, x)
    y = jnp.dot(x, params["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(weight: jax.Array, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm with float32 statistics (matches Qwen3RMSNorm semantics)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (weight.astype(jnp.float32) * xf).astype(dtype)


def mlp_swiglu(params, x: jax.Array) -> jax.Array:
    """SwiGLU MLP: down(silu(gate(x)) * up(x)) — Qwen3MLP semantics."""
    g = linear(params["gate_proj"], x)
    u = linear(params["up_proj"], x)
    return linear(params["down_proj"], jax.nn.silu(g) * u)
