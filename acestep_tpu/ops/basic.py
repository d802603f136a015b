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
    """Apply a linear layer; computes in the dtype of x with fp32 accumulation."""
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


# cos(r) on [-π, π] as an even least-squares polynomial (max |err| 1.3e-9 in
# f64; 3.9e-7 evaluated in fp32 Horner — below bf16 activation ulp).
_COS_EVEN_COEF = (
    9.9999999980e-01,
    -4.9999999880e-01,
    4.1666664136e-02,
    -1.3888867452e-03,
    2.4800691382e-05,
    -2.7536992140e-07,
    2.0620751417e-09,
    -9.7751781371e-12,
)
_TWO_PI = 6.283185307179586
_INV_TWO_PI = 0.15915494309189535


def sin2_f32(u: jax.Array) -> jax.Array:
    """sin²(u) via ½ − ½·cos(2u) with a range-reduced even polynomial.

    Pure mul/add/round — runs at VPU ALU rate inside Pallas kernels and XLA
    fusions, ~8× faster than `math.sin` on TPU (which dominates the Snake
    activation cost at 48 kHz rates). fp32 only.
    """
    v = 2.0 * u
    k = jnp.round(v * _INV_TWO_PI)
    r = v - k * _TWO_PI
    r2 = r * r
    c = jnp.float32(_COS_EVEN_COEF[-1])
    for coef in _COS_EVEN_COEF[-2::-1]:
        c = c * r2 + jnp.float32(coef)
    return 0.5 - 0.5 * c


def mlp_swiglu(params, x: jax.Array) -> jax.Array:
    """SwiGLU MLP: down(silu(gate(x)) * up(x)) — Qwen3MLP semantics."""
    g = linear(params["gate_proj"], x)
    u = linear(params["up_proj"], x)
    return linear(params["down_proj"], jax.nn.silu(g) * u)
