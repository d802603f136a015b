"""1-D convolutions in NLC layout (TPU-friendly channels-last).

Kernels are stored (K, C_in, C_out) — the 'LIO' spec. Torch Conv1d weights
(out, in, K) and ConvTranspose1d weights (in, out, K) are transposed to this
layout by the checkpoint converter.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NLC", "LIO", "NLC")


def conv1d(
    x: jax.Array,  # (B, L, C_in)
    kernel: jax.Array,  # (K, C_in, C_out)
    bias: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def conv_transpose1d(
    x: jax.Array,  # (B, L, C_in)
    kernel: jax.Array,  # (K, C_in, C_out)
    bias: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """Matches torch ConvTranspose1d: out_len = (L-1)*stride - 2*padding + K.

    Implemented as an input-dilated convolution with a flipped kernel.
    """
    k = kernel.shape[0]
    y = lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0).astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
