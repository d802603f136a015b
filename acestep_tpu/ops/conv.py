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
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
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

    Fast path (the Oobleck decoder's K = 2·stride, padding = stride/2, even
    stride): three dense matmuls + interleave — no input zero-dilation, so the
    MXU does exactly K·C_in·C_out·L useful FLOPs instead of stride× redundant
    work. Output position p = t·s + r receives:
      x[t]   · W[r + s/2]                       (always)
      x[t-1] · W[r + 3s/2]   for r <  s/2
      x[t+1] · W[r -  s/2]   for r >= s/2
    Fallback: lax input-dilated convolution (general case).
    """
    k = kernel.shape[0]
    s = stride
    if s > 1 and s % 2 == 0 and k == 2 * s and padding == s // 2:
        b, l, cin = x.shape
        cout = kernel.shape[2]
        kf = kernel.astype(x.dtype)
        half = s // 2

        w_mid = kf[half : half + s]  # (s, Ci, Co) → output r from x[t]
        w_prev = kf[3 * half :]  # (s/2, Ci, Co) → output r<s/2 from x[t-1]
        w_next = kf[:half]  # (s/2, Ci, Co) → output r>=s/2 from x[t+1]

        # Outputs stay in x.dtype (bf16 on TPU; MXU still accumulates fp32
        # internally) — fp32 outputs here would materialize multi-GB
        # temporaries at 48 kHz rates.
        a = jnp.einsum("blc,rcd->blrd", x, w_mid)
        p_ = jnp.einsum("blc,rcd->blrd", x, w_prev)
        n_ = jnp.einsum("blc,rcd->blrd", x, w_next)

        # x[t-1] contribution lands in the low half of block t.
        p_shift = jnp.pad(p_[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        # x[t+1] contribution lands in the high half of block t.
        n_shift = jnp.pad(n_[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))

        zeros = jnp.zeros_like(p_shift)
        y = a + jnp.concatenate([p_shift, zeros], axis=2) + jnp.concatenate([zeros, n_shift], axis=2)
        y = y.reshape(b, l * s, cout)
    else:
        y = lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=0).astype(x.dtype),
            window_strides=(1,),
            padding=[(k - 1 - padding, k - 1 - padding)],
            lhs_dilation=(stride,),
            dimension_numbers=_DN,
        )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)
