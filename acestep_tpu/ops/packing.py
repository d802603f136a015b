"""Sequence packing: concatenate two masked sequences, valid tokens first.

Reproduces the reference's `pack_sequences`
(`modeling_acestep_v15_turbo.py:135-166`): stable argsort of the concatenated
mask (descending) gathers valid tokens to the front; the new mask is a prefix
mask of the total valid length. Fully static shapes — TPU friendly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pack_sequences(
    hidden1: jax.Array,  # (B, L1, D)
    hidden2: jax.Array,  # (B, L2, D)
    mask1: jax.Array,  # (B, L1)
    mask2: jax.Array,  # (B, L2)
) -> Tuple[jax.Array, jax.Array]:
    hidden = jnp.concatenate([hidden1, hidden2], axis=1)
    mask = jnp.concatenate([mask1, mask2], axis=1).astype(jnp.int32)
    b, l, d = hidden.shape

    # Stable descending sort on the mask: sort ascending on (1 - mask) with
    # position as tiebreaker, realized via a single integer key.
    pos = jnp.arange(l, dtype=jnp.int32)[None, :]
    key = (1 - mask) * l + pos
    order = jnp.argsort(key, axis=1)
    packed = jnp.take_along_axis(hidden, order[..., None], axis=1)

    lengths = jnp.sum(mask, axis=1, keepdims=True)
    new_mask = (pos < lengths).astype(mask1.dtype)
    return packed, new_mask
