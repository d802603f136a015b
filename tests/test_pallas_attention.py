"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.ops.attention import attention, make_attention_bias
from acestep_tpu.ops.pallas_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape).astype(np.float32))


def _ref(q, k, v, kv_mask=None, window=None, causal=False):
    mask = make_attention_bias(
        q.shape[1], k.shape[1], kv_mask=kv_mask, window=window, causal=causal
    )
    return attention(q, k, v, mask=mask)


@pytest.mark.parametrize(
    "case",
    [
        dict(),  # full bidirectional
        dict(window=64),  # sliding window
        dict(causal=True),  # causal (LM)
        dict(causal=True, window=64),
    ],
)
def test_flash_matches_reference(case):
    B, L, Nq, Nkv, H = 2, 384, 4, 2, 128
    q, k, v = _rand((B, L, Nq, H), 0), _rand((B, L, Nkv, H), 1), _rand((B, L, Nkv, H), 2)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True, **case)
    want = _ref(q, k, v, **case)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_with_padding_mask_and_unaligned_length():
    B, Lq, Lk, Nq, Nkv, H = 1, 200, 200, 4, 2, 128
    q, k, v = _rand((B, Lq, Nq, H), 3), _rand((B, Lk, Nkv, H), 4), _rand((B, Lk, Nkv, H), 5)
    kv_mask = np.ones((B, Lk), np.int32)
    kv_mask[:, 150:] = 0
    kv_mask = jnp.asarray(kv_mask)
    got = flash_attention(q, k, v, kv_mask, block_q=128, block_k=128, interpret=True)
    want = _ref(q, k, v, kv_mask=kv_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_cross_attention_different_lengths():
    B, Lq, Lk, Nq, Nkv, H = 2, 256, 130, 4, 2, 128
    q, k, v = _rand((B, Lq, Nq, H), 6), _rand((B, Lk, Nkv, H), 7), _rand((B, Lk, Nkv, H), 8)
    kv_mask = jnp.asarray(np.concatenate([np.ones((B, 100)), np.zeros((B, 30))], 1).astype(np.int32))
    got = flash_attention(q, k, v, kv_mask, block_q=128, block_k=128, interpret=True)
    want = _ref(q, k, v, kv_mask=kv_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_res_units_matches_sequential():
    from acestep_tpu.models import vae as vae_mod
    from acestep_tpu.ops.pallas_vae import res_units_pallas

    rng = np.random.default_rng(9)
    B, L, C = 1, 600, 128
    x = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))

    units = []
    for u in range(3):
        units.append({
            "snake1": {"alpha": jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1),
                       "beta": jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)},
            "conv1": {"kernel": jnp.asarray(rng.standard_normal((7, C, C)).astype(np.float32) * 0.03),
                      "bias": jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)},
            "snake2": {"alpha": jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1),
                       "beta": jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)},
            "conv2": {"kernel": jnp.asarray(rng.standard_normal((1, C, C)).astype(np.float32) * 0.03),
                      "bias": jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)},
        })

    ref = x
    for u, d in enumerate((1, 3, 9)):
        ref = vae_mod.residual_unit(units[u], ref, d)

    got = res_units_pallas(x, units, tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_flash_attention_is_differentiable(monkeypatch):
    """The training path takes jax.grad through attention(); the Pallas
    forward must pair with the XLA-recompute VJP (custom_vjp) — pallas_call
    itself has no transpose rule."""
    import jax
    import jax.numpy as jnp

    import importlib

    # acestep_tpu.ops.__init__ re-exports the `attention` function, which
    # shadows the submodule attribute — resolve the module explicitly.
    attn_mod = importlib.import_module("acestep_tpu.ops.attention")

    monkeypatch.setenv("ACESTEP_TPU_FLASH_INTERPRET", "1")
    attn_mod.set_flash_enabled(True)
    try:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (1, 256, 4, 128), jnp.float32)
        k = jax.random.normal(kk, (1, 256, 2, 128), jnp.float32)
        v = jax.random.normal(kv, (1, 256, 2, 128), jnp.float32)
        kvm = (jnp.arange(256) < 250).astype(jnp.int32)[None]

        def loss_flash(q, k, v):
            return jnp.sum(attn_mod.attention(q, k, v, kv_mask=kvm, window=32) ** 2)

        def loss_xla(q, k, v):
            mask = attn_mod.make_attention_bias(256, 256, kv_mask=kvm, window=32)
            return jnp.sum(attn_mod.attention_xla(q, k, v, mask=mask) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gx):
            assert jnp.max(jnp.abs(a - b)) < 2e-2, float(jnp.max(jnp.abs(a - b)))
    finally:
        attn_mod.set_flash_enabled(None)
