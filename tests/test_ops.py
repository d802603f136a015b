"""Numerics tests for core ops against independent torch oracles.

The oracles use transformers' public Qwen3 building blocks (library code, not
the reference repo) so RMSNorm / RoPE / GQA attention / SwiGLU match the exact
semantics the reference model relies on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.ops.basic import linear, mlp_swiglu, rms_norm
from acestep_tpu.ops.rope import apply_rope, rope_cos_sin
from acestep_tpu.ops.attention import attention, make_attention_bias
from acestep_tpu.ops.fsq import (
    fsq_codes_to_indices,
    fsq_indices_to_codes,
    fsq_quantize,
)
from acestep_tpu.ops.packing import pack_sequences
from acestep_tpu.ops.conv import conv1d, conv_transpose1d

torch = pytest.importorskip("torch")


def test_rms_norm_matches_qwen3():
    from transformers.models.qwen3.modeling_qwen3 import Qwen3RMSNorm

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)

    mod = Qwen3RMSNorm(64, eps=1e-6)
    with torch.no_grad():
        mod.weight.copy_(torch.from_numpy(w))
        ref = mod(torch.from_numpy(x)).numpy()

    out = rms_norm(jnp.asarray(w), jnp.asarray(x), 1e-6)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_rope_matches_qwen3():
    from transformers.models.qwen3.modeling_qwen3 import apply_rotary_pos_emb

    rng = np.random.default_rng(1)
    B, L, N, H = 2, 7, 4, 32
    q = rng.standard_normal((B, L, N, H)).astype(np.float32)
    k = rng.standard_normal((B, L, N, H)).astype(np.float32)

    cos, sin = rope_cos_sin(L, H, theta=1e6)
    cos_t = torch.from_numpy(np.asarray(cos))[None].expand(B, L, H)
    sin_t = torch.from_numpy(np.asarray(sin))[None].expand(B, L, H)
    # torch layout (B, N, L, H)
    qt = torch.from_numpy(q).permute(0, 2, 1, 3)
    kt = torch.from_numpy(k).permute(0, 2, 1, 3)
    q_ref, k_ref = apply_rotary_pos_emb(qt, kt, cos_t, sin_t)

    q_out = apply_rope(jnp.asarray(q), cos, sin)
    k_out = apply_rope(jnp.asarray(k), cos, sin)
    np.testing.assert_allclose(np.asarray(q_out), q_ref.permute(0, 2, 1, 3).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_out), k_ref.permute(0, 2, 1, 3).numpy(), atol=1e-5)


def test_mlp_matches_qwen3():
    rng = np.random.default_rng(2)
    d, i = 32, 64
    x = rng.standard_normal((2, 5, d)).astype(np.float32)
    wg = rng.standard_normal((i, d)).astype(np.float32) * 0.1
    wu = rng.standard_normal((i, d)).astype(np.float32) * 0.1
    wd = rng.standard_normal((d, i)).astype(np.float32) * 0.1

    xt = torch.from_numpy(x)
    ref = (
        torch.nn.functional.silu(xt @ torch.from_numpy(wg).T) * (xt @ torch.from_numpy(wu).T)
    ) @ torch.from_numpy(wd).T

    params = {
        "gate_proj": {"kernel": jnp.asarray(wg.T)},
        "up_proj": {"kernel": jnp.asarray(wu.T)},
        "down_proj": {"kernel": jnp.asarray(wd.T)},
    }
    out = mlp_swiglu(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_attention_matches_sdpa_gqa():
    rng = np.random.default_rng(3)
    B, Lq, Lk, Nq, Nkv, H = 2, 6, 9, 4, 2, 16
    q = rng.standard_normal((B, Lq, Nq, H)).astype(np.float32)
    k = rng.standard_normal((B, Lk, Nkv, H)).astype(np.float32)
    v = rng.standard_normal((B, Lk, Nkv, H)).astype(np.float32)
    kv_mask = (rng.random((B, Lk)) > 0.3).astype(np.float32)
    kv_mask[:, 0] = 1.0

    mask = make_attention_bias(Lq, Lk, kv_mask=jnp.asarray(kv_mask))
    out = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask=mask)

    qt = torch.from_numpy(q).permute(0, 2, 1, 3)
    kt = torch.from_numpy(k).permute(0, 2, 1, 3).repeat_interleave(Nq // Nkv, dim=1)
    vt = torch.from_numpy(v).permute(0, 2, 1, 3).repeat_interleave(Nq // Nkv, dim=1)
    attn_mask = torch.from_numpy(kv_mask).bool()[:, None, None, :]
    ref = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt, attn_mask=attn_mask)
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 1, 3).numpy(), atol=1e-5
    )


def test_sliding_window_mask_matches_reference_geometry():
    # |i - j| <= window, bidirectional (ref create_4d_mask :93-102)
    mask = np.asarray(make_attention_bias(6, window=2)[0, 0])
    for i in range(6):
        for j in range(6):
            assert mask[i, j] == (abs(i - j) <= 2)


def test_causal_mask():
    mask = np.asarray(make_attention_bias(5, causal=True)[0, 0])
    for i in range(5):
        for j in range(5):
            assert mask[i, j] == (j <= i)


def test_fsq_roundtrip_and_encoding():
    levels = (8, 8, 8, 5, 5, 5)
    rng = np.random.default_rng(4)
    z = rng.standard_normal((3, 7, 6)).astype(np.float32) * 2
    codes = fsq_quantize(jnp.asarray(z), levels)
    idx = fsq_codes_to_indices(codes, levels)
    assert int(jnp.min(idx)) >= 0 and int(jnp.max(idx)) < 64000
    codes2 = fsq_indices_to_codes(idx, levels)
    np.testing.assert_allclose(np.asarray(codes), np.asarray(codes2), atol=1e-6)

    # Hand-checked mixed-radix encoding: code index basis [1,8,64,512,2560,12800]
    manual = np.asarray([0, 1, 2, 0, 1, 2], dtype=np.float32)
    half_w = np.asarray([4, 4, 4, 2, 2, 2], dtype=np.float32)
    norm_codes = (manual - half_w) / half_w
    got = int(fsq_codes_to_indices(jnp.asarray(norm_codes), levels))
    expect = 0 * 1 + 1 * 8 + 2 * 64 + 0 * 512 + 1 * 2560 + 2 * 12800
    assert got == expect


def test_fsq_quantize_matches_vq_pytorch_formula():
    """Oracle: the published FSQ formula (bound→round→normalize) in numpy."""
    levels = np.asarray([8, 8, 8, 5, 5, 5], dtype=np.float32)
    rng = np.random.default_rng(5)
    z = rng.standard_normal((11, 6)).astype(np.float32) * 3
    eps = 1e-3
    half_l = (levels - 1) * (1 + eps) / 2
    offset = np.where(levels % 2 == 0, 0.5, 0.0)
    shift = np.arctanh(offset / half_l)
    bounded = np.tanh(z + shift) * half_l - offset
    expect = np.round(bounded) / (levels.astype(np.int32) // 2)

    got = np.asarray(fsq_quantize(jnp.asarray(z), tuple(int(l) for l in levels)))
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_pack_sequences_matches_reference_semantics():
    rng = np.random.default_rng(6)
    B, L1, L2, D = 2, 4, 3, 5
    h1 = rng.standard_normal((B, L1, D)).astype(np.float32)
    h2 = rng.standard_normal((B, L2, D)).astype(np.float32)
    m1 = np.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], dtype=np.int32)
    m2 = np.asarray([[1, 0, 1], [1, 1, 1]], dtype=np.int32)

    packed, new_mask = pack_sequences(
        jnp.asarray(h1), jnp.asarray(h2), jnp.asarray(m1), jnp.asarray(m2)
    )
    packed = np.asarray(packed)
    new_mask = np.asarray(new_mask)

    for b in range(B):
        cat = np.concatenate([h1[b], h2[b]], axis=0)
        mcat = np.concatenate([m1[b], m2[b]], axis=0)
        valid = cat[mcat == 1]
        n = valid.shape[0]
        np.testing.assert_allclose(packed[b, :n], valid, atol=0)
        assert new_mask[b].sum() == n
        assert (new_mask[b][:n] == 1).all()


def test_conv1d_matches_torch():
    rng = np.random.default_rng(7)
    B, L, Cin, Cout, K = 2, 16, 3, 5, 4
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    w = rng.standard_normal((Cout, Cin, K)).astype(np.float32)
    b = rng.standard_normal(Cout).astype(np.float32)

    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(w), torch.from_numpy(b),
        stride=2, padding=1,
    ).permute(0, 2, 1).numpy()

    out = conv1d(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 1, 0))), jnp.asarray(b),
        stride=2, padding=1,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_conv_transpose1d_matches_torch():
    rng = np.random.default_rng(8)
    B, L, Cin, Cout, stride = 2, 9, 4, 3, 4
    K = 2 * stride
    pad = (stride + 1) // 2 + (stride % 2 == 0) * 0  # math.ceil(stride/2)
    pad = -(-stride // 2)
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    w = rng.standard_normal((Cin, Cout, K)).astype(np.float32)
    b = rng.standard_normal(Cout).astype(np.float32)

    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad,
    ).permute(0, 2, 1).numpy()

    out = conv_transpose1d(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 0, 1))), jnp.asarray(b),
        stride=stride, padding=pad,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
