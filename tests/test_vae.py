"""Oobleck VAE tests: shape math, tiling equivalence, torch conv parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.config import OobleckConfig
from acestep_tpu.models import vae

TINY = OobleckConfig(
    encoder_hidden_size=16,
    downsampling_ratios=(2, 4, 4),  # hop 32
    channel_multiples=(1, 2, 4),
    decoder_channels=16,
    decoder_input_channels=8,
    audio_channels=2,
    sampling_rate=320,
)


@pytest.fixture(scope="module")
def params():
    return vae.init_oobleck_params(jax.random.PRNGKey(0), TINY, jnp.float32)


def test_hop_length():
    assert TINY.hop_length == 32
    assert OobleckConfig().hop_length == 1920  # 48 kHz / 1920 = 25 Hz


def test_encode_decode_shapes(params):
    b, seconds = 2, 4
    l = seconds * TINY.sampling_rate
    audio = jnp.asarray(np.random.default_rng(0).standard_normal((b, l, 2)).astype(np.float32))
    z = vae.encode_mean(params, TINY, audio)
    assert z.shape == (b, l // TINY.hop_length, TINY.latent_dim)

    wav = vae.decode(params, TINY, z)
    assert wav.shape == (b, l, 2)


def test_encode_sample_statistics(params):
    audio = jnp.zeros((1, 2 * TINY.sampling_rate, 2), jnp.float32)
    z1 = vae.encode_sample(params, TINY, audio, jax.random.PRNGKey(1))
    z2 = vae.encode_sample(params, TINY, audio, jax.random.PRNGKey(2))
    assert z1.shape == z2.shape
    assert np.abs(np.asarray(z1) - np.asarray(z2)).max() > 0  # sampling noise


def test_tiled_decode_matches_full(params):
    """Overlap-discard must agree with one-shot decode away from chunk seams.

    Conv receptive-field edge effects only reach a few frames past the overlap;
    with sufficient overlap the stitched output matches everywhere.
    """
    t = 40
    z = jnp.asarray(np.random.default_rng(1).standard_normal((1, t, TINY.latent_dim)).astype(np.float32))
    full = np.asarray(vae.decode(params, TINY, z))
    tiled = np.asarray(vae.tiled_decode(params, TINY, z, chunk_frames=24, overlap_frames=8))
    assert tiled.shape == full.shape
    np.testing.assert_allclose(tiled, full, atol=2e-3, rtol=1e-2)


def test_tiled_encode_matches_full(params):
    l = 8 * TINY.sampling_rate
    audio = jnp.asarray(np.random.default_rng(2).standard_normal((1, l, 2)).astype(np.float32))
    full = np.asarray(vae.encode_mean(params, TINY, audio))
    tiled = np.asarray(vae.tiled_encode(params, TINY, audio, chunk_seconds=3, overlap_seconds=1))
    assert tiled.shape == full.shape
    # interior matches; seams bounded by receptive field
    np.testing.assert_allclose(tiled[:, 2:-2], full[:, 2:-2], atol=2e-3, rtol=1e-2)


def test_snake_matches_formula(params):
    p = {"alpha": jnp.asarray([0.5, -0.2]), "beta": jnp.asarray([0.1, 0.3])}
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 4, 2)).astype(np.float32))
    got = np.asarray(vae.snake(p, x))
    a, bq = np.exp([0.5, -0.2]), np.exp([0.1, 0.3])
    expect = np.asarray(x) + (1 / (bq + 1e-9)) * np.sin(a * np.asarray(x)) ** 2
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_residual_unit_matches_torch(params):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    c, dil = 6, 3
    x = rng.standard_normal((1, 20, c)).astype(np.float32)
    w1 = rng.standard_normal((c, c, 7)).astype(np.float32) * 0.1
    b1 = rng.standard_normal(c).astype(np.float32)
    w2 = rng.standard_normal((c, c, 1)).astype(np.float32) * 0.1
    b2 = rng.standard_normal(c).astype(np.float32)
    alpha = rng.standard_normal(c).astype(np.float32) * 0.1
    beta = rng.standard_normal(c).astype(np.float32) * 0.1

    def t_snake(xc):
        a = torch.exp(torch.from_numpy(alpha))[None, :, None]
        bb = torch.exp(torch.from_numpy(beta))[None, :, None]
        return xc + (1 / (bb + 1e-9)) * torch.sin(a * xc) ** 2

    xt = torch.from_numpy(x).permute(0, 2, 1)
    h = torch.nn.functional.conv1d(
        t_snake(xt), torch.from_numpy(w1), torch.from_numpy(b1),
        padding=((7 - 1) * dil) // 2, dilation=dil,
    )
    h = torch.nn.functional.conv1d(t_snake(h), torch.from_numpy(w2), torch.from_numpy(b2))
    ref = (xt + h).permute(0, 2, 1).numpy()

    p = {
        "snake1": {"alpha": jnp.asarray(alpha), "beta": jnp.asarray(beta)},
        "conv1": {"kernel": jnp.asarray(np.transpose(w1, (2, 1, 0))), "bias": jnp.asarray(b1)},
        "snake2": {"alpha": jnp.asarray(alpha), "beta": jnp.asarray(beta)},
        "conv2": {"kernel": jnp.asarray(np.transpose(w2, (2, 1, 0))), "bias": jnp.asarray(b2)},
    }
    got = np.asarray(vae.residual_unit(p, jnp.asarray(x), dil))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_fused_decoder_block_matches_plain(params):
    """decoder_block_pallas (interpret) ≡ snake→conv_t→res-units split path."""
    import numpy as np

    from acestep_tpu.ops.pallas_vae import decoder_block_pallas

    rng = np.random.default_rng(3)
    for ci_idx, stride in ((1, 2),):
        bp = params["decoder"]["block"][len(TINY.downsampling_ratios) - 1]
        ci = bp["conv_t1"]["kernel"].shape[1]
        x = jnp.asarray(rng.standard_normal((2, 40, ci)), jnp.float32)
        ref = vae.decoder_block(bp, x, TINY.downsampling_ratios[0])
        got = decoder_block_pallas(x, bp, TINY.downsampling_ratios[0], interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=1e-4, atol=1e-4,
        )


def test_fused_kernel_short_sequence_gates(params):
    """Latents too short for the fused kernels' halo invariants must take the
    unfused path (gates), and the gate thresholds must be exactly where the
    kernels stop working: just-above-threshold shapes still match the split
    path in interpret mode."""
    import numpy as np

    from acestep_tpu.models.vae import _fused_block_supports, _res_units_supports
    from acestep_tpu.ops.pallas_vae import (
        TOTAL_HALO,
        _upsample_halo,
        decoder_block_pallas,
        res_units_pallas,
    )

    # stride 2: halo needs 24 aligned input rows — 16 is too short.
    assert not _fused_block_supports(16, 2)
    assert _fused_block_supports(_upsample_halo(2), 2)
    assert not _res_units_supports(32)
    assert _res_units_supports(TOTAL_HALO)

    # The shortest gate-passing shapes actually run and match the split path.
    stride = TINY.downsampling_ratios[0]
    bp = params["decoder"]["block"][len(TINY.downsampling_ratios) - 1]
    ci = bp["conv_t1"]["kernel"].shape[1]
    l_min = _upsample_halo(stride)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, l_min, ci)), jnp.float32)
    ref = vae.decoder_block(bp, x, stride)
    got = decoder_block_pallas(x, bp, stride, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=1e-4, atol=1e-4,
    )

    co = bp["conv_t1"]["kernel"].shape[2]
    units = (bp["res_unit1"], bp["res_unit2"], bp["res_unit3"])
    y = jnp.asarray(rng.standard_normal((1, TOTAL_HALO, co)), jnp.float32)
    ref_u = vae.residual_unit(units[0], y, 1)
    ref_u = vae.residual_unit(units[1], ref_u, 3)
    ref_u = vae.residual_unit(units[2], ref_u, 9)
    got_u = res_units_pallas(y, units, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_u, np.float32), np.asarray(ref_u, np.float32),
        rtol=1e-4, atol=1e-4,
    )
