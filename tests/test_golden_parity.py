"""Reference-consistency golden tests (VERDICT round-1 item 1).

Fixtures in tests/goldens/ were produced by `tools/golden_gen.py`, which RUNS
the reference implementation itself:

- dit_tiny.npz — the reference `AceStepConditionGenerationModel`
  (`/root/reference/acestep/models/turbo/modeling_acestep_v15_turbo.py`) on
  CPU/torch/f32 with seeded random weights at a tiny but structurally faithful
  config (alternating sliding/full layers, GQA, patch 2, pool 5, FSQ
  8·8·8·5·5·5). state_dict + inputs + per-module activations.
- qwen3_tiny.npz — a real `transformers` Qwen3ForCausalLM (the family both the
  text encoder and the 5 Hz planner LM belong to).

Every test converts the recorded torch state_dict through this repo's
checkpoint converters and asserts the JAX forward reproduces the recorded
activations to float32 round-off — validating converter layout (transposes,
weight-norm folding, stacking) AND module math (RoPE, GQA, AdaLN, FSQ index
codec, schedules) against the reference code, not against ourselves.

Note on masks: the reference DiT decoder forward hard-drops both the latent
attention mask and the encoder mask (modeling_acestep_v15_turbo.py:1383-1384 —
`attention_mask = None; encoder_attention_mask = None`), i.e. padding
participates in decoder attention. Decoder goldens therefore compare with
masks=None. This repo's serving path keeps masks ON (padding-invariant with
latent buckets — see test_masked_padding_invariance, which proves masked
padded forward == unpadded forward, a property the reference lacks).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from acestep_tpu.config import AceStepConfig, Qwen3Config
from acestep_tpu.models import dit, qwen3
from acestep_tpu.ops.fsq import residual_fsq_decode_indices
from acestep_tpu.params import convert_torch_state_dict

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

TINY = AceStepConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=4,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16, sliding_window=8,
    text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
    num_timbre_encoder_hidden_layers=2, num_attention_pooler_hidden_layers=1,
    fsq_dim=64, timbre_fix_frame=10,
)

TOL = 5e-6  # float32 round-off headroom (observed max ≈ 7e-7)

# Collected {module: max_abs_err} for the PARITY.md report.
_report = {}


def _assert_close(name, got, want, tol=TOL):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    assert got.shape == want.shape, f"{name}: {got.shape} vs {want.shape}"
    err = float(np.abs(got - want).max())
    _report[name] = err
    assert err < tol, f"{name}: max abs err {err:.3e} >= {tol}"


@pytest.fixture(scope="module")
def dit_golden():
    z = np.load(os.path.join(GOLDEN_DIR, "dit_tiny.npz"))
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd/")}
    inp = {k[3:]: jnp.asarray(z[k]) for k in z.files if k.startswith("in/")}
    out = {k[4:]: z[k] for k in z.files if k.startswith("out/")}
    params = convert_torch_state_dict(sd, TINY, jnp.float32)
    return params, inp, out


def test_lyric_encoder_golden(dit_golden):
    params, IN, OUT = dit_golden
    got = dit.lyric_encoder(params["encoder"]["lyric_encoder"], TINY, IN["lyric_h"], IN["lyric_m"])
    _assert_close("lyric_encoder", got, OUT["lyric_out"])


def test_timbre_encoder_golden(dit_golden):
    params, IN, OUT = dit_golden
    tu, tm = dit.timbre_encoder(
        params["encoder"]["timbre_encoder"], TINY,
        IN["refer_packed"], IN["refer_order"].astype(jnp.int32), 2, 2,
    )
    _assert_close("timbre_encoder", tu, OUT["timbre_unpack"])
    np.testing.assert_array_equal(np.asarray(tm), OUT["timbre_mask"])


def test_attention_pooler_golden(dit_golden):
    params, IN, OUT = dit_golden
    got = dit.attention_pooler(params["tokenizer"]["attention_pooler"], TINY, IN["pooler_x"])
    _assert_close("attention_pooler", got, OUT["pooler_out"])


def test_audio_tokenize_golden(dit_golden):
    params, IN, OUT = dit_golden
    q, idx = dit.audio_tokenize(params["tokenizer"], TINY, IN["src_latents"])
    _assert_close("audio_tokenize.quantized", q, OUT["tok_quantized"], tol=1e-5)
    ref_idx = OUT["tok_indices"]
    if ref_idx.ndim == 3:  # ResidualFSQ stacks a trailing quantizer axis
        ref_idx = ref_idx[..., 0]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    _report["audio_tokenize.indices"] = 0.0


def test_detokenizer_golden(dit_golden):
    params, IN, OUT = dit_golden
    got = dit.detokenizer(params["detokenizer"], TINY, jnp.asarray(OUT["tok_quantized"]))
    _assert_close("detokenizer", got, OUT["detok_out"])


def test_fsq_decode_indices_golden(dit_golden):
    """LM audio codes → latents path must BIT-match (SURVEY §7.3 FSQ parity)."""
    params, IN, OUT = dit_golden
    got = residual_fsq_decode_indices(
        params["tokenizer"]["quantizer"], IN["audio_codes"], TINY.fsq_levels, jnp.float32
    )
    _assert_close("fsq.get_output_from_indices", got, OUT["fsq_from_indices"], tol=1e-6)


def test_prepare_condition_golden(dit_golden):
    params, IN, OUT = dit_golden
    enc, enc_m, ctx = dit.prepare_condition(
        params, TINY,
        text_hidden_states=IN["text_h"], text_attention_mask=IN["text_m"],
        lyric_hidden_states=IN["lyric_h"], lyric_attention_mask=IN["lyric_m"],
        refer_packed=IN["refer_packed"], refer_order_mask=IN["refer_order"].astype(jnp.int32),
        src_latents=IN["src_latents"], chunk_masks=IN["chunk_masks"],
        is_covers=IN["is_covers"], attention_mask=IN["attn_mask"],
        silence_latent=IN["silence_latent"], max_refs=2,
    )
    _assert_close("prepare_condition.encoder_hidden", enc, OUT["prep_enc_h"])
    np.testing.assert_array_equal(np.asarray(enc_m), OUT["prep_enc_m"])
    _assert_close("prepare_condition.context_latents", ctx, OUT["prep_ctx"])


def test_dit_forward_golden(dit_golden):
    params, IN, OUT = dit_golden
    kvs = dit.precompute_cross_kv(params["decoder"], TINY, jnp.asarray(OUT["prep_enc_h"]))
    for tag, tv in (("t10", 1.0), ("t03", 0.3)):
        tvec = jnp.full((2,), tv, jnp.float32)
        got = dit.dit_forward(
            params["decoder"], TINY, IN["xt"], tvec, tvec,
            jnp.asarray(OUT["prep_ctx"]), kvs,
            encoder_mask=None, latent_mask=None,  # reference convention (see module docstring)
        )
        _assert_close(f"dit_forward@{tag}", got, OUT[f"dec_v_{tag}"])


def test_denoise_trajectory_golden(dit_golden):
    """Full 8-step ODE scan == reference eager loop, for shift 3 and 2."""
    params, IN, OUT = dit_golden
    kvs = dit.precompute_cross_kv(params["decoder"], TINY, jnp.asarray(OUT["prep_enc_h"]))
    for shift in (3, 2):
        sched = dit.build_t_schedule(shift=float(shift))
        t_next = sched[1:] + [0.0]
        xt = dit.denoise_scan(
            params["decoder"], TINY, IN["noise"],
            jnp.asarray(sched, jnp.float32), jnp.asarray(t_next, jnp.float32),
            jnp.asarray(OUT["prep_ctx"]), kvs, None, None,
        )
        _assert_close(f"denoise_scan@shift{shift}", xt, OUT[f"gen_latents_shift{shift}"])


def test_stacked_layers_match_golden(dit_golden):
    """The scan-stacked serving layout must agree with the golden too."""
    params, IN, OUT = dit_golden
    stacked = dit.stack_acestep_params(params, TINY)
    kvs = dit.precompute_cross_kv(stacked["decoder"], TINY, jnp.asarray(OUT["prep_enc_h"]))
    tvec = jnp.full((2,), 1.0, jnp.float32)
    got = dit.dit_forward(
        stacked["decoder"], TINY, IN["xt"], tvec, tvec,
        jnp.asarray(OUT["prep_ctx"]), kvs, encoder_mask=None, latent_mask=None,
    )
    _assert_close("dit_forward@stacked", got, OUT["dec_v_t10"])


def test_masked_padding_invariance(dit_golden):
    """This repo's deviation from the reference, proven sound: with masks ON,
    bucket padding cannot influence valid positions (the reference, which
    attends into padding, has no such property)."""
    params, IN, OUT = dit_golden
    xt = IN["xt"]
    ctx = jnp.asarray(OUT["prep_ctx"])
    b, t, _ = xt.shape
    tvec = jnp.full((b,), 0.5, jnp.float32)
    kvs = dit.precompute_cross_kv(params["decoder"], TINY, jnp.asarray(OUT["prep_enc_h"]))
    base = dit.dit_forward(
        params["decoder"], TINY, xt, tvec, tvec, ctx, kvs,
        encoder_mask=jnp.asarray(OUT["prep_enc_m"]),
        latent_mask=jnp.ones((b, t), jnp.float32),
    )
    pad = 6
    xt_p = jnp.pad(xt, ((0, 0), (0, pad), (0, 0)), constant_values=1.7)
    ctx_p = jnp.pad(ctx, ((0, 0), (0, pad), (0, 0)), constant_values=-0.9)
    mask_p = jnp.concatenate([jnp.ones((b, t)), jnp.zeros((b, pad))], axis=1)
    padded = dit.dit_forward(
        params["decoder"], TINY, xt_p, tvec, tvec, ctx_p, kvs,
        encoder_mask=jnp.asarray(OUT["prep_enc_m"]), latent_mask=mask_p,
    )
    np.testing.assert_allclose(
        np.asarray(padded[:, :t]), np.asarray(base), atol=2e-5,
    )


# ---------------------------------------------------------------------------
# Qwen3 (text encoder + 5 Hz LM family) vs real transformers
# ---------------------------------------------------------------------------

QTINY = Qwen3Config(
    vocab_size=512, hidden_size=64, intermediate_size=128, num_hidden_layers=3,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16,
    rope_theta=1_000_000.0, tie_word_embeddings=True,
)


@pytest.fixture(scope="module")
def qwen3_golden():
    z = np.load(os.path.join(GOLDEN_DIR, "qwen3_tiny.npz"))
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd/")}
    params = qwen3.convert_torch_qwen3_state(sd, QTINY, jnp.float32)
    return params, z


def test_qwen3_hidden_golden(qwen3_golden):
    params, z = qwen3_golden
    ids, mask = z["in/ids"], z["in/mask"]
    got = np.asarray(qwen3.forward_hidden(params, QTINY, jnp.asarray(ids), jnp.asarray(mask)))
    want = z["out/hidden"]
    valid = mask.astype(bool)
    err = np.abs(got[valid] - want[valid]).max()
    _report["qwen3.last_hidden_state"] = float(err)
    assert err < TOL, err


def test_qwen3_prefill_and_decode_golden(qwen3_golden):
    params, z = qwen3_golden
    ids, mask = z["in/ids"], z["in/mask"]
    b, l = ids.shape
    cache = qwen3.KVCache.create(QTINY, b, l + 8, jnp.float32)
    logits, cache = qwen3.prefill(params, QTINY, jnp.asarray(ids), jnp.asarray(mask), cache)
    logits = np.asarray(logits)
    last = mask.sum(axis=1) - 1
    want_last = z["out/logits"][np.arange(b), last]
    err = np.abs(logits - want_last).max()
    _report["qwen3.prefill_logits"] = float(err)
    assert err < 1e-4, err  # logits magnitude ~15; still ~1e-6 relative

    # 3 greedy decode steps against torch incremental logits
    positions = mask.sum(axis=1).astype(np.int32)
    toks = logits.argmax(axis=-1).astype(np.int32)
    np.testing.assert_array_equal(toks, z["out/dec_tokens"][:, 0])
    for step in range(1, 3):
        lg, cache = qwen3.decode_step(
            params, QTINY, jnp.asarray(toks), jnp.asarray(positions), cache
        )
        lg = np.asarray(lg)
        err = np.abs(lg - z["out/dec_logits"][:, step]).max()
        _report[f"qwen3.decode_logits@{step}"] = float(err)
        assert err < 1e-4, err
        toks = lg.argmax(axis=-1).astype(np.int32)
        np.testing.assert_array_equal(toks, z["out/dec_tokens"][:, step])
        positions = positions + 1


# ---------------------------------------------------------------------------
# Oobleck VAE vs the torch mirror (weight-norm folding + conv layouts)
# ---------------------------------------------------------------------------


def test_vae_golden():
    from acestep_tpu.config import OobleckConfig
    from acestep_tpu.models import vae

    z = np.load(os.path.join(GOLDEN_DIR, "vae_tiny.npz"))
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd/")}
    cfg = OobleckConfig(
        encoder_hidden_size=8, downsampling_ratios=(2, 4), channel_multiples=(2, 4),
        decoder_channels=8, decoder_input_channels=4, audio_channels=2,
    )
    params = vae.convert_torch_vae_state(sd, cfg, jnp.float32)

    audio = jnp.asarray(z["in/audio"]).transpose(0, 2, 1)  # NCL → NLC
    got = vae.encode_raw(params, cfg, audio)
    _assert_close("vae.encode_raw", got.transpose(0, 2, 1), z["out/enc_raw"], tol=1e-5)

    latents = jnp.asarray(z["in/latents"]).transpose(0, 2, 1)
    got = vae.decode(params, cfg, latents)
    _assert_close("vae.decode", got.transpose(0, 2, 1), z["out/dec"], tol=1e-5)





# ---------------------------------------------------------------------------
# BASE model (CFG-batched linspace+shift loop, APG/ADG guidance) vs the
# reference base file (`modeling_acestep_v15_base.py:1783-1990`,
# `apg_guidance.py:5-182`)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def base_golden():
    z = np.load(os.path.join(GOLDEN_DIR, "base_tiny.npz"))
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd/")}
    inp = {k[3:]: jnp.asarray(z[k]) for k in z.files if k.startswith("in/")}
    out = {k[4:]: z[k] for k in z.files if k.startswith("out/")}
    params = convert_torch_state_dict(sd, TINY, jnp.float32)
    return params, inp, out


def test_apg_momentum_chain_golden(base_golden):
    _, IN, OUT = base_golden
    momentum = jnp.zeros(IN["apg_cond"].shape[1:], jnp.float32)
    for i in range(3):
        got, momentum = dit.apg_forward(
            IN["apg_cond"][i], IN["apg_uncond"][i], jnp.float32(3.0), momentum,
        )
        _assert_close(f"apg_forward@step{i}", got, OUT["apg_chain"][i], tol=2e-5)


def test_adg_golden(base_golden):
    """ADG parity at batch 1 — the only batch the reference supports (its
    cos(theta) of shape (n*t,1) broadcasts against (n,t,c) only when n==1;
    this JAX version generalizes to any batch)."""
    _, IN, OUT = base_golden
    got = dit.adg_forward(
        IN["adg_latents"][:1], IN["apg_cond"][0][:1], IN["apg_uncond"][0][:1],
        jnp.float32(0.7), 3.0,
    )
    _assert_close("adg_forward", got, OUT["adg"], tol=2e-5)


@pytest.mark.parametrize("tag,use_adg,gs,ci", [
    ("cfg_apg", False, 3.0, (0.0, 1.0)),
    ("cfg_adg", True, 3.0, (0.0, 1.0)),
    ("cfg_interval", False, 3.0, (0.3, 0.8)),
    ("noguidance", False, 1.0, (0.0, 1.0)),
])
def test_base_trajectory_golden(base_golden, tag, use_adg, gs, ci):
    params, IN, OUT = base_golden
    b = 1 if use_adg else 2  # ref ADG is batch-1-only
    sl = slice(0, b)
    enc, enc_m, ctx = dit.prepare_condition(
        params, TINY,
        text_hidden_states=IN["text_h"][sl], text_attention_mask=IN["text_m"][sl],
        lyric_hidden_states=IN["lyric_h"][sl], lyric_attention_mask=IN["lyric_m"][sl],
        refer_packed=IN["refer_packed"][sl],
        refer_order_mask=IN["refer_order"][sl].astype(jnp.int32),
        src_latents=IN["src_latents"][sl], chunk_masks=IN["chunk_masks"][sl],
        is_covers=IN["is_covers"][sl], attention_mask=IN["attn_mask"][sl],
        silence_latent=IN["silence_latent"], max_refs=1,
    )
    kvs = dit.precompute_cross_kv(params["decoder"], TINY, enc)
    null_kvs = None
    if gs > 1.0:
        null_states = jnp.broadcast_to(
            params["null_condition_emb"].astype(enc.dtype), enc.shape
        )
        null_kvs = dit.precompute_cross_kv(params["decoder"], TINY, null_states)
    sched = dit.build_linspace_schedule(6, shift=2.0)
    t_next = sched[1:] + [0.0]
    xt = dit.denoise_scan(
        params["decoder"], TINY, IN["noise"][sl],
        jnp.asarray(sched, jnp.float32), jnp.asarray(t_next, jnp.float32),
        ctx, kvs, None, None, None, null_kvs, None,
        guidance_scale=gs, use_adg=use_adg,
        cfg_interval_start=ci[0], cfg_interval_end=ci[1],
    )
    _assert_close(f"base_trajectory@{tag}", xt, OUT[f"gen_{tag}"], tol=5e-5)


def test_cover_noise_and_switch_trajectories_golden(dit_golden):
    """Cover-noise schedule entry (renoise from src partway down the schedule)
    and the mid-trajectory non-cover switch (audio_cover_strength < 1) against
    the reference loop (ref turbo :1891-1945, :1957-1965)."""
    params, IN, OUT = dit_golden
    # Fully-valid masks: these goldens run generate_audio itself, whose
    # serving path applies the padding masks the reference drops — all-ones
    # text/lyric/latent masks make the conventions nearly coincide (see module
    # docstring). One residual deviation remains by design: the packed-timbre
    # sequence still has ONE pad slot (sample 1 has 1 ref vs sample 0's 2) that
    # this build masks out of cross-attention while the reference attends it —
    # ~2e-4 over 8 steps. The 1e-3 tolerance bounds that; a wrong schedule
    # truncation / renoise entry / segment switch would be O(1).
    common = dict(
        text_hidden_states=IN["text_h"],
        text_attention_mask=jnp.ones_like(IN["text_m"]),
        lyric_hidden_states=IN["lyric_h"],
        lyric_attention_mask=jnp.ones_like(IN["lyric_m"]),
        refer_packed=IN["refer_packed"],
        refer_order_mask=IN["refer_order"].astype(jnp.int32),
        src_latents=IN["src_latents"], chunk_masks=IN["chunk_masks"],
        is_covers=jnp.ones_like(IN["is_covers"]),
        silence_latent=IN["silence_latent"],
        attention_mask=jnp.ones_like(IN["attn_mask"]),
        infer_method="ode", max_refs=2, noise=IN["noise"],
    )
    g = dit.generate_audio(params, TINY, **common, shift=3.0)
    _assert_close("generate_audio@cover_plain", g["target_latents"],
                  OUT["gen_cover_plain"], tol=1e-3)

    g = dit.generate_audio(params, TINY, **common, shift=3.0,
                           cover_noise_strength=0.6)
    _assert_close("generate_audio@cover_noise", g["target_latents"],
                  OUT["gen_cover_noise"], tol=1e-3)

    g = dit.generate_audio(params, TINY, **common, shift=3.0,
                           audio_cover_strength=0.5,
                           non_cover_text_hidden_states=IN["text_h"] * 0.5,
                           non_cover_text_attention_mask=jnp.ones_like(IN["text_m"]))
    _assert_close("generate_audio@cover_switch", g["target_latents"],
                  OUT["gen_cover_switch"], tol=1e-3)


def test_zz_write_parity_report():
    """Emit docs/PARITY.md from the collected per-module errors (runs last)."""
    if len(_report) < 10:  # only write when the full module ran
        pytest.skip("partial run")
    lines = [
        "# Numerical parity vs the reference implementation\n",
        "Per-module max-abs-error of this repo's JAX forward vs activations",
        "recorded from the REFERENCE PyTorch code (torch CPU f32, seeded random",
        "weights, tiny faithful config). Regenerate: `python tools/golden_gen.py`",
        "then `pytest tests/test_golden_parity.py`. See that test's docstring",
        "for the decoder mask-convention note.\n",
        "| module | max abs err |",
        "|---|---|",
    ]
    for k in sorted(_report):
        lines.append(f"| {k} | {_report[k]:.2e} |")
    lines.append("")
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "PARITY.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
