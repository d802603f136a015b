"""Generate golden-activation fixtures by RUNNING the reference model code.

No real checkpoints exist in this environment, so reference-consistency is
established the next-best way (VERDICT round 1, item 1): instantiate the
REFERENCE PyTorch modules (`/root/reference/acestep/models/turbo/
modeling_acestep_v15_turbo.py`) on CPU with seeded random weights at a tiny
but structurally faithful config, drive them on fixed inputs, and record
(state_dict, inputs, activations) as .npz fixtures. `tests/test_golden_parity.py`
then converts the recorded state_dict through `params.convert_torch_state_dict`
and asserts the JAX forward passes reproduce every activation.

The only reference dependency not installed is vector-quantize-pytorch; a
faithful stand-in lives in tools/vq_stub (see its module docstring for the one
unverifiable convention).

Run from the repo root:  python tools/golden_gen.py
Outputs: tests/goldens/dit_tiny.npz, tests/goldens/qwen3_tiny.npz
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_TURBO = "/root/reference/acestep/models/turbo"
OUT_DIR = os.path.join(REPO, "tests", "goldens")

sys.path.insert(0, os.path.join(REPO, "tools", "vq_stub"))


def _import_reference_turbo():
    """Import the reference model file standalone (its config import has a
    non-package fallback, modeling_acestep_v15_turbo.py:44-47)."""
    sys.path.insert(0, REF_TURBO)
    spec = importlib.util.spec_from_file_location(
        "ref_turbo_modeling", os.path.join(REF_TURBO, "modeling_acestep_v15_turbo.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_turbo_modeling"] = mod  # inspect.getfile needs this
    spec.loader.exec_module(mod)
    return mod


def tiny_config(mod):
    """Structurally faithful miniature of the turbo config: alternating
    sliding/full layers, GQA, patch 2, pool 5, FSQ levels 8·8·8·5·5·5.

    num_lyric/timbre layers are kept <= num_hidden_layers because the
    reference encoder loops slice `self.layers[:num_hidden_layers]`
    (modeling_acestep_v15_turbo.py:700, :1162)."""
    return mod.AceStepConfig(
        vocab_size=64003,
        fsq_dim=64,
        fsq_input_levels=[8, 8, 8, 5, 5, 5],
        fsq_input_num_quantizers=1,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        sliding_window=8,
        num_lyric_encoder_hidden_layers=2,
        audio_acoustic_hidden_dim=64,
        pool_window_size=5,
        text_hidden_dim=32,
        in_channels=192,
        timbre_hidden_dim=64,
        num_timbre_encoder_hidden_layers=2,
        timbre_fix_frame=10,
        patch_size=2,
        num_attention_pooler_hidden_layers=1,
        num_audio_decoder_hidden_layers=4,
    )


def gen_dit_fixture():
    mod = _import_reference_turbo()
    cfg = tiny_config(mod)
    torch.manual_seed(0)
    model = mod.AceStepConditionGenerationModel(cfg).float().eval()
    rng = np.random.default_rng(42)

    B, T = 2, 20  # latent frames; pool 5 -> 4 tokens; patch 2 -> 10 DiT tokens
    D_AC = cfg.audio_acoustic_hidden_dim

    def randn(*shape, scale=1.0):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    inputs = {
        "text_h": randn(B, 7, cfg.text_hidden_dim),
        "text_m": np.array([[1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0, 0]], np.float32),
        "lyric_h": randn(B, 11, cfg.text_hidden_dim),
        "lyric_m": np.array([[1] * 11, [1] * 8 + [0] * 3], np.float32),
        # 3 packed reference audios: sample 0 owns two, sample 1 owns one.
        "refer_packed": randn(3, cfg.timbre_fix_frame, cfg.timbre_hidden_dim),
        "refer_order": np.array([0, 0, 1], np.int64),
        "src_latents": randn(B, T, D_AC),
        "attn_mask": np.concatenate([np.ones((1, T)), np.concatenate([np.ones((1, 15)), np.zeros((1, 5))], 1)], 0).astype(np.float32),
        "chunk_masks": (rng.integers(0, 2, size=(B, T, D_AC))).astype(np.float32),
        "is_covers": np.array([1.0, 0.0], np.float32),
        "silence_latent": randn(1, 25, D_AC),
        "xt": randn(B, T, D_AC),
        "noise": randn(B, T, D_AC),
        "audio_codes": rng.integers(0, 64000, size=(B, 4)).astype(np.int64),
        "pooler_x": randn(B, 4, cfg.pool_window_size, cfg.hidden_size),
        "t_vals": np.array([1.0, 0.3], np.float32),
    }
    tt = {k: torch.from_numpy(v) for k, v in inputs.items()}

    out = {}
    with torch.no_grad():
        # Sub-encoders
        lyr = model.encoder.lyric_encoder(
            inputs_embeds=tt["lyric_h"], attention_mask=tt["lyric_m"]
        ).last_hidden_state
        out["lyric_out"] = lyr
        timbre_unpack, timbre_mask = model.encoder.timbre_encoder(
            tt["refer_packed"], tt["refer_order"]
        )
        out["timbre_unpack"] = timbre_unpack
        out["timbre_mask"] = timbre_mask
        out["pooler_out"] = model.tokenizer.attention_pooler(tt["pooler_x"])

        enc_h, enc_m = model.encoder(
            text_hidden_states=tt["text_h"],
            text_attention_mask=tt["text_m"],
            lyric_hidden_states=tt["lyric_h"],
            lyric_attention_mask=tt["lyric_m"],
            refer_audio_acoustic_hidden_states_packed=tt["refer_packed"],
            refer_audio_order_mask=tt["refer_order"],
        )
        out["enc_h"], out["enc_m"] = enc_h, enc_m

        # Tokenize / detokenize / FSQ-from-indices
        quantized, indices, llm_mask = model.tokenize(
            tt["src_latents"], tt["silence_latent"], tt["attn_mask"]
        )
        out["tok_quantized"] = quantized
        out["tok_indices"] = indices
        out["tok_mask"] = llm_mask
        out["detok_out"] = model.detokenize(quantized)
        out["fsq_from_indices"] = model.tokenizer.quantizer.get_output_from_indices(
            tt["audio_codes"]
        )

        # prepare_condition (mixed covers)
        p_enc_h, p_enc_m, p_ctx = model.prepare_condition(
            text_hidden_states=tt["text_h"],
            text_attention_mask=tt["text_m"],
            lyric_hidden_states=tt["lyric_h"],
            lyric_attention_mask=tt["lyric_m"],
            refer_audio_acoustic_hidden_states_packed=tt["refer_packed"],
            refer_audio_order_mask=tt["refer_order"],
            hidden_states=tt["src_latents"],
            attention_mask=tt["attn_mask"],
            silence_latent=tt["silence_latent"],
            src_latents=tt["src_latents"],
            chunk_masks=tt["chunk_masks"],
            is_covers=tt["is_covers"],
        )
        out["prep_enc_h"], out["prep_enc_m"], out["prep_ctx"] = p_enc_h, p_enc_m, p_ctx

        # All-covers variant (pins the hints-as-src path used by cover runs)
        _, _, p_ctx_cov = model.prepare_condition(
            text_hidden_states=tt["text_h"],
            text_attention_mask=tt["text_m"],
            lyric_hidden_states=tt["lyric_h"],
            lyric_attention_mask=tt["lyric_m"],
            refer_audio_acoustic_hidden_states_packed=tt["refer_packed"],
            refer_audio_order_mask=tt["refer_order"],
            hidden_states=tt["src_latents"],
            attention_mask=tt["attn_mask"],
            silence_latent=tt["silence_latent"],
            src_latents=tt["src_latents"],
            chunk_masks=tt["chunk_masks"],
            is_covers=torch.ones_like(tt["is_covers"]),
        )
        out["prep_ctx_cover"] = p_ctx_cov

        # Decoder single forwards at two timesteps
        for tag, tv in (("t10", 1.0), ("t03", 0.3)):
            tvec = torch.full((B,), tv)
            dec = model.decoder(
                hidden_states=tt["xt"],
                timestep=tvec,
                timestep_r=tvec,
                attention_mask=tt["attn_mask"],
                encoder_hidden_states=p_enc_h,
                encoder_attention_mask=p_enc_m,
                context_latents=p_ctx,
            )
            out[f"dec_v_{tag}"] = dec[0]

        # Full 8-step ODE trajectories with pinned noise (shift 3 and 2)
        model.prepare_noise = lambda ctx, seed=None: tt["noise"]
        gen_common = dict(
            text_hidden_states=tt["text_h"],
            text_attention_mask=tt["text_m"],
            lyric_hidden_states=tt["lyric_h"],
            lyric_attention_mask=tt["lyric_m"],
            refer_audio_acoustic_hidden_states_packed=tt["refer_packed"],
            refer_audio_order_mask=tt["refer_order"],
            src_latents=tt["src_latents"],
            chunk_masks=tt["chunk_masks"],
            is_covers=tt["is_covers"],
            silence_latent=tt["silence_latent"],
            attention_mask=tt["attn_mask"],
            infer_method="ode",
        )
        for shift in (3.0, 2.0):
            g = model.generate_audio(**gen_common, shift=shift)
            out[f"gen_latents_shift{int(shift)}"] = g["target_latents"]

        # Cover-path goldens run with FULLY-VALID masks: these are the only
        # goldens exercising generate_audio itself, whose serving path applies
        # the padding masks the reference decoder drops (see module docstring
        # note in test_golden_parity.py) — all-ones masks make the two
        # conventions coincide and isolate the cover-segment logic.
        ones_masks = dict(
            text_attention_mask=torch.ones_like(tt["text_m"]),
            lyric_attention_mask=torch.ones_like(tt["lyric_m"]),
            attention_mask=torch.ones_like(tt["attn_mask"]),
            is_covers=torch.ones_like(tt["is_covers"]),
        )
        g = model.generate_audio(**{**gen_common, **ones_masks}, shift=3.0)
        out["gen_cover_plain"] = g["target_latents"]

        # Cover-noise entry: renoise from src partway down the schedule
        # (ref :1924-1945 truncation + renoise), all samples covers.
        g = model.generate_audio(**{**gen_common, **ones_masks},
                                 shift=3.0, cover_noise_strength=0.6)
        out["gen_cover_noise"] = g["target_latents"]

        # Mid-trajectory non-cover switch (audio_cover_strength < 1,
        # ref :1891-1911 second prepare_condition + :1957-1965 swap).
        g = model.generate_audio(
            **{**gen_common, **ones_masks},
            shift=3.0, audio_cover_strength=0.5,
            non_cover_text_hidden_states=tt["text_h"] * 0.5,
            non_cover_text_attention_mask=torch.ones_like(tt["text_m"]),
        )
        out["gen_cover_switch"] = g["target_latents"]

    data = {}
    for k, v in model.state_dict().items():
        data["sd/" + k] = v.detach().numpy().astype(np.float32)
    for k, v in inputs.items():
        data["in/" + k] = v
    for k, v in out.items():
        data["out/" + k] = v.detach().numpy().astype(np.float32) if v.dtype.is_floating_point else v.detach().numpy()
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "dit_tiny.npz")
    np.savez_compressed(path, **data)
    print(f"wrote {path}: {len(data)} arrays, "
          f"{sum(a.nbytes for a in data.values()) / 1e6:.1f} MB raw")


def gen_qwen3_fixture():
    """Tiny REAL transformers Qwen3 — oracle for models/qwen3.py + converter."""
    from transformers.models.qwen3 import Qwen3Config as HFQwen3Config
    from transformers.models.qwen3.modeling_qwen3 import Qwen3ForCausalLM

    cfg = HFQwen3Config(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rope_theta=1_000_000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=True,
        attention_dropout=0.0,
        max_position_embeddings=2048,
    )
    torch.manual_seed(1)
    model = Qwen3ForCausalLM(cfg).float().eval()
    rng = np.random.default_rng(7)

    B, L = 2, 12
    ids = rng.integers(0, 512, size=(B, L)).astype(np.int64)
    # Right-padding (the JAX prefill's convention; positions from mask sums)
    mask = np.ones((B, L), np.int64)
    mask[1, 9:] = 0
    ids[1, 9:] = 0

    with torch.no_grad():
        res = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        )
        logits = res.logits.numpy().astype(np.float32)  # (B, L, V)
        hidden = model.model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy().astype(np.float32)

        # Incremental decode golden: append 3 greedy tokens per row (from the
        # last VALID position), recording the logits used at each step.
        dec_tokens = np.zeros((B, 3), np.int64)
        dec_logits = np.zeros((B, 3, 512), np.float32)
        cur_ids = [list(ids[b, : mask[b].sum()]) for b in range(B)]
        for step in range(3):
            for b in range(B):
                t_ids = torch.tensor([cur_ids[b]])
                lg = model(input_ids=t_ids).logits[0, -1]
                dec_logits[b, step] = lg.numpy()
                nxt = int(lg.argmax())
                dec_tokens[b, step] = nxt
                cur_ids[b].append(nxt)

    data = {"in/ids": ids, "in/mask": mask,
            "out/logits": logits, "out/hidden": hidden,
            "out/dec_tokens": dec_tokens, "out/dec_logits": dec_logits}
    for k, v in model.state_dict().items():
        data["sd/" + k] = v.detach().numpy().astype(np.float32)
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "qwen3_tiny.npz")
    np.savez_compressed(path, **data)
    print(f"wrote {path}: {len(data)} arrays")


def _import_reference_base():
    """Import the reference BASE model file standalone (it carries the same
    non-package import fallback for config + apg_guidance,
    modeling_acestep_v15_base.py:44-50)."""
    base_dir = "/root/reference/acestep/models/base"
    sys.path.insert(0, base_dir)
    spec = importlib.util.spec_from_file_location(
        "ref_base_modeling", os.path.join(base_dir, "modeling_acestep_v15_base.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_base_modeling"] = mod
    spec.loader.exec_module(mod)
    return mod


def gen_base_fixture():
    """Base-model goldens: APG momentum chain, ADG, and the CFG-batched
    linspace+shift denoise loop (`modeling_acestep_v15_base.py:1783-1990`,
    `apg_guidance.py:5-120`)."""
    mod = _import_reference_base()
    import apg_guidance as apg  # from the base dir put on sys.path

    cfg = tiny_config(mod)
    torch.manual_seed(0)
    model = mod.AceStepConditionGenerationModel(cfg).float().eval()
    rng = np.random.default_rng(77)

    B, T = 2, 20
    D_AC = cfg.audio_acoustic_hidden_dim

    def randn(*shape, scale=1.0):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    inputs = {
        "text_h": randn(B, 7, cfg.text_hidden_dim),
        "text_m": np.ones((B, 7), np.float32),
        "lyric_h": randn(B, 11, cfg.text_hidden_dim),
        "lyric_m": np.ones((B, 11), np.float32),
        "refer_packed": randn(B, cfg.timbre_fix_frame, cfg.timbre_hidden_dim),
        "refer_order": np.arange(B, dtype=np.int64),
        "src_latents": randn(B, T, D_AC),
        "attn_mask": np.ones((B, T), np.float32),
        "chunk_masks": np.ones((B, T, D_AC), np.float32),
        "is_covers": np.zeros((B,), np.float32),
        "silence_latent": randn(1, 25, D_AC),
        "noise": randn(B, T, D_AC),
        # APG/ADG unit inputs
        "apg_cond": randn(3, B, T, D_AC),  # 3 sequential steps (momentum carry)
        "apg_uncond": randn(3, B, T, D_AC),
        "adg_latents": randn(B, T, D_AC),
    }
    tt = {k: torch.from_numpy(v) for k, v in inputs.items()}

    out = {}
    with torch.no_grad():
        # APG with momentum carried across 3 calls (dims=[1] as the base loop uses)
        buf = apg.MomentumBuffer()
        apg_outs = []
        for i in range(3):
            apg_outs.append(apg.apg_forward(
                pred_cond=tt["apg_cond"][i], pred_uncond=tt["apg_uncond"][i],
                guidance_scale=3.0, momentum_buffer=buf, dims=[1],
            ))
        out["apg_chain"] = torch.stack(apg_outs)

        # NOTE: the reference's adg_forward broadcasts cos(theta) of shape
        # (n*t, 1) against (n, t, c) — it only works at batch size 1 (crashes
        # for B>1); goldens are recorded at B=1 accordingly.
        out["adg"] = apg.adg_forward(
            latents=tt["adg_latents"][:1], noise_pred_cond=tt["apg_cond"][0][:1],
            noise_pred_uncond=tt["apg_uncond"][0][:1], sigma=0.7, guidance_scale=3.0,
        )

        model.prepare_noise = lambda ctx, seed=None: tt["noise"]
        for tag, kw in (
            ("cfg_apg", dict(diffusion_guidance_sale=3.0, use_adg=False)),
            ("cfg_adg", dict(diffusion_guidance_sale=3.0, use_adg=True, b1=True)),
            ("cfg_interval", dict(diffusion_guidance_sale=3.0, use_adg=False,
                                  cfg_interval_start=0.3, cfg_interval_end=0.8)),
            ("noguidance", dict(diffusion_guidance_sale=1.0)),
        ):
            b1 = kw.pop("b1", False)  # ref ADG is batch-1-only (see note above)
            sl = (slice(0, 1) if b1 else slice(None))
            model.prepare_noise = lambda ctx, seed=None, _sl=sl: tt["noise"][_sl]
            g = model.generate_audio(
                text_hidden_states=tt["text_h"][sl], text_attention_mask=tt["text_m"][sl],
                lyric_hidden_states=tt["lyric_h"][sl], lyric_attention_mask=tt["lyric_m"][sl],
                refer_audio_acoustic_hidden_states_packed=tt["refer_packed"][sl],
                refer_audio_order_mask=tt["refer_order"][sl],
                src_latents=tt["src_latents"][sl], chunk_masks=tt["chunk_masks"][sl],
                is_covers=tt["is_covers"][sl], silence_latent=tt["silence_latent"],
                attention_mask=tt["attn_mask"][sl], infer_method="ode",
                infer_steps=6, shift=2.0, use_progress_bar=False, **kw,
            )
            out[f"gen_{tag}"] = g["target_latents"]

    data = {}
    for k, v in model.state_dict().items():
        data["sd/" + k] = v.detach().numpy().astype(np.float32)
    for k, v in inputs.items():
        data["in/" + k] = v
    for k, v in out.items():
        data["out/" + k] = v.detach().numpy().astype(np.float32)
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "base_tiny.npz")
    np.savez_compressed(path, **data)
    print(f"wrote {path}: {len(data)} arrays")


def gen_vae_fixture():
    """Tiny Oobleck VAE (torch mirror of diffusers' module graph with
    weight-normed convs — see tools/torch_oobleck.py) → fixture for the
    weight-norm-folding converter + JAX conv stacks."""
    from torch_oobleck import AutoencoderOobleckMirror

    torch.manual_seed(2)
    model = AutoencoderOobleckMirror(
        encoder_hidden_size=8, downsampling_ratios=[2, 4], channel_multiples=[2, 4],
        decoder_channels=8, decoder_input_channels=4, audio_channels=2,
    ).float().eval()
    rng = np.random.default_rng(9)

    B, L = 2, 64  # hop = 8 → 8 latent frames
    audio = rng.standard_normal((B, 2, L)).astype(np.float32) * 0.3
    latents = rng.standard_normal((B, 4, L // 8)).astype(np.float32)
    with torch.no_grad():
        enc_raw = model.encode_raw(torch.from_numpy(audio)).numpy()
        dec = model.decode(torch.from_numpy(latents)).numpy()

    data = {"in/audio": audio, "in/latents": latents,
            "out/enc_raw": enc_raw, "out/dec": dec}
    for k, v in model.state_dict().items():
        data["sd/" + k] = v.detach().numpy().astype(np.float32)
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "vae_tiny.npz")
    np.savez_compressed(path, **data)
    print(f"wrote {path}: {len(data)} arrays")


def gen_checkpoint_fixture():
    """Write a REAL on-disk checkpoint in the reference layout
    (ref init_service_loader.py:13-161 + llm_inference.py:534-541):

        checkpoint_tiny/
          config.json            — reference AceStepConfig.to_dict() keys
          model.safetensors      — reference turbo model state_dict
          silence_latent.pt      — torch tensor (1, T, acoustic)
          vae/config.json + diffusion_pytorch_model.safetensors
          Qwen3-Embedding-0.6B/config.json + model.safetensors
          acestep-5Hz-lm-0.6B/config.json + model.safetensors + genres_vocab.txt

    Unlike the activation fixtures, this family is INTERNALLY CONSISTENT
    (DiT text_hidden_dim == text-encoder hidden_size, VAE latent dim ==
    DiT acoustic dim) so `tests/test_checkpoint_load.py` can drive ONE full
    generate_music through weights that went through the disk loader.
    """
    from safetensors.numpy import save_file

    from torch_oobleck import AutoencoderOobleckMirror

    ckpt = os.path.join(OUT_DIR, "checkpoint_tiny")
    os.makedirs(ckpt, exist_ok=True)

    def save_st(state_dict, path):
        save_file(
            {k: v.detach().numpy().astype(np.float32) for k, v in state_dict.items()},
            path,
        )

    # --- DiT (reference turbo model; acoustic dim 16 keeps the matching VAE
    # small, text_hidden_dim 64 matches the tiny Qwen3 embedding below) ---
    mod = _import_reference_turbo()
    cfg = tiny_config(mod)
    cfg.audio_acoustic_hidden_dim = 16
    cfg.in_channels = 48  # 16 noisy + 16 src + 16 chunk-mask
    cfg.timbre_hidden_dim = 16  # timbre encoder consumes VAE (acoustic) latents
    cfg.text_hidden_dim = 64
    torch.manual_seed(11)
    model = mod.AceStepConditionGenerationModel(cfg).float().eval()
    save_st(model.state_dict(), os.path.join(ckpt, "model.safetensors"))
    import json as _json

    with open(os.path.join(ckpt, "config.json"), "w") as f:
        _json.dump(cfg.to_dict(), f, indent=1, default=str)

    # silence_latent.pt — random (not zeros) so the test can PROVE it loaded
    torch.manual_seed(12)
    torch.save(torch.randn(1, 25, 16) * 0.1, os.path.join(ckpt, "silence_latent.pt"))

    # --- VAE (torch mirror of the diffusers graph; encode mean dim 16) ---
    vdir = os.path.join(ckpt, "vae")
    os.makedirs(vdir, exist_ok=True)
    torch.manual_seed(13)
    vae_kw = dict(
        encoder_hidden_size=32, downsampling_ratios=[2, 4, 4],
        channel_multiples=[1, 1, 1], decoder_channels=16,
        decoder_input_channels=16, audio_channels=2,
    )
    vmodel = AutoencoderOobleckMirror(**vae_kw).float().eval()
    save_st(vmodel.state_dict(), os.path.join(vdir, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(vdir, "config.json"), "w") as f:
        # hop 32 @ 800 Hz keeps the 25 latent-frames/s contract
        _json.dump({**vae_kw, "sampling_rate": 800}, f, indent=1)

    # --- text encoder + 5 Hz LM (both tiny REAL transformers Qwen3) ---
    from transformers.models.qwen3 import Qwen3Config as HFQwen3Config
    from transformers.models.qwen3.modeling_qwen3 import Qwen3ForCausalLM

    qcfg = HFQwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=1_000_000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=True, attention_dropout=0.0,
        max_position_embeddings=2048,
    )
    for sub, seed in (("Qwen3-Embedding-0.6B", 14), ("acestep-5Hz-lm-0.6B", 15)):
        d = os.path.join(ckpt, sub)
        os.makedirs(d, exist_ok=True)
        torch.manual_seed(seed)
        qmodel = Qwen3ForCausalLM(qcfg).float().eval()
        save_st(qmodel.state_dict(), os.path.join(d, "model.safetensors"))
        with open(os.path.join(d, "config.json"), "w") as f:
            _json.dump(qcfg.to_dict(), f, indent=1, default=str)
    with open(os.path.join(ckpt, "acestep-5Hz-lm-0.6B", "genres_vocab.txt"), "w") as f:
        f.write("synthwave\nambient\nrock\n")
    print(f"wrote {ckpt}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if which in ("all", "dit"):
        gen_dit_fixture()
    if which in ("all", "qwen3"):
        gen_qwen3_fixture()
    if which in ("all", "vae"):
        gen_vae_fixture()
    if which in ("all", "base"):
        gen_base_fixture()
    if which in ("all", "checkpoint"):
        gen_checkpoint_fixture()
