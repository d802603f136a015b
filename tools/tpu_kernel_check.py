"""Pallas-kernel parity on the REAL TPU (CPU pytest can't reach these paths).

Compares the flash/band attention kernel and the fused VAE decoder blocks
against their XLA reference paths on-device. Run from the repo root:

    python tools/tpu_kernel_check.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", f"needs TPU, got {jax.default_backend()}"

from acestep_tpu.ops.attention import attention_xla, make_attention_bias
from acestep_tpu.ops.pallas_attention import flash_attention

rng = np.random.default_rng(0)
ok = True

# --- attention: full / sliding / causal / padded, GQA ---
for tag, kw in (
    ("full", {}),
    ("sliding128", {"window": 128}),
    ("causal", {"causal": True}),
    ("padded", {"pad": 77}),
):
    B, L, H, KV, D = 2, 768, 16, 8, 128
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, KV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, KV, D)), jnp.bfloat16)
    kv_mask = None
    if "pad" in kw:
        m = np.ones((B, L))
        m[:, -kw["pad"]:] = 0
        kv_mask = jnp.asarray(m)
    window = kw.get("window")
    causal = kw.get("causal", False)
    out_f = flash_attention(q, k, v, kv_mask=kv_mask, window=window, causal=causal,
                            scale=D**-0.5)
    bias = make_attention_bias(L, L, kv_mask=kv_mask, window=window, causal=causal)
    out_x = attention_xla(q, k, v, mask=bias, scale=D**-0.5)
    err = float(jnp.max(jnp.abs(out_f.astype(jnp.float32) - out_x.astype(jnp.float32))))
    print(f"attention/{tag}: max_abs={err:.4f} {'OK' if err < 0.05 else 'FAIL'}")
    ok &= err < 0.05

# --- fused VAE decoder blocks vs plain path ---
import os

from acestep_tpu.config import OobleckConfig
from acestep_tpu.models import vae

cfg = OobleckConfig()
params = vae.init_oobleck_params(jax.random.PRNGKey(1), cfg, jnp.float32)
z = jnp.asarray(rng.standard_normal((1, 128, cfg.decoder_input_channels)) * 0.3, jnp.bfloat16)
w_fused = vae.decode(params, cfg, z)
os.environ["ACESTEP_TPU_NO_FUSED_VAE"] = "1"
w_plain = vae.decode(params, cfg, z)
del os.environ["ACESTEP_TPU_NO_FUSED_VAE"]
err = float(jnp.max(jnp.abs(w_fused.astype(jnp.float32) - w_plain.astype(jnp.float32))))
rel = err / (float(jnp.max(jnp.abs(w_plain.astype(jnp.float32)))) + 1e-9)
print(f"vae_fused_blocks: max_abs={err:.4f} rel={rel:.4f} {'OK' if rel < 0.05 else 'FAIL'}")
ok &= rel < 0.05

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
