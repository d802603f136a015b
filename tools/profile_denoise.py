"""Break down the denoise cost at the bench operating points on the real chip.

Times, per shape: full denoise_scan (8 steps), one dit_forward, the Pallas
attention kernel alone (full + sliding), and the MLP+proj matmul bundle —
so regressions can be attributed to a specific op rather than a wall number.

Usage: python tools/profile_denoise.py [--shapes b,T[;b,T...]] [--reps N]
T is the LATENT length (DiT seq = T // patch_size).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import AceStepConfig
from acestep_tpu.models import dit
from acestep_tpu.models.dit import denoise_scan, dit_forward
from acestep_tpu.params import init_acestep_params


def _sync(out):
    # block_until_ready doesn't wait on the tunneled backend; force a scalar
    # readback of the first leaf to synchronize.
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="1,7500;2,1500;4,1500;1,15000")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    cfg = AceStepConfig()
    key = jax.random.PRNGKey(0)
    params = init_acestep_params(key, cfg, jnp.bfloat16)
    params = dit.stack_acestep_params(params, cfg)
    dec = params["decoder"]

    l_enc = 2048 + 1 + 256  # lyric + timbre + text pack at the bench shapes

    for shape in args.shapes.split(";"):
        b, t = (int(x) for x in shape.split(","))
        seq = t // cfg.patch_size
        xt = jnp.zeros((b, t, 64), jnp.bfloat16)
        ctx = jnp.zeros((b, t, 128), jnp.bfloat16)
        enc = jnp.zeros((b, l_enc, cfg.hidden_size), jnp.bfloat16)
        kvs = jax.jit(dit.precompute_cross_kv, static_argnames=("cfg",))(dec, cfg, enc)
        enc_mask = jnp.ones((b, l_enc), jnp.int32)
        sched = jnp.linspace(1.0, 0.1, args.steps)
        nxt = jnp.concatenate([sched[1:], jnp.zeros((1,))])

        t_scan = timeit(
            denoise_scan, dec, cfg, xt, sched, nxt, ctx, kvs, enc_mask, None,
            reps=args.reps,
        )

        fwd = jax.jit(functools.partial(dit_forward, cfg=cfg), static_argnames=())
        tvec = jnp.full((b,), 0.5, jnp.float32)
        t_fwd = timeit(
            fwd, dec, xt=xt, timestep=tvec, timestep_r=tvec,
            context_latents=ctx, cross_kvs=kvs, encoder_mask=enc_mask,
            reps=args.reps,
        )

        # attention alone: full + sliding at this seq
        from acestep_tpu.ops.pallas_attention import flash_attention
        q = jnp.zeros((b, seq, cfg.num_attention_heads, cfg.head_dim), jnp.bfloat16)
        k = jnp.zeros((b, seq, cfg.num_key_value_heads, cfg.head_dim), jnp.bfloat16)
        t_att_full = timeit(flash_attention, q, k, k, reps=args.reps)
        t_att_win = timeit(
            functools.partial(flash_attention, window=cfg.sliding_window),
            q, k, k, reps=args.reps,
        )
        # cross-attention at this seq (kv len = l_enc)
        kc = jnp.zeros((b, l_enc, cfg.num_key_value_heads, cfg.head_dim), jnp.bfloat16)
        mask = jnp.ones((b, l_enc), jnp.int32)
        t_att_cross = timeit(flash_attention, q, kc, kc, mask, reps=args.reps)

        # matmul bundle: qkv+o + swiglu at this token count (the linear floor)
        w_in = jnp.zeros((cfg.hidden_size, cfg.hidden_size * 2), jnp.bfloat16)
        w_gate = jnp.zeros((cfg.hidden_size, cfg.intermediate_size * 2), jnp.bfloat16)
        w_down = jnp.zeros((cfg.intermediate_size, cfg.hidden_size), jnp.bfloat16)
        x2 = jnp.zeros((b * seq, cfg.hidden_size), jnp.bfloat16)

        @jax.jit
        def linear_floor(x, wi, wg, wd):
            def body(_, h):
                a = h @ wi
                h2 = a[:, : cfg.hidden_size] * jax.nn.silu(a[:, cfg.hidden_size :])
                g = h2 @ wg
                u = g[:, : cfg.intermediate_size] * jax.nn.silu(g[:, cfg.intermediate_size :])
                return (u @ wd).astype(h.dtype)
            return jax.lax.fori_loop(0, 24, body, x)

        t_lin = timeit(linear_floor, x2, w_in, w_gate, w_down, reps=args.reps)

        # FLOP estimates
        n_tok = b * seq
        lin_params = 24 * (
            cfg.hidden_size * cfg.hidden_size * 2  # q+o
            + cfg.hidden_size * cfg.num_key_value_heads * cfg.head_dim * 2  # k+v self
            + cfg.hidden_size * cfg.hidden_size  # cross q
            + cfg.hidden_size * cfg.hidden_size  # cross o
            + 3 * cfg.hidden_size * cfg.intermediate_size
        )
        flops_lin = 2 * lin_params * n_tok
        flops_att = 12 * 4 * b * seq * seq * cfg.hidden_size  # full layers
        flops_att += 12 * 4 * b * seq * min(2 * cfg.sliding_window, seq) * cfg.hidden_size
        flops_cross = 24 * 4 * b * seq * l_enc * cfg.hidden_size
        step_flops = flops_lin + flops_att + flops_cross
        mfu = args.steps * step_flops / t_scan / 197e12

        print(
            f"b={b} T={t} seq={seq}: scan({args.steps})={t_scan*1e3:.0f}ms "
            f"fwd1={t_fwd*1e3:.1f}ms att_full={t_att_full*1e3:.2f}ms "
            f"att_win={t_att_win*1e3:.2f}ms att_cross={t_att_cross*1e3:.2f}ms "
            f"lin24={t_lin*1e3:.1f}ms | step_flops={step_flops/1e12:.2f}T "
            f"MFU={mfu*100:.1f}%"
        )
        # attribution: 8*(12*full+12*win from per-layer share) vs measured
        att_total = args.steps * 12 * (t_att_full + t_att_win)
        print(
            f"    attribution x{args.steps}steps: lin={args.steps*t_lin*1e3:.0f}ms "
            f"self_att={att_total*1e3:.0f}ms cross={args.steps*24*t_att_cross*1e3:.0f}ms "
            f"sum={(args.steps*(t_lin+24*t_att_cross)+att_total)*1e3:.0f}ms "
            f"vs scan {t_scan*1e3:.0f}ms"
        )


if __name__ == "__main__":
    main()
