"""Decompose one DiT denoise step's cost at a given shape.

Times dit_forward with parts selectively disabled (self-attention skipped,
cross skipped, MLP skipped) by monkeypatching — attribution by differencing,
robust against the tunnel RTT because each variant is a full 24-layer program.

Usage: python tools/probe_dit_parts.py [--t 7500] [--batch 1] [--lenc 128]
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

from acestep_tpu.config import AceStepConfig
from acestep_tpu.models import dit
from acestep_tpu.params import init_acestep_params


def timeit(fn, *args, reps=4, **kw):
    out = fn(*args, **kw)
    float(jnp.sum(out.astype(jnp.float32)[:1, :1, :8]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        float(jnp.sum(out.astype(jnp.float32)[:1, :1, :8]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=7500)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--lenc", type=int, default=128)
    ap.add_argument("--loop", type=int, default=8, help="steps looped inside jit")
    args = ap.parse_args()

    cfg = AceStepConfig()
    params = init_acestep_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    params = dit.stack_acestep_params(params, cfg)
    dec = params["decoder"]

    b, t, le = args.batch, args.t, args.lenc
    xt = jnp.full((b, t, 64), 0.01, jnp.bfloat16)
    ctx = jnp.full((b, t, 128), 0.01, jnp.bfloat16)
    enc = jnp.full((b, le, cfg.hidden_size), 0.01, jnp.bfloat16)
    kvs = jax.jit(dit.precompute_cross_kv, static_argnames=("cfg",))(dec, cfg, enc)
    mask = jnp.ones((b, le), jnp.int32)
    tvec = jnp.full((b,), 0.5, jnp.float32)

    def looped(fwd_fn):
        @jax.jit
        def run(p, x, c, kv, m):
            def body(_, cur):
                return fwd_fn(p, cfg, cur, tvec, tvec, c, kv, encoder_mask=m).astype(cur.dtype)
            return jax.lax.fori_loop(0, args.loop, body, x)
        return run

    orig_attention_block = dit.attention_block
    orig_mlp = dit.mlp_swiglu

    variants = {}

    variants["full"] = dit.dit_forward

    def no_self_attn(p, cfg_, x, **kw):
        if kw.get("kv") is None and kw.get("enc") is None:
            # self-attention: replace with o_proj(q-like) to keep projections
            from acestep_tpu.ops.basic import linear
            q = linear(p["q_proj"], x)
            return linear(p["o_proj"], q)
        return orig_attention_block(p, cfg_, x, **kw)

    def no_cross_attn(p, cfg_, x, **kw):
        if kw.get("kv") is not None:
            from acestep_tpu.ops.basic import linear
            q = linear(p["q_proj"], x)
            return linear(p["o_proj"], q)
        return orig_attention_block(p, cfg_, x, **kw)

    def no_mlp(p, x):
        from acestep_tpu.ops.basic import linear
        # keep only the down-projection-sized cost out; do a cheap identity-ish
        return x

    results = {}
    for name, patch in [
        ("full", None),
        ("self->proj_only", ("attention_block", no_self_attn)),
        ("cross->proj_only", ("attention_block", no_cross_attn)),
        ("mlp->identity", ("mlp_swiglu", no_mlp)),
    ]:
        if patch is not None:
            setattr(dit, patch[0], patch[1])
        try:
            run = looped(dit.dit_forward)
            tmin = timeit(run, dec, xt, ctx, kvs, mask)
        finally:
            setattr(dit, "attention_block", orig_attention_block)
            setattr(dit, "mlp_swiglu", orig_mlp)
        per_step = tmin / args.loop
        results[name] = per_step
        print(f"{name}: {per_step*1e3:.1f} ms/step")

    full = results["full"]
    for name in ("self->proj_only", "cross->proj_only", "mlp->identity"):
        print(f"{name} delta: {(full - results[name])*1e3:.1f} ms")


if __name__ == "__main__":
    main()
