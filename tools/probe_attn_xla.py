"""Compare Pallas band kernel vs XLA einsum attention at long DiT shapes."""

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
from acestep_tpu.ops.attention import attention_xla, make_attention_bias
from acestep_tpu.ops.pallas_attention import flash_attention


def time_loop(fn, q, k, v, loop=6, reps=3):
    @jax.jit
    def run(q0, k0, v0):
        def body(_, c):
            return fn(c, k0, v0).astype(c.dtype)
        return jax.lax.fori_loop(0, loop, body, q0)

    out = run(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)[:1, :1, :1, :8]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(q, k, v)
        float(jnp.sum(out.astype(jnp.float32)[:1, :1, :1, :8]))
        ts.append(time.perf_counter() - t0)
    return min(ts) / loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=3750)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--loop", type=int, default=6)
    args = ap.parse_args()

    cfg = AceStepConfig()
    b, seq = args.batch, args.seq
    q = jnp.ones((b, seq, cfg.num_attention_heads, cfg.head_dim), jnp.bfloat16) * 0.01
    k = jnp.ones((b, seq, cfg.num_key_value_heads, cfg.head_dim), jnp.bfloat16) * 0.01

    flops = 4 * b * seq * seq * cfg.num_attention_heads * cfg.head_dim

    t_p = time_loop(functools.partial(flash_attention), q, k, k, args.loop)
    print(f"pallas full: {t_p*1e3:.2f}ms ({flops/t_p/1e12:.0f} TFLOPS)")

    t_x = time_loop(functools.partial(attention_xla), q, k, k, args.loop)
    print(f"xla full:    {t_x*1e3:.2f}ms ({flops/t_x/1e12:.0f} TFLOPS)")

    win = cfg.sliding_window
    t_pw = time_loop(functools.partial(flash_attention, window=win), q, k, k, args.loop)
    print(f"pallas win:  {t_pw*1e3:.2f}ms")

    mask = make_attention_bias(seq, seq, window=win)
    t_xw = time_loop(
        lambda qq, kk, vv: attention_xla(qq, kk, vv, mask=mask), q, k, k, args.loop
    )
    print(f"xla win:     {t_xw*1e3:.2f}ms")


if __name__ == "__main__":
    main()
