"""Autotune probe: band-kernel block_q at the DiT sequence lengths.

Times flash_attention for full + sliding layers at seq {750, 1875, 3750, 7500}
(60/150/300/600 s songs) across block_q candidates, amortizing the tunnel RTT
by looping the kernel inside one jit program.

Usage: python tools/probe_attention_blocks.py [--seqs 1875,3750,7500]
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
from acestep_tpu.ops.pallas_attention import flash_attention


def time_loop(fn, q, k, v, loop, reps=3):
    @jax.jit
    def run(q0, k0, v0):
        def body(_, c):
            o = fn(c, k0, v0)
            return o.astype(c.dtype)
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
    ap.add_argument("--seqs", default="1875,3750,7500")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--blocks", default="128,256,512,1024")
    ap.add_argument("--loop", type=int, default=16)
    args = ap.parse_args()

    cfg = AceStepConfig()
    b = args.batch
    for seq in (int(s) for s in args.seqs.split(",")):
        q = jnp.ones((b, seq, cfg.num_attention_heads, cfg.head_dim), jnp.bfloat16) * 0.01
        k = jnp.ones((b, seq, cfg.num_key_value_heads, cfg.head_dim), jnp.bfloat16) * 0.01
        flops = 4 * b * seq * seq * cfg.num_attention_heads * cfg.head_dim
        line = [f"seq={seq}:"]
        for bq in (int(x) for x in args.blocks.split(",")):
            if bq > seq + 127:
                continue
            t_full = time_loop(
                functools.partial(flash_attention, block_q=bq), q, k, k, args.loop
            )
            line.append(f"full[bq={bq}]={t_full*1e3:.2f}ms({flops/t_full/1e12:.0f}T)")
        t_win = time_loop(
            functools.partial(flash_attention, window=cfg.sliding_window), q, k, k,
            args.loop,
        )
        line.append(f"win128={t_win*1e3:.2f}ms")
        print(" ".join(line))


if __name__ == "__main__":
    main()
