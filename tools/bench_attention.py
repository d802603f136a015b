"""Microbench: pallas band attention at the long-duration DiT shapes.

Usage: python tools/bench_attention.py [L ...]
Times the full-attention and sliding-window legs at the production DiT dims
(16 q heads / 8 kv heads / head_dim 128) for each latent length, across
block_q choices, and prints achieved TFLOP/s + ms so tile-choice regressions
at the t=7500/15000 buckets (VERDICT r3 next #2) are measurable in isolation.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from acestep_tpu.ops.pallas_attention import flash_attention


def bench_one(l, nq=16, nkv=8, h=128, b=1, window=None, block_q=256, reps=5):
    kq = jax.random.PRNGKey(0)
    q = jax.random.normal(kq, (b, l, nq, h), jnp.bfloat16)
    k = jax.random.normal(kq, (b, l, nkv, h), jnp.bfloat16)
    v = jax.random.normal(kq, (b, l, nkv, h), jnp.bfloat16)

    import functools

    # N kernel invocations inside ONE jitted program, forced through a data
    # dependence, ending in a scalar — so one readback times N real runs and
    # the tunnel RTT amortizes away (block_until_ready alone does not sync
    # through the remote-execution relay).
    n_inner = 16

    @functools.partial(jax.jit, static_argnames=())
    def run(q, k, v):
        def body(_, acc):
            # 1 + acc*1e-20 is a REAL data dependence XLA cannot fold away
            # (acc is dynamic), so the loop cannot be hoisted to one kernel.
            qq = (q.astype(jnp.float32) * (1.0 + acc * 1e-20)).astype(q.dtype)
            o = flash_attention(qq, k, v, window=window, block_q=block_q)
            return jnp.float32(o[0, 0, 0, 0])

        acc = jax.lax.fori_loop(0, n_inner, body, jnp.float32(0))
        return acc

    scale_q = jax.jit(lambda q, s: (q.astype(jnp.float32) * s).astype(q.dtype))
    float(run(q, k, v))  # compile + warm
    times = []
    for i in range(reps):
        # fresh input every rep — identical (program, inputs) pairs can be
        # served from a relay-side cache without re-executing
        q = scale_q(q, jnp.float32(1.0 + 1e-4))
        t0 = time.perf_counter()
        float(run(q, k, v))
        times.append(time.perf_counter() - t0)
    # RTT estimate from a non-constant readback (scalar derived from q)
    rtts = []
    for _ in range(3):
        q = scale_q(q, jnp.float32(1.0 + 1e-4))
        s0 = time.perf_counter()
        float(q[0, 0, 0, 0])
        rtts.append(time.perf_counter() - s0)
    rtt = min(rtts)
    dt = max((min(times) - rtt) / n_inner, 1e-9)
    if window is None:
        flops = 4.0 * b * l * l * h * nq
    else:
        band = min(l, 2 * window + block_q)
        flops = 4.0 * b * l * band * h * nq
    return dt, flops / dt / 1e12


def main():
    from acestep_tpu.utils import compile_cache

    compile_cache.enable()
    ls = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or [7500]
    kinds = sys.argv[0] and [a for a in sys.argv[1:] if a.startswith("-")]
    bqs = (256, 512, 1024)
    print(f"device: {jax.devices()[0]}", flush=True)
    for l in ls:
        if "-slide-only" not in kinds:
            for bq in bqs:
                dt, tf = bench_one(l, block_q=bq)
                print(f"full   L={l:6d} block_q={bq:5d}: {dt*1e3:8.2f} ms  {tf:6.1f} TF/s",
                      flush=True)
        if "-full-only" not in kinds:
            for bq in bqs:
                dt, tf = bench_one(l, window=128, block_q=bq)
                print(f"slide  L={l:6d} block_q={bq:5d}: {dt*1e3:8.2f} ms  {tf:6.1f} TF/s",
                      flush=True)


if __name__ == "__main__":
    main()
