"""Per-block VAE decoder profile on the real chip.

Times each decoder block at its in-situ shape (chunk core 512 + overlap) by
looping the block N times inside one jit program (amortizes the ~30 ms tunnel
RTT that makes naive per-op timing useless here).

Usage: python tools/profile_vae.py [--chunk 544] [--batch 1] [--loop 8]
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

from acestep_tpu.config import OobleckConfig
from acestep_tpu.models import vae


def timeit_loop(fn, x, params, loop, reps=3):
    """fn(params, x) looped `loop` times inside jit; returns per-call seconds."""

    @jax.jit
    def run(p, x0):
        def body(_, c):
            return fn(p, c)
        return jax.lax.fori_loop(0, loop, body, x0)

    out = run(params, x)
    float(jnp.sum(out.astype(jnp.float32)[:1, :8, :1]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(params, x)
        float(jnp.sum(out.astype(jnp.float32)[:1, :8, :1]))
        ts.append(time.perf_counter() - t0)
    return min(ts) / loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=544)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--loop", type=int, default=8)
    args = ap.parse_args()

    cfg = OobleckConfig()
    params = vae.init_oobleck_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    d = params["decoder"]

    b, t = args.batch, args.chunk
    z = jnp.zeros((b, t, 64), jnp.bfloat16)

    # whole decode
    dec_fn = jax.jit(lambda p, c: vae.decode(p, cfg, c))
    out = dec_fn(params, z)
    float(jnp.sum(out.astype(jnp.float32)[:1, :8, :1]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = dec_fn(params, z)
        float(jnp.sum(out.astype(jnp.float32)[:1, :8, :1]))
        ts.append(time.perf_counter() - t0)
    t_full = min(ts)
    print(f"full decode chunk ({b},{t},64) -> {out.shape}: {t_full*1e3:.1f}ms")

    # per block: shapes entering each block
    ch = cfg.decoder_channels
    cm = (1,) + tuple(cfg.channel_multiples)
    ups = tuple(reversed(cfg.downsampling_ratios))
    n = len(ups)
    lens = [t]
    for s in ups:
        lens.append(lens[-1] * s)

    total_blocks = 0.0
    for i, stride in enumerate(ups):
        cin, cout = ch * cm[n - i], ch * cm[n - i - 1]
        lin = lens[i]
        x = jnp.zeros((b, lin, cin), jnp.bfloat16)
        blk = d["block"][i]

        f = jax.jit(functools.partial(vae.decoder_block, stride=stride))
        out = f(blk, x)
        float(jnp.sum(out.astype(jnp.float32)[:1, :8, :1]))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(blk, x)
            float(jnp.sum(out.astype(jnp.float32)[:1, :8, :1]))
            ts.append(time.perf_counter() - t0)
        tb = min(ts)
        total_blocks += tb
        macs = (
            2 * stride * cin * cout * lin * stride  # conv_t
            + 3 * 8 * cout * cout * lin * stride    # res units k7+k1
        ) * b
        print(
            f"block{i} stride={stride} {cin}->{cout} L{lin}->{lin*stride}: "
            f"{tb*1e3:.1f}ms  ({2*macs/max(tb,1e-9)/1e12:.1f} TFLOPS eff, RTT-biased)"
        )
    print(f"sum blocks: {total_blocks*1e3:.1f}ms vs full {t_full*1e3:.1f}ms")


if __name__ == "__main__":
    main()
