"""Isolate the attention kernel's per-stage cost with stripped variants.

Variants at (b=1, seq, nq=16, nkv=8, h=128), bq=256:
  dots    — QK^T then P@V with P = scaled scores (no softmax)
  +max    — adds the row max + subtract
  +exp    — adds exp (transcendental)
  +expf   — adds the polynomial exp2 instead
  full    — max + exp + sum + div (the real kernel math)

Usage: python tools/probe_kernel_parts.py [--seq 3750] [--bq 256] [--loop 8]
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
from jax.experimental import pallas as pl

_EXP2_COEF = (9.99999769e-01, 6.93156779e-01, 2.40131684e-01,
              5.58765685e-02, 8.94057778e-03, 1.89437864e-03)


def _exp_softmax_fast(x):
    """exp(x) for x<=0 via exponent-bit assembly + degree-5 poly (probe-only:
    measured neutral vs jnp.exp — the kernel is dot-bound, see the perf note
    in ops/pallas_attention.py)."""
    y = jnp.maximum(x, -87.0) * 1.4426950408889634
    yi = jnp.floor(y)
    yf = y - yi
    p = jnp.float32(_EXP2_COEF[-1])
    for c in _EXP2_COEF[-2::-1]:
        p = p * yf + jnp.float32(c)
    two_yi = jax.lax.bitcast_convert_type(
        (yi.astype(jnp.int32) + 127) << 23, jnp.float32
    )
    return p * two_yi


def make_kernel(mode: str, bq: int, lk: int, kt: bool = False):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0, 0]
        kblk = k_ref[0, 0]
        vblk = v_ref[0, 0]
        if kt:  # K stored pre-transposed (h, lk): plain (M,K)@(K,N)
            s = jax.lax.dot_general(
                q, kblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * 0.08838834764831845
        else:
            s = jax.lax.dot_general(
                q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * 0.08838834764831845
        if mode == "dots":
            p = s * 1e-3
        elif mode == "+max":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = s - m
        elif mode == "+exp":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        elif mode == "+expf":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = _exp_softmax_fast(s - m)
        elif mode == "full":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = p / jnp.maximum(l, 1e-30)
        elif mode == "fullf":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = _exp_softmax_fast(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = p / jnp.maximum(l, 1e-30)
        acc = jax.lax.dot_general(
            p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = acc.astype(o_ref.dtype)

    return kernel


def run_mode(mode, q, k, v, bq, loop, reps=3):
    kt = mode.endswith("T")
    mode_base = mode[:-1] if kt else mode
    b, nq, lq, h = q.shape
    lk = v.shape[2]
    grid = (b, nq, lq // bq)
    groups = nq // v.shape[1]
    if kt:
        k = jnp.swapaxes(k, 2, 3)  # (b, nkv, h, lk)
        k_spec = pl.BlockSpec((1, 1, h, lk), lambda bi, hi, qi, g=groups: (bi, hi // g, 0, 0))
    else:
        k_spec = pl.BlockSpec((1, 1, lk, h), lambda bi, hi, qi, g=groups: (bi, hi // g, 0, 0))

    f = pl.pallas_call(
        make_kernel(mode_base, bq, lk, kt=kt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, h), lambda bi, hi, qi: (bi, hi, qi, 0)),
            k_spec,
            pl.BlockSpec((1, 1, lk, h), lambda bi, hi, qi, g=groups: (bi, hi // g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, h), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq, lq, h), q.dtype),
    )

    @jax.jit
    def looped(q0, k0, v0):
        def body(_, c):
            return f(c, k0, v0).astype(c.dtype)
        return jax.lax.fori_loop(0, loop, body, q0)

    out = looped(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)[:1, :1, :1, :8]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = looped(q, k, v)
        float(jnp.sum(out.astype(jnp.float32)[:1, :1, :1, :8]))
        ts.append(time.perf_counter() - t0)
    return min(ts) / loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=3840)
    ap.add_argument("--bq", type=int, default=256)
    ap.add_argument("--loop", type=int, default=8)
    ap.add_argument("--modes", default="dots,+max,+exp,+expf,full,fullf")
    args = ap.parse_args()

    b, nq, nkv, h = 1, 16, 8, 128
    lq = lk = (args.seq + 127) // 128 * 128
    q = jnp.ones((b, nq, lq, h), jnp.bfloat16) * 0.02
    k = jnp.ones((b, nkv, lk, h), jnp.bfloat16) * 0.02
    flops = 4 * b * nq * lq * lk * h

    for mode in args.modes.split(","):
        t = run_mode(mode, q, k, k, args.bq, args.loop)
        print(f"{mode}: {t*1e3:.2f}ms ({flops/t/1e12:.0f} TFLOPS)")


if __name__ == "__main__":
    main()
