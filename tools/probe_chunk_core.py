"""Probe decode chunk-core sizes at the long-duration shapes.

Times handler.decode_latents at t=7500 (1x300 s) for several chunk sizes.
Usage: python tools/probe_chunk_core.py [--t 7500] [--batch 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=7500)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cores", default="512,1024,1875")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from acestep_tpu.pipeline.handler import AceStepHandler
    from acestep_tpu.utils import compile_cache

    compile_cache.enable()
    h = AceStepHandler()
    h.initialize_service(random_init=True)

    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, args.t, 64), np.float32) * 0.1)

    for core in (int(c) for c in args.cores.split(",")):
        timings = {}
        out = h.decode_latents(z, chunk_frames=core + 32, return_int16=True,
                               timings=timings)  # compile
        walls = []
        for _ in range(args.reps):
            timings = {}
            t0 = time.time()
            out = h.decode_latents(z, chunk_frames=core + 32, return_int16=True,
                                   timings=timings)
            walls.append(time.time() - t0)
        print(f"core={core}: walls={[round(w,3) for w in walls]} "
              f"compute_wait={timings.get('compute_wait_s',0):.3f} "
              f"transfer={timings.get('transfer_s',0):.3f} shape={out.shape}")


if __name__ == "__main__":
    main()
