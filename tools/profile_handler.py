"""Time the full handler generate_music at an operating point, with splits.

Usage: python tools/profile_handler.py [--batch 1] [--duration 300] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--duration", type=float, default=300)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-decode", action="store_true")
    args = ap.parse_args()

    from acestep_tpu.pipeline.handler import AceStepHandler
    from acestep_tpu.utils import compile_cache

    compile_cache.enable()
    handler = AceStepHandler()
    handler.initialize_service(random_init=True)

    kwargs = dict(
        captions=["an energetic synthwave track with driving bass"] * args.batch,
        lyrics=["[Instrumental]"] * args.batch,
        audio_duration=args.duration,
        batch_size=args.batch,
        seeds=list(range(args.batch)),
        use_random_seed=False,
        shift=3.0,
        decode_audio=not args.no_decode,
        return_int16=True,
    )
    out = handler.generate_music(**kwargs)  # compile
    for i in range(args.reps):
        t0 = time.time()
        out = handler.generate_music(**kwargs)
        wall = time.time() - t0
        tc = out["time_costs"]
        keys = [
            "encoder_time_cost", "diffusion_time_cost",
            "vae_decode_compute_wait_time_cost", "vae_decode_transfer_time_cost",
            "vae_decode_time_cost", "save_time_cost",
        ]
        print(f"run {i}: wall={wall:.3f}s " +
              " ".join(f"{k.replace('_time_cost','')}={tc[k]:.3f}" for k in keys if k in tc))
        other = wall - sum(tc.get(k, 0.0) for k in keys)
        print(f"       unaccounted={other:.3f}s all_keys={ {k: round(v,3) for k,v in tc.items()} }")


if __name__ == "__main__":
    main()
