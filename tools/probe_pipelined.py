"""Measure pipelined vs sequential serving at one point (bench's pipelined leg).

Usage: python tools/probe_pipelined.py [--batch 2] [--duration 60] [--rounds 3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--duration", type=float, default=60)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import bench
    bench.DURATION_S = args.duration

    from acestep_tpu.pipeline.handler import AceStepHandler
    from acestep_tpu.utils import compile_cache

    compile_cache.enable()
    h = AceStepHandler()
    h.initialize_service(random_init=True)
    # warm both paths
    h.generate_music(**bench._gen_kwargs(args.batch))
    out = h.generate_music(**dict(bench._gen_kwargs(args.batch), async_finish=True))
    out["finish"]()

    res = bench._measure_pipelined(h, args.batch)
    import json
    res.pop("trace", None)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
