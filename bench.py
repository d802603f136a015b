"""Benchmark: DiT denoise (turbo 8-step) + tiled Oobleck VAE decode on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: seconds-of-audio generated per wall-second per chip (batch × duration
/ median pipeline time), the BASELINE.json north-star. Baseline: the
reference's headline "full song < 2 s on A100" (README.md:28,42) → a 180 s
song in 2 s ≈ 90 audio-seconds/s.

Measurement protocol (the dev chip is SHARED; co-tenant load adds one-sided
1-6x slowdowns minutes apart):
- two operating points (batch 2 and 4 at 60 s) unless BENCH_BATCH pins one;
- per point: plain median AND fast-5 median of the reps;
- headline = best point's fast-5 median (sustained quiet-window throughput);
  `value_plain_median` reports the same point's plain median;
- window-noise diagnostics (max/min spread) are emitted so a noisy window is
  visible in the record rather than silently folded into the number;
- quiet-window retry: if a pass's spread is > 1.5 (co-tenant burst), wait
  BENCH_RETRY_WAIT_S (90 s) and re-measure, up to BENCH_QUIET_PASSES (3)
  passes total; each batch point keeps its quietest pass and every pass's
  spread is recorded (`pass_noise_spreads`).
Set BENCH_DP/SP/TP to run the sharded serving path on a mesh.
"""

from __future__ import annotations

import gc
import json
import os
import time

BASELINE_AUDIO_SECONDS_PER_SEC = 90.0  # A100 headline: 180 s song in < 2 s

DURATION_S = float(os.environ.get("BENCH_DURATION_S", 60))
REPS = int(os.environ.get("BENCH_REPS", 8))
BATCHES = (
    [int(os.environ["BENCH_BATCH"])]
    if os.environ.get("BENCH_BATCH")
    else [2, 4]
)


def _measure_point(handler, batch: int, reps: int):
    import jax
    import jax.numpy as jnp

    kwargs = dict(
        captions=["an energetic synthwave track with driving bass"] * batch,
        lyrics=["[Instrumental]"] * batch,
        audio_duration=DURATION_S,
        batch_size=batch,
        seeds=list(range(batch)),
        use_random_seed=False,
        shift=3.0,
        decode_audio=True,
    )
    probe = jax.jit(lambda x: x * 2)
    ones = jnp.ones((8, 128))

    out = handler.generate_music(**kwargs)  # warmup/compile
    times = []
    tc = out["time_costs"]
    for _ in range(reps):
        # Settle between reps: free the previous run's device buffers NOW,
        # drain the device queue, give remote deallocations a moment —
        # otherwise cleanup backlogs the tunnel and inflates the next run.
        del out
        gc.collect()
        float(jnp.sum(probe(ones)))
        time.sleep(1.0)
        t0 = time.time()
        out = handler.generate_music(**kwargs)
        times.append(time.time() - t0)
        tc = out["time_costs"]
        fast = sorted(times)[:5]
        if len(fast) == 5 and fast[-1] <= fast[0] * 1.12:
            break  # quiet-window estimate converged early
    del out
    srt = sorted(times)
    fast5 = srt[: min(5, len(srt))]
    return {
        "batch": batch,
        "fast5_median_wall_s": round(fast5[len(fast5) // 2], 3),
        "median_wall_s": round(srt[len(srt) // 2], 3),
        "min_wall_s": round(srt[0], 3),
        "noise_spread": round(srt[-1] / srt[0], 2),  # >1.5 ⇒ noisy window
        "runs_s": [round(t, 3) for t in times],
        "time_costs": {k: round(v, 3) for k, v in tc.items()},
    }


def _measure_pipelined(handler, batch: int, n_req: int = 4):
    """Sustained serving throughput: request N+1's conditioning + denoise
    dispatch while request N's decode transfers and converts (async_finish).
    Returns audio-s/s over n_req back-to-back requests; best round of 2, with
    up to 2 extra rounds while consecutive rounds disagree by >1.3x (noise)."""
    kwargs = dict(
        captions=["an energetic synthwave track with driving bass"] * batch,
        lyrics=["[Instrumental]"] * batch,
        audio_duration=DURATION_S,
        batch_size=batch,
        seeds=list(range(batch)),
        use_random_seed=False,
        decode_audio=True,
        async_finish=True,
    )
    vals = []
    for round_i in range(4):
        if round_i >= 2 and max(vals[-2:]) / min(vals[-2:]) <= 1.3:
            break  # consecutive rounds agree — window is stable
        gc.collect()
        time.sleep(1.0)
        t0 = time.time()
        prev = None
        for _i in range(n_req):
            out = handler.generate_music(**kwargs)
            if prev is not None:
                prev["finish"]()
            prev = out
        prev["finish"]()
        wall = time.time() - t0
        vals.append(n_req * batch * DURATION_S / wall)
    return round(max(vals), 2)


def main():
    import jax

    from acestep_tpu.pipeline.handler import AceStepHandler

    handler = AceStepHandler()
    handler.initialize_service(random_init=True)
    dp = int(os.environ.get("BENCH_DP", 1))
    sp = int(os.environ.get("BENCH_SP", 1))
    tp = int(os.environ.get("BENCH_TP", 1))
    if dp * sp * tp > 1:
        handler.enable_mesh(dp=dp, sp=sp, tp=tp)

    max_passes = int(os.environ.get("BENCH_QUIET_PASSES", 3))
    retry_wait_s = float(os.environ.get("BENCH_RETRY_WAIT_S", 90))
    points = None
    pass_spreads = []
    for pass_i in range(max_passes):
        if pass_i:
            time.sleep(retry_wait_s)  # let the co-tenant burst pass
        cur = [_measure_point(handler, b, REPS) for b in BATCHES]
        pass_spreads.append([p["noise_spread"] for p in cur])
        points = cur if points is None else [
            c if c["noise_spread"] < p["noise_spread"] else p
            for c, p in zip(cur, points)
        ]
        if all(p["noise_spread"] <= 1.5 for p in points):
            break
    best = max(points, key=lambda p: p["batch"] * DURATION_S / p["fast5_median_wall_s"])
    pipelined = _measure_pipelined(handler, best["batch"])
    value = best["batch"] * DURATION_S / best["fast5_median_wall_s"]
    value_plain = best["batch"] * DURATION_S / best["median_wall_s"]
    result = {
        "metric": "seconds-of-audio/sec/chip (text-enc + DiT 8-step + VAE decode)",
        "value": round(value, 2),
        "unit": "audio_s/s",
        "vs_baseline": round(value / BASELINE_AUDIO_SECONDS_PER_SEC, 3),
        "detail": {
            "value_plain_median": round(value_plain, 2),
            "pipelined_sustained_audio_s_per_s": pipelined,
            "vs_baseline_plain_median": round(value_plain / BASELINE_AUDIO_SECONDS_PER_SEC, 3),
            "duration_s": DURATION_S,
            "headline_point": best["batch"],
            "window_noisy": any(p["noise_spread"] > 1.5 for p in points),
            "quiet_passes": len(pass_spreads),
            "pass_noise_spreads": pass_spreads,
            "points": points,
            "mesh": {"dp": dp, "sp": sp, "tp": tp},
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
