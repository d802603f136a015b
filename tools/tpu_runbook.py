"""One-shot TPU validation runbook for round 3 (run after the tunnel returns).

Phases (each prints a PHASE line; rerun with PHASE=n to skip ahead):
  1. verify: service API on the real chip — turbo generate (peak/shape
     checks), guidance sweep over one compiled denoise program.
  2. fetch A/B: sequential vs parallel chunk fetch at batch 4x60s.
  3. long shapes: 1x300s with time_costs splits.
  4. pipelined: handler-level async_finish vs sequential, with trace.
Outputs timings as JSON lines to stdout (nohup to a log and poll).
"""

import json
import os
import time

import numpy as np

PHASE = int(os.environ.get("PHASE", 1))
DUR = float(os.environ.get("RB_DUR", 60))
LONG_DUR = float(os.environ.get("RB_LONG_DUR", 300))
BATCH = int(os.environ.get("RB_BATCH", 4))
VDUR = float(os.environ.get("RB_VDUR", 31))


def main():
    from acestep_tpu.models import dit
    from acestep_tpu.pipeline.handler import AceStepHandler
    from acestep_tpu.service.inference import generate_music
    from acestep_tpu.service.params import GenerationConfig, GenerationParams

    h = AceStepHandler()
    h.initialize_service(random_init=True)
    print("PHASE 0: init done", flush=True)

    def gen(batch, dur, **kw):
        t0 = time.time()
        out = h.generate_music(
            captions=["energetic synthwave, driving bass"] * batch,
            lyrics=["[Instrumental]"] * batch,
            audio_duration=dur, batch_size=batch, seeds=list(range(batch)),
            use_random_seed=False, decode_audio=True, return_int16=True, **kw,
        )
        wall = time.time() - t0
        tc = {k: round(v, 3) for k, v in out["time_costs"].items()}
        return out, wall, tc

    if PHASE <= 1:
        r = generate_music(h, None, GenerationParams(caption="piano", duration=VDUR, seed=9),
                           GenerationConfig(batch_size=1, use_random_seed=False),
                           save_audio=False)
        pcm = r.audios[0]["audio"]
        ok = (pcm.shape[0] == 2 and pcm.dtype == np.int16
              and 28000 < np.abs(pcm).max() <= 32767
              and np.isfinite(pcm.astype(np.float64)).all())
        print(f"PHASE 1a verify turbo: ok={ok} shape={pcm.shape} peak={np.abs(pcm).max()}",
              flush=True)

        p = dict(caption="piano", duration=VDUR, seed=9, inference_steps=10)
        r1 = generate_music(h, None, GenerationParams(guidance_scale=3.0, **p),
                            GenerationConfig(batch_size=1, use_random_seed=False), save_audio=False)
        n0 = dit.denoise_scan._cache_size()
        r2 = generate_music(h, None, GenerationParams(guidance_scale=7.5, **p),
                            GenerationConfig(batch_size=1, use_random_seed=False), save_audio=False)
        n1 = dit.denoise_scan._cache_size()
        a = r1.audios[0]["audio"].astype(np.float64)
        b = r2.audios[0]["audio"].astype(np.float64)
        print(f"PHASE 1b guidance sweep: cache {n0}->{n1} (must be equal) "
              f"delta={np.abs(a - b).max()} (must be >0)", flush=True)

    if PHASE <= 2:
        gen(BATCH, DUR)  # compile
        for label, env in (("seq-fetch", "1"), ("par-fetch-4", "4")):
            os.environ["ACESTEP_TPU_PARALLEL_FETCH"] = env
            walls, tcs = [], []
            for _ in range(4):
                time.sleep(1)
                _, wall, tc = gen(BATCH, DUR)
                walls.append(round(wall, 3))
                tcs.append(tc)
            print("PHASE 2 " + json.dumps({
                "mode": label, "walls": walls,
                "decode_transfer": [t.get("vae_decode_transfer_time_cost") for t in tcs],
                "decode_wait": [t.get("vae_decode_compute_wait_time_cost") for t in tcs],
                "diffusion": [t.get("diffusion_time_cost") for t in tcs],
            }), flush=True)
        os.environ["ACESTEP_TPU_PARALLEL_FETCH"] = "1"

    if PHASE <= 3:
        for dur in (LONG_DUR,):
            _, wall, tc = gen(1, dur)  # compile
            walls, tcs = [], []
            for _ in range(3):
                time.sleep(1)
                _, wall, tc = gen(1, dur)
                walls.append(round(wall, 3))
                tcs.append(tc)
            print("PHASE 3 " + json.dumps({
                "dur": dur, "walls": walls,
                "audio_s_per_s": [round(dur / w, 1) for w in walls],
                "tc_last": tcs[-1],
            }), flush=True)

    if PHASE <= 4:
        kwargs = dict(
            captions=["energetic synthwave"] * BATCH, lyrics=["[Instrumental]"] * BATCH,
            audio_duration=DUR, batch_size=BATCH, seeds=list(range(BATCH)),
            use_random_seed=False, decode_audio=True, return_int16=True,
        )
        h.generate_music(**kwargs)  # warm
        t0 = time.time()
        for _ in range(4):
            h.generate_music(**kwargs)
        seq = time.time() - t0
        time.sleep(2)
        t0 = time.time()
        prev = None
        marks = []
        for i in range(4):
            out = h.generate_music(**kwargs, async_finish=True)
            marks.append(("denoise_done", i, round(time.time() - t0, 3)))
            if prev is not None:
                prev["finish"]()
                marks.append(("finish_done", i - 1, round(time.time() - t0, 3)))
            prev = out
        prev["finish"]()
        marks.append(("finish_done", 3, round(time.time() - t0, 3)))
        pipe = time.time() - t0
        print("PHASE 4 " + json.dumps({
            "sequential_s": round(seq, 3), "pipelined_s": round(pipe, 3),
            "ratio": round(seq / pipe, 3), "marks": marks,
            "audio_s_per_s": {"seq": round(4 * BATCH * DUR / seq, 1), "pipe": round(4 * BATCH * DUR / pipe, 1)},
        }), flush=True)

    print("RUNBOOK DONE", flush=True)


if __name__ == "__main__":
    main()
