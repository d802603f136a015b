"""End-of-round verification on the REAL TPU: service-API probes.

Checks (random weights): exact-duration stereo WAVs, −1 dB and −6 dB peak
normalization, same-seed bit determinism, odd durations, auto LRC + score,
multi-reference timbre, finite outputs.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from acestep_tpu.pipeline.handler import AceStepHandler
from acestep_tpu.service.inference import generate_music
from acestep_tpu.service.params import GenerationConfig, GenerationParams

h = AceStepHandler()
print(h.initialize_service(random_init=True), flush=True)
ok = True


def check(name, cond):
    global ok
    print(f"  [{'OK' if cond else 'FAIL'}] {name}", flush=True)
    ok &= bool(cond)


cfg = GenerationConfig(batch_size=1, use_random_seed=False, audio_format="wav")

r = generate_music(h, None, GenerationParams(caption="piano", duration=31, seed=9,
                                             thinking=False), cfg, save_audio=False)
check("generate success", r.success)
pcm = r.audios[0]["audio"]
check("stereo int16", pcm.shape[0] == 2 and pcm.dtype == np.int16)
check("exact 31 s @48k", pcm.shape[1] == 31 * 48000)
check("peak -1 dB ≈ 29204", abs(int(np.abs(pcm).max()) - 29204) <= 2)
check("non-silent/finite", pcm.std() > 100)

r2 = generate_music(h, None, GenerationParams(caption="piano", duration=31, seed=9,
                                              thinking=False), cfg, save_audio=False)
check("same-seed determinism", np.array_equal(pcm, r2.audios[0]["audio"]))

r3 = generate_music(h, None, GenerationParams(caption="quiet", duration=17, seed=3,
                                              thinking=False, normalization_db=-6.0),
                    cfg, save_audio=False)
p3 = r3.audios[0]["audio"]
check("-6 dB peak ≈ 16422", abs(int(np.abs(p3).max()) - int(0.501187 * 32767)) <= 3)
check("17 s exact", p3.shape[1] == 17 * 48000)

r4 = generate_music(h, None, GenerationParams(caption="ballad", lyrics="hello world\nla la",
                                              duration=12, seed=4, thinking=False,
                                              auto_lrc=True, auto_score=True),
                    cfg, save_audio=False)
a4 = r4.audios[0]
check("auto LRC text", isinstance(a4.get("lrc"), str))
check("lyric score in [0,1]", a4.get("lyrics_score") is not None
      and 0.0 <= a4["lyrics_score"] <= 1.0)

out = h.generate_music(
    captions="multi ref", lyrics="[Instrumental]", audio_duration=10.0,
    batch_size=2, seeds=[1, 2], use_random_seed=False,
    reference_audios=[[np.random.default_rng(0).standard_normal((2, 48000)).astype(np.float32) * 0.1] * 2, None],
    decode_audio=False,
)
check("multi-ref latents finite", np.isfinite(out["latents"]).all())

print("ALL OK" if ok else "FAILURES", flush=True)
sys.exit(0 if ok else 1)
