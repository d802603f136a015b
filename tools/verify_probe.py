"""Verify probe (skill handle 2): service API on the real TPU, with the
fused native bf16→int16 decode-finish kernel counted to prove it engages."""

import numpy as np

from acestep_tpu.pipeline.handler import AceStepHandler
from acestep_tpu.service.inference import generate_music
from acestep_tpu.service.params import GenerationParams
from acestep_tpu.utils import native_audio

calls = {"n": 0, "ok": 0}
_orig = native_audio.bf16_chunk_to_i16


def counted(*a, **kw):
    calls["n"] += 1
    r = _orig(*a, **kw)
    calls["ok"] += int(bool(r))
    return r


native_audio.bf16_chunk_to_i16 = counted
# handler binds the module, not the function, so patching the module attr works
print("native available:", native_audio.available(), flush=True)

h = AceStepHandler()
h.initialize_service(random_init=True)
print("init done", flush=True)

r = generate_music(h, None, GenerationParams(caption="piano", duration=31, seed=9),
                   save_audio=False)
pcm = r.audios[0]["audio"]
peak = int(np.abs(pcm).max())
print("probe1 31s:", pcm.shape, pcm.dtype, "peak", peak,
      "finite", bool(np.isfinite(pcm.astype(np.float64)).all()),
      "native calls", dict(calls), flush=True)
assert pcm.shape[0] == 2 and pcm.dtype == np.int16
assert pcm.shape[1] == 31 * 48000
assert 28000 < peak <= 32767

r2 = generate_music(h, None, GenerationParams(caption="piano", duration=31, seed=9),
                    save_audio=False)
print("determinism:", bool(np.array_equal(pcm, r2.audios[0]["audio"])), flush=True)

# odd duration → tail-trim path; long enough to force multi-chunk decode
r3 = generate_music(h, None, GenerationParams(caption="drums", duration=97, seed=3,
                                              normalization_db=-6.0),
                    save_audio=False)
p3 = r3.audios[0]["audio"]
print("probe3 97s @ -6dB:", p3.shape, "peak", int(np.abs(p3).max()),
      "native calls", dict(calls), flush=True)
assert p3.shape == (2, 97 * 48000)
assert abs(int(np.abs(p3).max()) - round(10 ** (-6 / 20) * 32767)) < 40
assert calls["n"] > 0 and calls["ok"] == calls["n"], calls
print("VERIFY PROBE OK", flush=True)
