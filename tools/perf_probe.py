"""Split the generate wall into denoise vs decode+transfer through the tunnel.
Run from repo root on the TPU: python tools/perf_probe.py
"""
import gc
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from acestep_tpu.pipeline.handler import AceStepHandler

B, DUR, REPS = 2, 60.0, 7

h = AceStepHandler()
print(h.initialize_service(random_init=True), flush=True)

probe = jax.jit(lambda x: x * 2)
ones = jnp.ones((8, 128))

def settle():
    gc.collect()
    float(jnp.sum(probe(ones)))
    time.sleep(1.0)

def timeit(label, fn):
    fn()  # warmup
    ts = []
    for _ in range(REPS):
        settle()
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts = sorted(ts)
    print(f"{label}: min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} all={[round(t,3) for t in ts]}", flush=True)
    return ts[0]

kwargs = dict(captions=["perf probe"] * B, lyrics=["[Instrumental]"] * B,
              audio_duration=DUR, batch_size=B, seeds=list(range(B)),
              use_random_seed=False)

full = timeit("full (denoise+decode+transfer)", lambda: h.generate_music(**kwargs))
lat = timeit("latents only (denoise+0.7MB readback)",
             lambda: h.generate_music(**kwargs, decode_audio=False))

out = h.generate_music(**kwargs, decode_audio=False)
z = jnp.asarray(out["latents"], jnp.bfloat16)

def decode_only():
    import numpy as np
    core = h._decode_chunk_core(z.shape[1], B)
    n = -(-z.shape[1] // core)
    job = h._decode_latents_dispatch(z, core, n, 16)
    h._decode_latents_finish(*job, z.shape[1], normalize_db=None, return_int16=True)

timeit("decode+transfer only", decode_only)

# transfer-only: ship the same waveform bytes without compute
wav_dev = jnp.zeros((B, int(DUR * 48000), 2), jnp.bfloat16) + 0.1
def transfer_only():
    import numpy as np
    np.asarray(wav_dev)
timeit("transfer only (23MB)", transfer_only)

# readback RTT count probe: a single tiny sync
tiny = jnp.ones((8,))
timeit("tiny sync (1 RTT)", lambda: float(jnp.sum(tiny)))
