import jax.numpy as jnp, numpy as np
from acestep_tpu.utils import native_audio
x = jnp.full((2, 800, 2), 0.5, jnp.bfloat16)
a = np.asarray(x)
out = np.zeros((2,2,1600), np.int16)
sc = np.ones(2, np.float32)
ok = native_audio.bf16_chunk_to_i16(a, sc, out, 0, 800)
print("accepted:", ok, "sample:", out[0,0,:3], "expect ~16384")
