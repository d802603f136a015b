import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention, BlockSizes

b, nq, nkv, h = 1, 16, 8, 128
seq = 3840
q = jnp.ones((b, nq, seq, h), jnp.bfloat16) * 0.02
k = jnp.ones((b, nq, seq, h), jnp.bfloat16) * 0.02  # official kernel wants same heads
flops = 4 * b * nq * seq * seq * h

bs = BlockSizes(block_q=768, block_k_major=768, block_k=768, block_b=1)
f = functools.partial(flash_attention, causal=False, sm_scale=h**-0.5, block_sizes=bs)

@jax.jit
def looped(q0, k0, v0):
    def body(_, c):
        return f(c, k0, v0).astype(c.dtype)
    return jax.lax.fori_loop(0, 8, body, q0)

out = looped(q, k, k)
float(jnp.sum(out.astype(jnp.float32)[:1,:1,:1,:8]))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    out = looped(q, k, k)
    float(jnp.sum(out.astype(jnp.float32)[:1,:1,:1,:8]))
    ts.append(time.perf_counter() - t0)
t = min(ts)/8
print(f"official fa: {t*1e3:.2f}ms ({flops/t/1e12:.0f} TFLOPS)")
