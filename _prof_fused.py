import time, os, jax, jax.numpy as jnp, numpy as np
from acestep_tpu.models import vae
from acestep_tpu.ops.pallas_vae import res_units_pallas
from acestep_tpu.config import OobleckConfig

cfg = OobleckConfig()
params = vae.init_oobleck_params(jax.random.PRNGKey(0), cfg, jnp.float32)
blk = params["decoder"]["block"][3]  # stage3: C=128 @ 1.44M
units = (blk["res_unit1"], blk["res_unit2"], blk["res_unit3"])

B, L, C = 2, 1440000, 128
x = jnp.asarray(np.random.default_rng(0).standard_normal((B, L, C)), jnp.bfloat16)

def chain(f, n=6):
    def loop(x):
        for _ in range(n):
            x = f(x)
        return x
    jl = jax.jit(loop)
    r = jl(x); jax.block_until_ready(r)
    t0 = time.time(); r = jl(x)
    float(jnp.sum(r[:, :8, :8].astype(jnp.float32)))
    return (time.time() - t0) / n

def seq(x):
    for u, d in zip(units, (1, 3, 9)):
        x = vae.residual_unit(u, x, d)
    return x

t_seq = chain(seq)
t_fused = chain(lambda x: res_units_pallas(x, units))
print(f"stage3 res-chain: xla {t_seq*1e3:.1f}ms fused {t_fused*1e3:.1f}ms", flush=True)

for tile in (2048,):
    t = chain(lambda x: res_units_pallas(x, units, tile=tile))
    print(f"fused tile={tile}: {t*1e3:.1f}ms", flush=True)
