import os
os.makedirs("/root/.jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from turbodiffusion_tpu.models.vae import init_vae_params, vae_decode
from turbodiffusion_tpu.utils.profiling import op_time_breakdown, trace

params = init_vae_params(jax.random.PRNGKey(0))
z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 21, 60, 104), jnp.float32)
jax.block_until_ready(vae_decode(params, z))
logdir = "/tmp/tdx_trace_vae_raw"
with trace(logdir):
    jax.block_until_ready(vae_decode(params, z))
bd = op_time_breakdown(logdir, top_n=100000)
items = [(v, k) for k, v in bd.items()
         if not (k == "while" or "jit__vae_decode" in k or "jit_vae_decode" in k)]
items.sort(reverse=True)
tot = sum(v for v, _ in items)
print(f"total device ms (ex-while wrapper): {tot:.1f}")
for v, k in items[:40]:
    print(f"  {v:8.1f}  {k}")
