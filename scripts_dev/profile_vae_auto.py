"""Per-op profile of vae_decode at auto chunk.
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts_dev/profile_vae_auto.py
"""
import os
os.makedirs("/root/.jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from turbodiffusion_tpu.models.vae import init_vae_params, vae_decode
from turbodiffusion_tpu.utils.profiling import op_time_breakdown, trace
from turbodiffusion_tpu.utils.timing import fetch_sync, measure_best
import collections, re

params = init_vae_params(jax.random.PRNGKey(0))
z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 21, 60, 104), jnp.float32)
fetch_sync(vae_decode(params, z))
dt = measure_best(lambda p, z: vae_decode(p, z), params, z, n=3)
print(f"vae_decode 480p/81f auto-chunk: {dt:.3f} s  "
      )
logdir = "/tmp/tdx_trace_vae_auto"
with trace(logdir):
    fetch_sync(vae_decode(params, z))
bd = op_time_breakdown(logdir, top_n=100000)
cat = collections.defaultdict(float)
for name, ms in bd.items():
    if "jit__vae_decode" in name or "jit_vae_decode" in name or name.startswith("while."):
        continue
    cat[re.sub(r"[.\d]+$", "", name)] += ms
print("per-op-category device ms:")
tot = 0.0
for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:30]:
    print(f"  {v:8.1f}  {k}")
    tot += v
print(f"  total shown: {tot:.1f} ms")
