"""Time full vae_decode on TPU: Pallas conv path vs XLA, auto-chunk."""
import os, time, sys
os.makedirs("/root/.jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from turbodiffusion_tpu.models.vae import init_vae_params, vae_decode

vp = init_vae_params(jax.random.PRNGKey(0))
z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 21, 60, 104), jnp.float32)

def timeit(chunk):
    out = vae_decode(vp, z, chunk=chunk)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(vae_decode(vp, z, chunk=chunk))
        ts.append(time.perf_counter() - t0)
    return min(ts), out

mode = os.environ.get("TDX_CONV_PALLAS", "1")
t, out = timeit(None)
print(f"pallas={mode} chunk=auto decode 480p/81f: {t:.3f}s out={out.shape}", flush=True)
