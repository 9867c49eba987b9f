"""Sweep full vae_decode on TPU: chunk sizes x norm-fusion, fetch-synced.

Usage: python scripts_dev/drive_vae_decode.py [720p]
Env: TDX_BENCH_VAE_CHUNK
(default off), TDX_DECODE_CHUNKS (comma list, default "4,5,10,20").
"""
import os
import sys

os.makedirs("/root/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from turbodiffusion_tpu.models.vae import init_vae_params, vae_decode
from turbodiffusion_tpu.utils.timing import measure_best

res = sys.argv[1] if len(sys.argv) > 1 else "480p"
h, w = (90, 160) if res == "720p" else (60, 104)

vp = init_vae_params(jax.random.PRNGKey(0))
z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 21, h, w), jnp.float32)

chunks = [int(c) for c in
          os.environ.get("TDX_DECODE_CHUNKS", "4,5,10,20").split(",")]
fused = os.environ.get("TDX_VAE_FUSED_NORM", "0")
for chunk in chunks:
    if 20 % chunk != 0:
        continue
    try:
        dt = measure_best(lambda p, z: vae_decode(p, z, chunk=chunk),
                          vp, z, n=3)
        print(f"{res} decode fused_norm={fused} chunk={chunk}: {dt:.3f}s",
              flush=True)
    except Exception as e:                                 # noqa: BLE001
        print(f"{res} decode chunk={chunk}: FAILED "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)
