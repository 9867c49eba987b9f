"""Drive the public API end-to-end: Wan2.1-1.3B, 4-step rCM, 480p on TPU.

Random weights (no checkpoints in this environment); observes shapes, finiteness,
and denoising latency — the reference's headline metric (BASELINE.md).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from turbodiffusion_tpu.config import wan_config, GenerationConfig, AttentionConfig
from turbodiffusion_tpu.models.wan import init_wan_params, wan_forward
from turbodiffusion_tpu.pipelines.sampler import rcm_sample, latent_shape

backend = sys.argv[1] if len(sys.argv) > 1 else "dense"

print("backend:", jax.default_backend(), "devices:", jax.devices())
cfg = wan_config("Wan2.1-1.3B", attention=AttentionConfig(backend=backend, sla_topk=0.1))
gen = GenerationConfig()

params = init_wan_params(jax.random.PRNGKey(0), cfg)
n_params = sum(np.prod(l.shape) for l in jax.tree.leaves(params))
print(f"params: {n_params/1e9:.2f}B")

C, T, H, W = latent_shape(gen)
print("latent shape:", (C, T, H, W), "tokens:", T * (H // 2) * (W // 2))

ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 4096), jnp.bfloat16)


@jax.jit
def generate(params, noise, key):
    def denoise(x, t, i):
        tt = jnp.full((1, 1), t * 1000.0, jnp.float32)
        return wan_forward(params, cfg, x, tt, ctx)
    return rcm_sample(denoise, noise, key, num_steps=gen.num_steps,
                      sigma_max=gen.sigma_max)


noise = jax.random.normal(jax.random.PRNGKey(2), (1, C, T, H, W), jnp.float32)
t0 = time.time()
out = generate(params, noise, jax.random.PRNGKey(3))
out.block_until_ready()
print(f"compile+first run: {time.time()-t0:.1f}s")

t0 = time.time()
out = generate(params, noise, jax.random.PRNGKey(4))
out.block_until_ready()
dt = time.time() - t0
print(f"E2E denoise (4 steps, 480p, 81 frames): {dt:.3f}s")
print("output:", out.shape, out.dtype, "finite:", bool(jnp.isfinite(out).all()),
      "std:", float(out.std()))
