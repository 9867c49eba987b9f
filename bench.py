"""Benchmark: Wan2.1-1.3B 4-step rCM denoising at 480p/81 frames on TPU.

Prints one JSON line. Metric matches the reference's headline E2E number
(diffusion denoising only, excluding text encoding and VAE decode —
reference README.md:207; BASELINE.md: 1.9s on RTX 5090 with SageSLA topk 0.1).

vs_baseline = ours_seconds / reference_seconds (1.0 = parity, lower = faster).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: repeat runs skip the multi-minute XLA compile
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_S = 1.9  # Wan2.1-1.3B 480p E2E on RTX 5090 (BASELINE.md)


def main():
    from turbodiffusion_tpu.config import (
        AttentionConfig, GenerationConfig, wan_config)
    from turbodiffusion_tpu.models.wan import init_wan_params, wan_forward
    from turbodiffusion_tpu.pipelines.sampler import latent_shape, rcm_sample

    quant = os.environ.get("TDX_BENCH_QUANT", "1") == "1"
    cfg = wan_config(
        "Wan2.1-1.3B",
        attention=AttentionConfig(backend="sagesla", sla_topk=0.1),
        quant_linear=quant,
    )
    gen = GenerationConfig()

    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    if quant:
        from turbodiffusion_tpu.ops.quant import quantize_wan_blocks
        params["blocks"] = quantize_wan_blocks(params["blocks"],
                                               mode="postscale")
    C, T, H, W = latent_shape(gen)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 4096),
                            jnp.bfloat16)

    @jax.jit
    def generate(params, noise, key):
        def denoise(x, t, i):
            tt = jnp.full((1, 1), t * 1000.0, jnp.float32)
            return wan_forward(params, cfg, x, tt, ctx)
        return rcm_sample(denoise, noise, key, num_steps=gen.num_steps,
                          sigma_max=gen.sigma_max)

    noise = jax.random.normal(jax.random.PRNGKey(2), (1, C, T, H, W),
                              jnp.float32)
    # warmup / compile
    generate(params, noise, jax.random.PRNGKey(3)).block_until_ready()

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        generate(params, noise, jax.random.PRNGKey(4 + i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)

    print(json.dumps({
        "metric": "wan2.1_1.3b_480p_4step_denoise",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(best / BASELINE_S, 4),
    }))


if __name__ == "__main__":
    main()
