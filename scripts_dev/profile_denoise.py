"""Trace the full 4-step denoise (the bench.py path) and print the per-op
device-time breakdown. Run on TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts_dev/profile_denoise.py
"""

import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from turbodiffusion_tpu.config import (
        AttentionConfig, GenerationConfig, wan_config)
    from turbodiffusion_tpu.models.wan import init_wan_params, wan_forward
    from turbodiffusion_tpu.pipelines.sampler import latent_shape, rcm_sample
    from turbodiffusion_tpu.utils.profiling import op_time_breakdown, trace

    model = os.environ.get("TDX_PROFILE_MODEL", "Wan2.1-1.3B")
    fuse_qkv = model != "Wan2.1-14B"     # bench.py's honest 14B config
    cfg = wan_config(
        model,
        attention=AttentionConfig(backend="sagesla", sla_topk=0.1,
                                  block_q=int(os.environ.get("TDX_PROFILE_BQ", 512)),
                                  block_k=256),
        quant_linear=True,
    )
    gen = GenerationConfig()
    if os.environ.get("TDX_PROFILE_720P", "0") == "1":
        gen = GenerationConfig(resolution="720p")

    from turbodiffusion_tpu.ops.quant import quantize_wan_blocks
    if model == "Wan2.1-14B":
        # device-side shape-faithful fill (bench.py:_denoise_bench)
        def build():
            p = init_wan_params(jax.random.PRNGKey(0), cfg)
            p["blocks"] = quantize_wan_blocks(p["blocks"], mode="postscale",
                                              fuse_qkv=fuse_qkv)
            return p

        shapes = jax.eval_shape(build)

        def fill(s):
            if s.dtype == jnp.int8:
                return jnp.zeros(s.shape, s.dtype)
            if s.dtype == jnp.float32 and s.ndim <= 1:
                return jnp.ones(s.shape, s.dtype)
            return jnp.full(s.shape, 0.01, s.dtype)

        params = jax.tree.map(fill, shapes)
    else:
        params = init_wan_params(jax.random.PRNGKey(0), cfg)
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
    generate(params, noise, jax.random.PRNGKey(3)).block_until_ready()

    t0 = time.perf_counter()
    generate(params, noise, jax.random.PRNGKey(4)).block_until_ready()
    total = time.perf_counter() - t0
    print(f"e2e denoise: {total:.3f} s")

    logdir = "/tmp/tdx_trace_denoise"
    with trace(logdir):
        generate(params, noise, jax.random.PRNGKey(5)).block_until_ready()

    breakdown = op_time_breakdown(logdir, top_n=400)
    tot_dev = sum(breakdown.values())
    print(f"\ntop ops (device ms, sum of top-40 = {tot_dev:.0f} ms):")
    for name, ms in breakdown.items():
        print(f"  {ms:9.1f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
