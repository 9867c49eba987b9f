"""Probe: XLA conv MXU efficiency at Wan-VAE decoder stage geometries, plus
a per-op profile of the full vae_decode. Decides whether the decode needs a
Pallas implicit-GEMM conv (VERDICT r2 #2) or better orchestration.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts_dev/probe_conv_mxu.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_BF16 = 197e12   # v5e


def time_fn(fn, *args, n=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe_conv(B, H, W, Cin, Cout, kh=3, kw=3, dtype=jnp.bfloat16):
    x = jnp.ones((B, H, W, Cin), dtype)
    w = jnp.ones((kh, kw, Cin, Cout), dtype)

    @jax.jit
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = time_fn(conv, x, w)
    flops = 2 * B * H * W * kh * kw * Cin * Cout
    eff = flops / dt / PEAK_BF16
    print(f"conv {B}x{H}x{W}x{Cin}->{Cout}: {dt*1e3:7.2f} ms  "
          f"{flops/1e9:8.1f} GF  MXU {eff*100:5.1f}%")
    return dt, eff


def main():
    print(jax.devices())
    # decoder stage geometries at 480p/81f, per scan step (chunk=1 latent fr)
    print("--- per-scan-step stage shapes (chunk=1) ---")
    probe_conv(1, 104, 60, 384, 384)      # stage0 res conv (1 lat frame)
    probe_conv(2, 208, 120, 384, 384)     # stage1 res (2 frames after t-up)
    probe_conv(2, 208, 120, 192, 384)
    probe_conv(4, 416, 240, 192, 192)     # stage2 (4 frames)
    probe_conv(4, 832, 480, 96, 96)       # stage3
    print("--- batched variants (chunk=4 latent frames) ---")
    probe_conv(4, 104, 60, 384, 384)
    probe_conv(8, 208, 120, 384, 384)
    probe_conv(16, 416, 240, 192, 192)
    probe_conv(16, 832, 480, 96, 96)
    print("--- channel padding sensitivity ---")
    probe_conv(4, 832, 480, 128, 128)
    probe_conv(4, 416, 240, 256, 256)

    # full decode per-op profile
    from turbodiffusion_tpu.models.vae import (
        VAEConfig, init_vae_params, vae_decode)
    from turbodiffusion_tpu.utils.profiling import op_time_breakdown, trace

    params = init_vae_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 21, 60, 104),
                          jnp.float32)
    dt = time_fn(lambda p, z: vae_decode(p, z), params, z, n=3)
    print(f"\nvae_decode 480p/81f chunk=1: {dt:.3f} s")
    for chunk in (2, 4):
        try:
            dtc = time_fn(lambda p, z: vae_decode(p, z, chunk=chunk),
                          params, z, n=3)
            print(f"vae_decode chunk={chunk}: {dtc:.3f} s")
        except Exception as e:
            print(f"chunk={chunk} failed: {type(e).__name__}: {e}")

    logdir = "/tmp/tdx_trace_vae"
    with trace(logdir):
        jax.block_until_ready(vae_decode(params, z))
    bd = op_time_breakdown(logdir, top_n=100000)
    import collections, re
    cat = collections.defaultdict(float)
    for name, ms in bd.items():
        if "jit_vae_decode" in name or name.startswith("while."):
            continue
        cat[re.sub(r"[.\d]+$", "", name)] += ms
    print("\nvae_decode per-op-category device ms:")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v:8.1f}  {k}")


if __name__ == "__main__":
    main()
