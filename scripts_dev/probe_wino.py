"""Winograd kernel vs XLA direct conv at decoder stage geometries (TPU).
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts_dev/probe_wino.py

All correctness math is reduced ON DEVICE (the axon tunnel moves ~MB/s;
device_get of a full 480p activation takes minutes).
"""
import os
os.makedirs("/root/.jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from turbodiffusion_tpu.ops.winograd import wino_conv, wino_conv_q, to_quad
from turbodiffusion_tpu.utils.timing import measure_best

PEAK = 197e12


def stage(T, H, W, Cin, Cout, kt=3, iters=4, pre="none"):
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k[0], (1, T + kt - 1, H, W, Cin), jnp.float32
                          ).astype(jnp.bfloat16)
    w = (jax.random.normal(k[1], (kt, 3, 3, Cin, Cout), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)
    b = jnp.zeros((Cout,), jnp.bfloat16)
    g = jnp.ones((Cin,), jnp.bfloat16) if pre == "norm_silu" else None
    flops = 2 * T * H * W * 9 * kt * Cin * Cout

    # quad-resident timing (the VAE chain keeps quads end-to-end)
    xq = to_quad(x)
    f = jax.jit(lambda xq, w, b: wino_conv_q(xq, w, b, gamma=g, pre=pre))
    dt = measure_best(f, xq, w, b, n=3, iters=iters)
    # correctness: device-side reduction, scalar fetch
    from turbodiffusion_tpu.ops.conv_pallas import conv3x3_fused_ref

    @jax.jit
    def relerr(x, w, b):
        got = wino_conv(x, w, b, gamma=g, pre=pre).astype(jnp.float32)
        want = conv3x3_fused_ref(x, w, b, gamma=g, pre=pre
                                 ).astype(jnp.float32)
        return (jnp.max(jnp.abs(got - want)),
                jnp.maximum(jnp.max(jnp.abs(want)), 1e-6))

    num, den = jax.device_get(relerr(x, w, b))
    err = float(num) / float(den)
    print(f"T={T:2d} {H:3d}x{W:3d} C{Cin:3d}->{Cout:3d} kt={kt} pre={pre}: "
          f"{dt*1e3:7.2f} ms  MXU-direct {flops/dt/PEAK*100:5.1f}%  "
          f"wino-GEMM {flops/2.25/dt/PEAK*100:5.1f}%  relerr {err:.4f}")


def sweep(T, H, W, Cin, Cout, kt, tile_list, iters=4):
    """A/B tile overrides (the _pick_tiles model is conservative; find the
    real Mosaic stack ceiling empirically)."""
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k[0], (1, T + kt - 1, H, W, Cin), jnp.float32
                          ).astype(jnp.bfloat16)
    w = (jax.random.normal(k[1], (kt, 3, 3, Cin, Cout), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)
    b = jnp.zeros((Cout,), jnp.bfloat16)
    xq = to_quad(x)
    flops = 2 * T * H * W * 9 * kt * Cin * Cout
    for tiles in tile_list:
        try:
            f = jax.jit(lambda xq, w, b, t=tiles: wino_conv_q(xq, w, b,
                                                              tiles=t))
            dt = measure_best(f, xq, w, b, n=3, iters=iters)
            print(f"  tiles={tiles}: {dt*1e3:7.2f} ms  "
                  f"wino-GEMM {flops/2.25/dt/PEAK*100:5.1f}%", flush=True)
        except Exception as e:                            # noqa: BLE001
            print(f"  tiles={tiles}: FAIL {str(e)[:120]}", flush=True)


print(jax.devices())
stage(16, 480, 832, 96, 96, kt=3, pre="norm_silu")
stage(16, 480, 832, 96, 96, kt=3)
stage(16, 240, 416, 192, 192, kt=3, pre="norm_silu")
stage(8, 120, 208, 384, 384, kt=3, pre="norm_silu")
stage(4, 60, 104, 384, 384, kt=3, pre="norm_silu")
stage(16, 480, 832, 192, 96, kt=1)   # upsample conv
stage(16, 240, 416, 384, 192, kt=1)  # upsample conv
print("tile sweep 480x832 C96:")
sweep(16, 480, 832, 96, 96, 3, [(16, 32), (8, 104), (16, 52), (8, 52),
                                (16, 104)])
print("tile sweep 240x416 C192:")
sweep(16, 240, 416, 192, 192, 3, [(4, 52), (4, 104), (8, 52), (8, 104)])
