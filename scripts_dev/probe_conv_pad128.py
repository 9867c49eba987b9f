"""Does padding VAE conv channels to 128-multiples speed up XLA's direct
conv? C=96 runs the MXU at 75% lane occupancy; C->128 does +33% math at
full occupancy. Run: PYTHONPATH=/root/.axon_site:/root/repo python
scripts_dev/probe_conv_pad128.py
"""
import os
os.makedirs("/root/.jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from turbodiffusion_tpu.utils.timing import measure_best

PEAK = 197e12


def conv2d(T, H, W, Cin, Cout, iters=4):
    k = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(k[0], (T, H, W, Cin), jnp.bfloat16)
    w = (jax.random.normal(k[1], (3, 3, Cin, Cout), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)

    @jax.jit
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = measure_best(f, x, w, n=3, iters=iters)
    flops = 2 * T * H * W * 9 * Cin * Cout
    print(f"{H:3d}x{W:3d} C{Cin:3d}->{Cout:3d}: {dt*1e3:7.2f} ms  "
          f"MXU {flops/dt/PEAK*100:5.1f}%", flush=True)
    return dt


print(jax.devices())
a = conv2d(16, 480, 832, 96, 96)
b = conv2d(16, 480, 832, 128, 128)
print(f"pad-to-128 wins at stage1: {a > b} ({a*1e3:.1f} vs {b*1e3:.1f} ms)")
c = conv2d(16, 240, 416, 192, 192)
d = conv2d(16, 240, 416, 256, 256)
print(f"pad-to-256 wins at stage2: {c > d} ({c*1e3:.1f} vs {d*1e3:.1f} ms)")
