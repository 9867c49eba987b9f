"""Per-stage conv timing, XLA vs Pallas, random data (no constant folding).

Decoder stages at 480p/81f, chunk=4 latent frames (auto):
  stage0: 4 frames   104x60?? -> actually (B,T,H,W,C): T frames, H=60,W=104 lat
Wait -- layout in vae.py is (B, T, H, W, C) with latent (h=60, w=104) and
output (480, 832). So H=60->480, W=104->832.

Per scan step at chunk=4: T progression 4 -> 8 -> 16 -> 16 frames.
  stage0 res: T=4,  H=60,  W=104, C=384
  stage1 res: T=8,  H=120, W=208, C=384 (and 192 out)
  stage2 res: T=16, H=240, W=416, C=192
  stage3 res: T=16, H=480, W=832, C=96

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts_dev/probe_conv_stage.py
"""
import os, time
os.makedirs("/root/.jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from turbodiffusion_tpu.ops.conv_pallas import conv3x3_fused

PEAK_BF16 = 197e12


from turbodiffusion_tpu.utils.timing import measure_best


def tmin(fn, *args, n=3):
    return measure_best(fn, *args, n=n, iters=8)


@jax.jit
def conv_xla(x, w):
    B, T, H, W, C = x.shape
    return jax.lax.conv_general_dilated(
        x.reshape(B * T, H, W, C), w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.jit
def conv_xla_3d(x, w):
    # the decoder's real op: 3D conv, temporally valid (input carries the
    # kt-1 cache frames), spatially SAME (models/vae.py _conv3d_cl)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))


def stage(T, H, W, Cin, Cout, kt=1):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (1, T + kt - 1, H, W, Cin), jnp.bfloat16)
    w2 = jax.random.normal(k, (3, 3, Cin, Cout), jnp.bfloat16) * 0.02
    w3 = jax.random.normal(k, (kt, 3, 3, Cin, Cout), jnp.bfloat16) * 0.02
    b = jnp.zeros((Cout,), jnp.bfloat16)
    flops = 2 * T * H * W * 9 * kt * Cin * Cout

    if kt == 1:
        dt_x = tmin(conv_xla,
                    x[:, :T].reshape(1 * T, H, W, Cin)[None].reshape(
                        1, T, H, W, Cin), w2)
    else:
        dt_x = tmin(conv_xla_3d, x, w3)
    dt_p = tmin(lambda x, w, b: conv3x3_fused(x, w, b), x, w3, b)
    ex = flops / dt_x / PEAK_BF16 * 100 if dt_x else 0
    ep = flops / dt_p / PEAK_BF16 * 100
    print(f"T={T:2d} {H:3d}x{W:3d} C{Cin:3d}->{Cout:3d} kt={kt}: "
          f"XLA {dt_x*1e3 if dt_x else 0:7.2f} ms ({ex:4.1f}%)  "
          f"Pallas {dt_p*1e3:7.2f} ms ({ep:4.1f}%)")


print(jax.devices())
stage(4, 60, 104, 384, 384)
stage(4, 60, 104, 384, 384, kt=3)
stage(8, 120, 208, 384, 384)
stage(8, 120, 208, 384, 384, kt=3)
stage(8, 120, 208, 384, 192)
stage(16, 240, 416, 192, 192)
stage(16, 240, 416, 192, 192, kt=3)
stage(16, 480, 832, 96, 96)
stage(16, 480, 832, 96, 96, kt=3)
