"""Re-probe channel padding on the 2D-tap conv path (r5).

The r4 "channel padding loses" measurement ran against the volumetric 3D
conv; the decoder has since moved to kt summed 2D NHWC taps (_conv3d_cl).
2D convs at C=96 waste 1/4 of the 128-lane MXU K dim — re-measure whether
padding 96->128 / 192->256 wins on the taps the decoder actually runs.

Run on TPU: PYTHONPATH=/root/repo python scripts_dev/probe_vae_pad128_2dtap.py
"""

import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def bench(fn, *args, n=3):
    from turbodiffusion_tpu.utils.timing import measure_best
    return measure_best(fn, *args, n=n)


def tap_conv(x, w):
    # one 2D tap of the kt=3 chain at the decoder's finest stages
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    for (T, H, W, C) in [(16, 480, 832, 96), (16, 240, 416, 192)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (T, H, W, C),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C),
                              jnp.bfloat16) * 0.05
        f = jax.jit(tap_conv)
        t0 = bench(f, x, w)

        Cp = ((C + 127) // 128) * 128
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C), (0, Cp - C)))
        t1 = bench(f, xp, wp)

        flops = 2 * T * H * W * C * C * 9
        print(f"stage ({T},{H},{W},{C}): unpadded {t0*1e3:.2f} ms "
              f"({flops/t0/1e12:.0f} TF/s) | padded->{Cp} {t1*1e3:.2f} ms "
              f"(useful {flops/t1/1e12:.0f} TF/s) "
              f"{'PAD WINS' if t1 < t0 else 'unpadded wins'}", flush=True)


if __name__ == "__main__":
    main()
