"""Probe: is the Wan VAE decode conv stack layout-bound on TPU?

Times representative decoder convs in NCDHW (current) vs NDHWC
(channels-minor) at chunked 480p decoder shapes (the decode scans 16-pixel-
frame chunks; a full 81-frame full-res tensor exceeds 2^31 elements), plus
the full vae_decode at several chunk sizes.

Run: PYTHONPATH=/root/repo python scripts_dev/probe_vae_layout.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

print(jax.devices(), flush=True)


def timeit(f, *args, iters=10):
    # f returns a SCALAR (sum fused inside jit): eager ops over the axon
    # remote tunnel cost ~100 s each, so fetching a 4-byte scalar is the
    # only safe sync primitive here.
    float(f(*args))                           # compile + sync
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(iters):
        s += float(f(*args))
    return (time.perf_counter() - t0) / iters * 1e3


# chunk=4 latent frames -> 16-pixel-frame chunks through the decoder
CASES = [
    ("latent 4x60x104 c384->384", (1, 384, 4, 60, 104), 384),
    ("up1 8x120x208 c384->192", (1, 384, 8, 120, 208), 192),
    ("up2 16x240x416 c192->96", (1, 192, 16, 240, 416), 96),
    ("full 16x480x832 c96->96", (1, 96, 16, 480, 832), 96),
    ("head 16x480x832 c96->3", (1, 96, 16, 480, 832), 3),
]

r = np.random.RandomState(0)
for name, (B, C, T, H, W), CO in CASES:
    x = jnp.asarray(r.randn(B, C, T, H, W), jnp.bfloat16)
    w = jnp.asarray(r.randn(CO, C, 3, 3, 3) * 0.05, jnp.bfloat16)

    f_ncdhw = jax.jit(lambda x_, w_: jnp.sum(jax.lax.conv_general_dilated(
        x_, w_, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW")).astype(jnp.float32)))
    xt = jnp.moveaxis(x, 1, -1)
    wt = jnp.transpose(w, (2, 3, 4, 1, 0))
    f_ndhwc = jax.jit(lambda x_, w_: jnp.sum(jax.lax.conv_general_dilated(
        x_, w_, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")).astype(jnp.float32)))
    try:
        t1 = timeit(f_ncdhw, x, w, iters=5)
    except Exception as e:
        t1 = float("nan"); print(name, "NCDHW fail", str(e)[:90], flush=True)
    try:
        t2 = timeit(f_ndhwc, xt, wt, iters=5)
    except Exception as e:
        t2 = float("nan"); print(name, "NDHWC fail", str(e)[:90], flush=True)
    flops = 2 * B * T * H * W * C * CO * 27
    print(f"{name}: NCDHW {t1:8.2f} ms ({flops/t1/1e9:7.1f} GF/ms)   "
          f"NDHWC {t2:8.2f} ms ({flops/t2/1e9:7.1f} GF/ms)", flush=True)

# full decode timing
from turbodiffusion_tpu.models.vae import VAEConfig, init_vae_params, vae_decode

cfg = VAEConfig()
params = init_vae_params(jax.random.PRNGKey(0), cfg)
z = jnp.asarray(r.randn(1, 16, 21, 60, 104), jnp.float32)
for chunk in (4, 5, 10):
    if 20 % chunk:
        continue
    dec = jax.jit(lambda p_, z_: jnp.sum(
        vae_decode(p_, z_, chunk=chunk).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(dec(params, z))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(dec(params, z))
    print(f"vae_decode chunk={chunk}: {time.perf_counter()-t0:.2f} s "
          f"(compile+first {compile_s:.1f} s)", flush=True)
