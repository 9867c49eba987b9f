"""A/B the tiled vs weight-resident GEMM kernels at the exact 14B and 1.3B
per-layer shapes. Run on TPU:
    PYTHONPATH=/root/repo python scripts_dev/probe_gemm_14b.py
"""
import os
os.makedirs("/root/.jax_cache", exist_ok=True)
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from turbodiffusion_tpu.utils.timing import measure_best
import turbodiffusion_tpu.ops.quant as Q

M = 32760
SHAPES = [
    ("14b qkv (postscale)", "post", 5120, 15360),
    ("14b o (postscale)", "post", 5120, 5120),
    ("14b fc1 (qout)", "qout", 5120, 13824),
    ("14b fc2 (blockact)", "block", 13824, 5120),
    ("1.3b fc1 (qout)", "qout", 1536, 8960),
    ("1.3b fc2 (blockact)", "block", 8960, 1536),
]

def mk(K, N):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    xq = jax.random.randint(kx, (M, K), -127, 128, jnp.int8)
    wq = jax.random.randint(kw, (K, N), -127, 128, jnp.int8)
    rs = jnp.full((M, 1), 0.01, jnp.float32)
    cs = jnp.full((N,), 0.01, jnp.float32)
    return xq, wq, rs, cs

for name, kind, K, N in SHAPES:
    xq, wq, rs, cs = mk(K, N)
    flops = 2 * M * K * N
    for wres in ("0", "1"):
        os.environ["TDX_GEMM_WRES"] = wres
        if kind == "post":
            fn = lambda xq, rs, wq, cs: Q.int8_gemm_postscale_pallas(
                xq, rs, wq, cs)
            args = (xq, rs, wq, cs)
        elif kind == "qout":
            fn = lambda xq, rs, wq, cs: Q.int8_gemm_postscale_qout_pallas(
                xq, rs, wq, cs, act="gelu_tanh")[0]
            args = (xq, rs, wq, cs)
        else:
            bk = Q._pick_bn_div(K)
            xs = jnp.full((M, K // bk), 0.01, jnp.float32)
            fn = lambda xq, xs, wq, cs, bk=bk: Q.int8_gemm_blockact_pallas(
                xq, xs, wq, cs, bk=bk)
            args = (xq, xs, wq, cs)
        dt = measure_best(jax.jit(fn), *args, n=3)
        print(f"{name:24s} wres={wres}: {dt*1e3:8.2f} ms  "
              f"{flops/dt/1e12:6.0f} TOPS", flush=True)
