"""Drive Wan2.1-14B single-chip: int8 weights (~13.9 GiB) + unfused QKV fit
one 16 GB v5e — the reference needs a 24-32 GB GPU for this model
(README.md:408-465). Params are built directly on device (zeros/ones:
checkpoint-free latency measurement; 14B host-side init would take minutes).

Run: PYTHONPATH=/root/repo python scripts_dev/drive_14b_singlechip.py [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print(jax.devices(), flush=True)

from turbodiffusion_tpu.config import AttentionConfig, wan_config
from turbodiffusion_tpu.models.wan import init_wan_params, wan_forward
from turbodiffusion_tpu.ops.quant import quantize_wan_blocks
from turbodiffusion_tpu.pipelines.sampler import rcm_timesteps


def device_params(cfg):
    """Shape-faithful quantized params materialized on device without host
    transfers: eval_shape the init + quantization, then fill by dtype."""
    def build():
        p = init_wan_params(jax.random.PRNGKey(0), cfg)
        p["blocks"] = quantize_wan_blocks(p["blocks"], mode="postscale",
                                          fuse_qkv=False)
        return p

    shapes = jax.eval_shape(build)

    def fill(s):
        if s.dtype == jnp.int8:
            return jnp.zeros(s.shape, s.dtype)
        if s.dtype == jnp.float32 and s.ndim <= 1:
            return jnp.ones(s.shape, s.dtype)        # scales
        return jnp.full(s.shape, 0.01, s.dtype)

    return jax.tree.map(fill, shapes)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    linear_branch = "--linear" in sys.argv
    cfg = wan_config(
        "Wan2.1-14B",
        attention=AttentionConfig(backend="sagesla", sla_topk=0.1,
                                  linear_branch=linear_branch),
        quant_linear=True)
    print(f"linear_branch={linear_branch}", flush=True)
    t0 = time.time()
    params = device_params(cfg)
    n_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    print(f"params on device: {n_bytes / 2**30:.2f} GiB "
          f"({time.time()-t0:.1f} s)", flush=True)

    ctx = jnp.zeros((1, 512, cfg.text_dim), jnp.bfloat16)
    frames = 73 if "--frames" not in sys.argv else int(
        sys.argv[sys.argv.index("--frames") + 1])
    T_lat = 1 + (frames - 1) // 4
    print(f"{frames} frames -> {T_lat} latent frames "
          f"({T_lat * 30 * 52} tokens)", flush=True)
    noise = jax.random.normal(jax.random.PRNGKey(1),
                              (1, 16, T_lat, 60, 104), jnp.float32)

    @jax.jit
    def denoise4(params, x):
        ts = rcm_timesteps(steps, 80.0)
        x = x * ts[0]
        for i in range(steps):
            tt = jnp.full((1, 1), ts[i] * 1000.0, jnp.float32)
            v = wan_forward(params, cfg, x, tt, ctx).astype(jnp.float32)
            x = x - (ts[i] - ts[i + 1]) * v
        return jnp.sum(x)

    t0 = time.time()
    s = float(denoise4(params, noise))
    print(f"compile+first: {time.time()-t0:.1f} s (sum {s:.3f})", flush=True)
    for d in jax.local_devices():
        st = d.memory_stats() or {}
        print(f"peak HBM: {st.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
              f"of {st.get('bytes_limit', 0)/2**30:.2f}", flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        float(denoise4(params, noise))
        print(f"14B {steps}-step 480p denoise: "
              f"{time.perf_counter()-t0:.2f} s", flush=True)


if __name__ == "__main__":
    main()
