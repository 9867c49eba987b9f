"""Microbench the sparse SageSLA kernel at the headline geometry.

Times sparse_attention_i8_planes (the descriptor-minimal blockscale kernel:
per-block K scales + per-channel V) standalone, with the on-device fori-loop
data-dependency trick (block_until_ready is a no-op over the axon tunnel).

Usage: python scripts_dev/bench_sparse_kernel.py [BQ] [L]
Env: TDX_SPARSE_NBUF / TDX_SPARSE_GROUP_{LO,HI} sweep the gather knobs.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from turbodiffusion_tpu.ops.flash_pallas import (  # noqa: E402
    sparse_attention_i8_planes, quantize_v_per_channel)
from turbodiffusion_tpu.ops.attention import get_block_map  # noqa: E402
from turbodiffusion_tpu.ops.sla_fused import subquant_pack_kv  # noqa: E402

B, H, D = 1, 12, 128
BQ = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BK = 256
L = int(sys.argv[2]) if len(sys.argv) > 2 else 32760
TOPK = 0.1
N_ITERS = 30


def main():
    print(f"device: {jax.devices()[0].device_kind}  BQ={BQ} BK={BK} L={L}")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    Lp = -(-L // 512) * 512
    q = jax.random.normal(ks[0], (B, L, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, L, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, L, H, D), jnp.bfloat16)
    _, lut, topk = get_block_map(q, k, TOPK, BQ, BK)
    print(f"topk blocks: {topk} of {Lp // BK}")

    def planes(x):
        xp = jnp.swapaxes(x, 1, 2)
        return jnp.pad(xp, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))

    qp, kp, vp = planes(q), planes(k), planes(v)
    qf = qp.astype(jnp.float32)
    qs = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0
    qi = jnp.round(qf / qs).astype(jnp.int8)
    vi, vcs = quantize_v_per_channel(vp, L)
    mu = jnp.mean(kp.astype(jnp.float32), axis=2, keepdims=True)
    kvi, ksb = subquant_pack_kv(kp, mu, vi, BK, block_scales=True, kv_len=L)
    zb = jnp.zeros((B, H, Lp, 1), jnp.float32)

    @jax.jit
    def run(qi, qs, kvi, ksb, vcs, lut):
        def body(i, c):
            qs2 = qs + (c * 1e-30)
            o = sparse_attention_i8_planes(
                qi, qs2, None, zb, None, zb, lut, block_q=BQ, block_k=BK,
                kv_len=L, v_channel_scale=vcs, kvi_packed=kvi,
                k_block_scale=ksb)
            return c + o[0, 0, 0, 0].astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))

    float(run(qi, qs, kvi, ksb, vcs, lut))   # compile + warmup
    t0 = time.perf_counter()
    float(run(qi, qs, kvi, ksb, vcs, lut))
    dt = (time.perf_counter() - t0) / N_ITERS
    per_step = dt * 1000 * H and dt * 1000
    print(f"sparse kernel: {per_step:9.3f} ms/call "
          f"({per_step * 30 * 4:7.1f} ms per 4-step denoise)")


if __name__ == "__main__":
    main()
