"""Microbenchmark the 1.3B hot-path components on TPU at 480p geometry.

Timing strategy: `block_until_ready` is unreliable through the axon tunnel,
so each op runs n times inside an on-device `lax.fori_loop` with a scalar
data dependency injected into the inputs (prevents loop-invariant hoisting
and inter-iteration overlap). Wall time of the fetched scalar / n is the
per-op latency.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from turbodiffusion_tpu.config import AttentionConfig
from turbodiffusion_tpu.ops.attention import (
    get_block_map, linear_attention, sla_attention)
from turbodiffusion_tpu.ops.flash_pallas import flash_attention

B, L, H, D = 1, 32760, 12, 128
DIM, FFN = 1536, 8960
N_ITERS = 8


FILTER = sys.argv[1] if len(sys.argv) > 1 else ""


def bench(fn, *args, name="", n=N_ITERS):
    """fn(*args) -> array. args[0] must be float; a tiny c-dependent
    perturbation is added to it each iteration. argv[1] substring-filters
    which benches run (e.g. `profile_components.py sparse`)."""
    if FILTER and FILTER not in name:
        return None

    def run(*a):
        def body(i, c):
            eps = (c * 1e-12).astype(a[0].dtype)  # keep a[0]'s dtype
            perturbed = (a[0] + eps,) + a[1:]
            out = fn(*perturbed)
            return c + out.reshape(-1)[0].astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # args go through jit parameters, not closure capture: the axon remote
    # compile service ships closure constants in the HTTP payload and 413s
    # past ~200MB.
    f = jax.jit(run)
    float(f(*args))  # compile + warmup
    t0 = time.perf_counter()
    val = float(f(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1000:9.2f} ms")
    return dt


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    q = jax.random.normal(ks[0], (B, L, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, L, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, L, H, D), jnp.bfloat16)
    x = jax.random.normal(ks[3], (B, L, DIM), jnp.bfloat16)
    w1 = jax.random.normal(ks[4], (DIM, FFN), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[5], (FFN, DIM), jnp.bfloat16) * 0.02
    wq = jax.random.normal(ks[6], (DIM, DIM), jnp.bfloat16) * 0.02
    proj_l = {"w": jnp.zeros((D, D), jnp.float32),
              "b": jnp.zeros((D,), jnp.float32)}
    cfg = AttentionConfig(backend="sagesla", sla_topk=0.1)

    bench(lambda x, w: jnp.matmul(x, w), x, wq, name="qkv-size matmul (32760x1536x1536)")
    bench(lambda x, w1, w2: jnp.matmul(jax.nn.gelu(jnp.matmul(x, w1)), w2),
          x, w1, w2, name="ffn matmuls (1.5k->9k->1.5k)")
    bench(lambda q, k, v: flash_attention(q, k, v), q, k, v,
          name="flash dense (512/1024 tiles)", n=3)
    _, lut, _ = get_block_map(q, k, 0.1, 128, 128)
    bench(lambda q, k, v: flash_attention(q, k, v, lut=lut), q, k, v,
          name="flash sparse topk=0.1")
    bench(lambda q, k, v: flash_attention(q, k, v, lut=lut, int8_qk=True),
          q, k, v, name="flash sparse int8 topk=0.1")
    bench(lambda q, k: get_block_map(q, k, 0.1, 128, 128)[1], q, k,
          name="get_block_map")
    bench(lambda q, k, v: linear_attention(q, k, v), q, k, v,
          name="linear attention branch")
    bench(lambda q, k, v: sla_attention(q, k, v, proj_l, cfg, int8_qk=True),
          q, k, v, name="full sagesla attention")

    e = jax.random.normal(ks[7], (B, 1, DIM), jnp.float32)

    def norm_mod(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
        n = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
        return (n.astype(jnp.float32) * (1 + e) + e).astype(x.dtype)

    bench(norm_mod, x, name="layernorm+modulate fp32 island")

    def fold_only(q):
        qf = jnp.swapaxes(q, 1, 2).reshape(B * H, L, D)
        return jnp.swapaxes(qf.reshape(B, H, L, D), 1, 2)
    bench(fold_only, q, name="layout fold+unfold (1 tensor)")

    from turbodiffusion_tpu.models.rope import apply_rope, rope_freqs_3d
    freqs = rope_freqs_3d(21, 30, 52, D)
    bench(lambda q: apply_rope(q, freqs), q, name="rope apply (1 tensor)")

    from turbodiffusion_tpu.ops.quant import (
        int8_linear_postscale, quantize_int8_postscale)
    wq8, ws8 = quantize_int8_postscale(wq.astype(jnp.float32))
    bench(lambda x: int8_linear_postscale(x, wq8, ws8), x,
          name="int8 postscale linear (qkv size)")
    w18, s18 = quantize_int8_postscale(w1.astype(jnp.float32))
    bench(lambda x: int8_linear_postscale(x, w18, s18), x,
          name="int8 postscale linear (ffn up)")


if __name__ == "__main__":
    main()
