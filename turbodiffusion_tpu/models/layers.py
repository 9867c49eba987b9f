"""Basic functional layers with the reference's exact precision discipline.

Params are plain pytrees (nested dicts of jnp arrays). Linear kernels are
stored (in_features, out_features) — the JAX convention — so `x @ w + b`
maps straight onto the MXU; the checkpoint importer transposes torch's
(out, in) layout.

Precision notes (fp32 islands, reference rcm/networks/wan2pt1.py):
  * WanRMSNorm (:181-199): normalize in fp32, cast back to x.dtype, THEN
    multiply by the (bf16) weight — the cast happens before the weight mul.
  * WanLayerNorm (:202-212): full fp32 layernorm, output cast to x.dtype.
  * AdaLN modulation and time embeddings run in fp32 (:399-416,671-674).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def linear(p, x, precision=None):
    """x @ w + b. Works on arbitrary leading dims."""
    y = jnp.matmul(x, p["w"].astype(x.dtype), precision=precision)
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(y.dtype)
    return y


def rms_norm(x, weight, eps: float = 1e-5):
    """WanRMSNorm semantics (wan2pt1.py:181-199): fp32 normalize, cast to
    x.dtype before the elementwise weight multiply."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight.astype(x.dtype)


def layer_norm(x, eps: float = 1e-6, scale=None, bias=None, out_dtype=None):
    """WanLayerNorm semantics (wan2pt1.py:202-212): fp32 compute; optional
    affine; output cast to `out_dtype` (default: x.dtype)."""
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def layer_norm_fp32(x, eps: float = 1e-6, scale=None, bias=None):
    """LayerNorm that keeps its fp32 output (used pre-modulation)."""
    return layer_norm(x, eps=eps, scale=scale, bias=bias, out_dtype=jnp.float32)


def gelu_tanh(x):
    """GELU with tanh approximation (nn.GELU(approximate='tanh'),
    wan2pt1.py:364)."""
    return jax.nn.gelu(x, approximate=True)


def silu(x):
    return jax.nn.silu(x)


def sinusoidal_embedding_1d(dim: int, position):
    """Sinusoidal timestep embedding (wan2pt1.py:144-153): cat([cos, sin]) of
    outer(position, 10000^-(arange(half)/half)). Reference computes in fp64;
    TPU has no fast fp64, fp32 is ample for position <= 1000 with 128 freqs."""
    assert dim % 2 == 0
    half = dim // 2
    position = jnp.asarray(position, jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = jnp.outer(position, freqs)
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)


def mlp_time_embedding(params, t_B, freq_dim: int):
    """time_embedding: Linear->SiLU->Linear in fp32 (wan2pt1.py:571,671-674)."""
    emb = sinusoidal_embedding_1d(freq_dim, t_B)
    p1, p2 = params["fc1"], params["fc2"]
    h = silu(jnp.matmul(emb, p1["w"].astype(jnp.float32)) + p1["b"].astype(jnp.float32))
    return jnp.matmul(h, p2["w"].astype(jnp.float32)) + p2["b"].astype(jnp.float32)


def time_projection(params, e_B_D, dim: int):
    """time_projection: SiLU->Linear to 6*dim, fp32 (wan2pt1.py:572,673)."""
    p = params["fc"]
    out = jnp.matmul(silu(e_B_D), p["w"].astype(jnp.float32)) + p["b"].astype(jnp.float32)
    return out.reshape(e_B_D.shape[0], 6, dim)
