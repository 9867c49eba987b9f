"""Gemma-3 text encoder + embeddings connector for LTX-2 conditioning.

Behavioral reference: ltx-core text_encoders/gemma/ — Gemma3TextConfig
(config.py:11-37: hidden 3840, 48 layers, 16 q heads / 8 kv heads (GQA),
head_dim 256, GeGLU 15360, rope theta 1e6 with a local-10k sliding-window
(1024) pattern every 6 layers, qk-RMSNorm, query_pre_attn_scalar),
GemmaFeaturesExtractorProjLinear (feature_extractor.py: 3840*49 -> 3840),
and Embeddings1DConnector (embeddings_connector.py:70-197: 2 transformer-1D
blocks at 30x128, learnable registers replacing padded positions) producing
separate video/audio encodings + mask. The T2AV wrapper's padded-token
trimming (TURBOT2AV_TRIM_TEXT_CONTEXT, text_encoder_wrapper.py:15) is
`trim_padded`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Gemma3Config:
    """(gemma/config.py:11-37)."""
    vocab_size: int = 262208
    hidden_size: int = 3840
    intermediate_size: int = 15360
    num_layers: int = 48
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    rope_local_theta: float = 1e4
    sliding_window: int = 1024
    sliding_window_pattern: int = 6   # every 6th layer uses global attention
    query_pre_attn_scalar: float = 256.0
    dtype: Any = jnp.bfloat16


def gemma_test_config(**kw) -> Gemma3Config:
    base = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                num_layers=3, num_heads=2, num_kv_heads=1, head_dim=16,
                sliding_window=4, sliding_window_pattern=2, dtype=jnp.float32)
    base.update(kw)
    return Gemma3Config(**base)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    # Gemma norm: x * (1 + w)
    return (y * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def _rope(x, theta: float):
    """Standard rotate-half rope over head_dim. x: (B, L, H, D)."""
    B, L, H, D = x.shape
    inv = 1.0 / (theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    ang = jnp.outer(jnp.arange(L, dtype=jnp.float32), inv)  # (L, D/2)
    cos, sin = jnp.cos(ang)[None, :, None, :], jnp.sin(ang)[None, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : D // 2], xf[..., D // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                           -1).astype(x.dtype)


def _gemma_attention(p, x, mask_bias, cfg: Gemma3Config, is_global: bool):
    """GQA with qk-RMSNorm and query_pre_attn_scalar scaling."""
    B, L, _ = x.shape
    H, KV, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = jnp.matmul(x, p["q"].astype(x.dtype)).reshape(B, L, H, D)
    k = jnp.matmul(x, p["k"].astype(x.dtype)).reshape(B, L, KV, D)
    v = jnp.matmul(x, p["v"].astype(x.dtype)).reshape(B, L, KV, D)
    q = _rms(q, p["q_norm"], cfg.rms_norm_eps)
    k = _rms(k, p["k_norm"], cfg.rms_norm_eps)
    theta = cfg.rope_theta if is_global else cfg.rope_local_theta
    q, k = _rope(q, theta), _rope(k, theta)
    # expand KV heads for GQA
    rep = H // KV
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    scale = cfg.query_pre_attn_scalar ** -0.5
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + mask_bias[:, None]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, L, H * D)
    return jnp.matmul(o, p["o"].astype(x.dtype))


def _geglu(p, x):
    g = jax.nn.gelu(jnp.matmul(x, p["gate"].astype(x.dtype)),
                    approximate=True)
    return jnp.matmul(g * jnp.matmul(x, p["up"].astype(x.dtype)),
                      p["down"].astype(x.dtype))


def gemma3_encode(params, ids, mask, cfg: Gemma3Config):
    """Causal decoder used as a feature extractor: returns final hidden
    states (B, L, hidden). mask: (B, L) 1=token 0=pad."""
    B, L = ids.shape
    x = jnp.take(params["embed"], ids, axis=0).astype(cfg.dtype)
    x = x * jnp.asarray(math.sqrt(cfg.hidden_size), cfg.dtype)

    pos = jnp.arange(L)
    causal = pos[None, :] <= pos[:, None]                       # (L, L)
    window = pos[None, :] > (pos[:, None] - cfg.sliding_window)
    pad_ok = mask[:, None, :] > 0                               # (B, 1, L)
    bias_global = jnp.where(causal[None] & pad_ok, 0.0, -1e30)
    bias_local = jnp.where((causal & window)[None] & pad_ok, 0.0, -1e30)

    for i, blk in enumerate(params["blocks"]):
        # every sliding_window_pattern-th layer is global (config.py:33-34)
        is_global = (i + 1) % cfg.sliding_window_pattern == 0
        bias = bias_global if is_global else bias_local
        h = _rms(x, blk["input_norm"], cfg.rms_norm_eps)
        h = _gemma_attention(blk["attn"], h, bias, cfg, is_global)
        x = x + _rms(h, blk["post_attn_norm"], cfg.rms_norm_eps)
        h = _rms(x, blk["pre_ffn_norm"], cfg.rms_norm_eps)
        h = _geglu(blk["mlp"], h)
        x = x + _rms(h, blk["post_ffn_norm"], cfg.rms_norm_eps)
    return _rms(x, params["final_norm"], cfg.rms_norm_eps)


# ---------------------------------------------------------------------------
# Embeddings connector (embeddings_connector.py:15-197)
# ---------------------------------------------------------------------------

def connector_apply(params, hidden, mask, heads: int, head_dim: int,
                    num_registers: Optional[int] = None, eps: float = 1e-6):
    """2-block 1D transformer over Gemma features; padded positions replaced
    by tiled learnable registers (:132-160), output mask all-valid then."""
    B, L, D = hidden.shape
    x = hidden
    out_mask = mask
    if num_registers and "registers" in params:
        regs = jnp.tile(params["registers"].astype(x.dtype),
                        (L // num_registers, 1))[None]
        # left-compact valid tokens, fill the tail with registers
        order = jnp.argsort(~(mask > 0), axis=1, stable=True)
        compacted = jnp.take_along_axis(x, order[:, :, None], axis=1)
        n_valid = jnp.sum(mask > 0, axis=1, keepdims=True)
        keep = (jnp.arange(L)[None] < n_valid)[:, :, None]
        x = jnp.where(keep, compacted, regs)
        out_mask = jnp.ones_like(mask)

    for blk in params["blocks"]:
        h = _rms(x, blk["norm1"], eps)
        q = jnp.matmul(h, blk["q"].astype(x.dtype)).reshape(B, L, heads, head_dim)
        k = jnp.matmul(h, blk["k"].astype(x.dtype)).reshape(B, L, heads, head_dim)
        v = jnp.matmul(h, blk["v"].astype(x.dtype)).reshape(B, L, heads, head_dim)
        q, k = _rope(q, 10000.0), _rope(k, 10000.0)
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                            preferred_element_type=jnp.float32) * head_dim ** -0.5
        probs = jax.nn.softmax(logits, -1).astype(v.dtype)
        o = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, L, D)
        x = x + jnp.matmul(o, blk["o"].astype(x.dtype))
        h = _rms(x, blk["norm2"], eps)
        x = x + _geglu(blk["mlp"], h)
    return x, out_mask


def trim_padded(encoding, mask):
    """TURBOT2AV_TRIM_TEXT_CONTEXT: keep only the valid-token span
    (text_encoder_wrapper.py:15; test_acceleration_config.py)."""
    valid = np.asarray(mask[0]) > 0
    idx = np.nonzero(valid)[0]
    if idx.size == 0:
        return encoding, mask
    return encoding[:, idx[0]:idx[-1] + 1], None


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_gemma_params(key, cfg: Gemma3Config):
    dt = cfg.dtype
    D, F = cfg.hidden_size, cfg.intermediate_size
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def lin(k, i, o):
        return (jax.random.normal(k, (i, o)) * 0.02).astype(dt)

    def blk(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "input_norm": jnp.zeros((D,), dt),
            "attn": {"q": lin(next(ks), D, H * Dh),
                     "k": lin(next(ks), D, KV * Dh),
                     "v": lin(next(ks), D, KV * Dh),
                     "o": lin(next(ks), H * Dh, D),
                     "q_norm": jnp.zeros((Dh,), dt),
                     "k_norm": jnp.zeros((Dh,), dt)},
            "post_attn_norm": jnp.zeros((D,), dt),
            "pre_ffn_norm": jnp.zeros((D,), dt),
            "mlp": {"gate": lin(next(ks), D, F), "up": lin(next(ks), D, F),
                    "down": lin(next(ks), F, D)},
            "post_ffn_norm": jnp.zeros((D,), dt),
        }

    keys = jax.random.split(key, cfg.num_layers + 2)
    return {
        "embed": (jax.random.normal(keys[0], (cfg.vocab_size, D)) * 0.02
                  ).astype(dt),
        "blocks": [blk(keys[i + 1]) for i in range(cfg.num_layers)],
        "final_norm": jnp.zeros((D,), dt),
    }


def init_connector_params(key, dim: int, heads: int, head_dim: int,
                          num_layers: int = 2, num_registers: int = 128,
                          dtype=jnp.bfloat16):
    def lin(k, i, o):
        return (jax.random.normal(k, (i, o)) * 0.02).astype(dtype)

    def blk(k):
        ks = iter(jax.random.split(k, 8))
        inner = heads * head_dim
        return {"norm1": jnp.zeros((dim,), dtype),
                "q": lin(next(ks), dim, inner), "k": lin(next(ks), dim, inner),
                "v": lin(next(ks), dim, inner), "o": lin(next(ks), inner, dim),
                "norm2": jnp.zeros((dim,), dtype),
                "mlp": {"gate": lin(next(ks), dim, 4 * dim),
                        "up": lin(next(ks), dim, 4 * dim),
                        "down": lin(next(ks), 4 * dim, dim)}}

    keys = jax.random.split(key, num_layers + 1)
    p = {"blocks": [blk(keys[i]) for i in range(num_layers)]}
    if num_registers:
        p["registers"] = (jax.random.uniform(keys[-1], (num_registers, dim))
                          * 2.0 - 1.0).astype(dtype)
    return p
