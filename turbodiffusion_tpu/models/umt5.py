"""umT5-XXL text encoder — functional JAX implementation.

Behavioral reference: rcm/utils/umt5.py (T5Encoder :308-338, T5Attention
:145-195 — note T5 applies NO 1/sqrt(d) scaling, T5LayerNorm :130-142 —
RMS-style without mean subtraction, T5FeedForward :197-214 — gated GELU,
T5RelativeEmbedding :268-305 — bidirectional bucketed relative positions,
umt5_xxl config :451-465 with per-layer position embeddings shared_pos=False).

All blocks are stacked and run under one lax.scan. The relative-position
bucket matrix is static for a fixed text_len and computed once in numpy.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class UMT5Config:
    """umt5-xxl (rcm/utils/umt5.py:451-465)."""
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128
    text_len: int = 512
    dtype: Any = jnp.bfloat16


def umt5_test_config(**kw) -> UMT5Config:
    base = dict(vocab_size=128, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                num_layers=2, text_len=16, dtype=jnp.float32)
    base.update(kw)
    return UMT5Config(**base)


def relative_position_buckets(lq: int, lk: int, num_buckets: int = 32,
                              max_dist: int = 128) -> np.ndarray:
    """Bidirectional T5 relative-position bucketing
    (umt5.py:287-305). Returns int32 (lq, lk)."""
    rel = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / math.log(max_dist / max_exact)
        * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(rel < max_exact, rel, large)
    return buckets.astype(np.int32)


def _t5_layer_norm(x, w, eps: float = 1e-6):
    """T5LayerNorm (umt5.py:130-142): RMS without mean subtraction; fp32
    variance; cast to weight dtype before scaling."""
    xf = x.astype(jnp.float32)
    y = (xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
         ).astype(x.dtype)
    return w.astype(x.dtype) * y


def _t5_gelu(x):
    """Explicit tanh GELU (umt5.py:125-128)."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi)
                                   * (xf + 0.044715 * xf ** 3)))
    return y.astype(x.dtype)


def _t5_attention(p, x, pos_bias, mask, cfg: UMT5Config):
    """T5Attention (umt5.py:145-195): no bias terms, NO softmax scaling."""
    B, L, _ = x.shape
    H = cfg.num_heads
    Dh = cfg.dim_attn // H
    q = jnp.matmul(x, p["q"].astype(x.dtype)).reshape(B, L, H, Dh)
    k = jnp.matmul(x, p["k"].astype(x.dtype)).reshape(B, L, H, Dh)
    v = jnp.matmul(x, p["v"].astype(x.dtype)).reshape(B, L, H, Dh)
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits + pos_bias[None]
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :] > 0, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, L, cfg.dim_attn)
    return jnp.matmul(o, p["o"].astype(x.dtype))


def umt5_encode(params, ids, mask, cfg: UMT5Config):
    """T5Encoder forward (umt5.py:329-338). ids, mask: (B, L) int32.
    Returns (B, L, dim) in cfg.dtype."""
    x = jnp.take(params["token_embedding"], ids, axis=0)
    L = ids.shape[1]
    buckets = jnp.asarray(relative_position_buckets(
        L, L, cfg.num_buckets, cfg.max_dist))

    def block_fn(x, blk):
        # per-layer relative position bias (shared_pos=False, umt5.py:461)
        pos = jnp.take(blk["pos_embedding"].astype(jnp.float32), buckets,
                       axis=0)                  # (L, L, H)
        pos_bias = jnp.transpose(pos, (2, 0, 1))  # (H, L, L)
        h = _t5_layer_norm(x, blk["norm1"]["w"])
        x = x + _t5_attention(blk["attn"], h, pos_bias, mask, cfg)
        h = _t5_layer_norm(x, blk["norm2"]["w"])
        gated = _t5_gelu(jnp.matmul(h, blk["ffn"]["gate"].astype(h.dtype)))
        ff = jnp.matmul(h, blk["ffn"]["fc1"].astype(h.dtype)) * gated
        x = x + jnp.matmul(ff, blk["ffn"]["fc2"].astype(h.dtype))
        return x, None

    x, _ = jax.lax.scan(block_fn, x, params["blocks"])
    return _t5_layer_norm(x, params["norm"]["w"])


def umt5_embed_padded(params, ids, mask, cfg: UMT5Config):
    """UMT5EncoderModel.__call__ semantics (umt5.py:501-518): run the
    encoder, then zero out positions beyond each sequence's length and
    keep the fixed text_len."""
    ctx = umt5_encode(params, ids, mask, cfg)
    return ctx * (mask[:, :, None] > 0).astype(ctx.dtype)


def init_umt5_params(key, cfg: UMT5Config):
    """Random init per the reference's schemes (umt5.py:107-122)."""
    dtype = cfg.dtype
    D, Da, Df = cfg.dim, cfg.dim_attn, cfg.dim_ffn
    k = iter(jax.random.split(key, 8))

    def blk(key):
        ks = iter(jax.random.split(key, 8))
        return {
            "norm1": {"w": jnp.ones((D,), dtype)},
            "attn": {
                "q": (jax.random.normal(next(ks), (D, Da)) * (D * Da) ** -0.5
                      ).astype(dtype),
                "k": (jax.random.normal(next(ks), (D, Da)) * D ** -0.5
                      ).astype(dtype),
                "v": (jax.random.normal(next(ks), (D, Da)) * D ** -0.5
                      ).astype(dtype),
                "o": (jax.random.normal(next(ks), (Da, D)) * (Da) ** -0.5
                      ).astype(dtype),
            },
            "pos_embedding": (jax.random.normal(next(ks),
                              (cfg.num_buckets, cfg.num_heads))
                              * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
                              ).astype(jnp.float32),
            "norm2": {"w": jnp.ones((D,), dtype)},
            "ffn": {
                "gate": (jax.random.normal(next(ks), (D, Df)) * D ** -0.5
                         ).astype(dtype),
                "fc1": (jax.random.normal(next(ks), (D, Df)) * D ** -0.5
                        ).astype(dtype),
                "fc2": (jax.random.normal(next(ks), (Df, D)) * Df ** -0.5
                        ).astype(dtype),
            },
        }

    blocks = jax.vmap(blk)(jax.random.split(next(k), cfg.num_layers))
    return {
        "token_embedding": jax.random.normal(
            next(k), (cfg.vocab_size, D)).astype(dtype),
        "blocks": blocks,
        "norm": {"w": jnp.ones((D,), dtype)},
    }


# ---------------------------------------------------------------------------
# Tokenizer wrapper (HF tokenizer; optional — needs network/cache to load)
# ---------------------------------------------------------------------------

_tokenizer = None


def tokenize(prompts, text_len: int = 512, tokenizer_path: str = "google/umt5-xxl"):
    """HF tokenization with whitespace cleaning (umt5.py:58-98,500).
    Requires the tokenizer files to be cached locally (zero-egress envs must
    pre-seed the HF cache)."""
    global _tokenizer
    import html
    import re

    if _tokenizer is None:
        import os
        from transformers import AutoTokenizer
        # zero-egress environments: don't sit through HF retry backoff
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        _tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)

    if isinstance(prompts, str):
        prompts = [prompts]

    def clean(text):
        try:
            import ftfy
            text = ftfy.fix_text(text)
        except ImportError:
            pass
        text = html.unescape(html.unescape(text))
        return re.sub(r"\s+", " ", text).strip()

    enc = _tokenizer([clean(p) for p in prompts], padding="max_length",
                     truncation=True, max_length=text_len, return_tensors="np")
    return (jnp.asarray(enc["input_ids"], jnp.int32),
            jnp.asarray(enc["attention_mask"], jnp.int32))
