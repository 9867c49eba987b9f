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


def gemma3_encode(params, ids, mask, cfg: Gemma3Config,
                  all_hidden_states: bool = False):
    """Causal decoder used as a feature extractor: returns final hidden
    states (B, L, hidden). mask: (B, L) 1=token 0=pad.

    all_hidden_states=True returns the list [embeddings, input to layer 1,
    …, input to layer N-1, final-normed output] (num_layers + 1 entries) —
    the HF `output_hidden_states` convention the LTX-2 feature extractor
    consumes (base_encoder.py:44-52)."""
    B, L = ids.shape
    x = jnp.take(params["embed"], ids, axis=0).astype(cfg.dtype)
    x = x * jnp.asarray(math.sqrt(cfg.hidden_size), cfg.dtype)

    pos = jnp.arange(L)
    causal = pos[None, :] <= pos[:, None]                       # (L, L)
    window = pos[None, :] > (pos[:, None] - cfg.sliding_window)
    pad_ok = mask[:, None, :] > 0                               # (B, 1, L)
    bias_global = jnp.where(causal[None] & pad_ok, 0.0, -1e30)
    bias_local = jnp.where((causal & window)[None] & pad_ok, 0.0, -1e30)

    hiddens = []
    for i, blk in enumerate(params["blocks"]):
        if all_hidden_states:
            hiddens.append(x)
        # every sliding_window_pattern-th layer is global (config.py:33-34)
        is_global = (i + 1) % cfg.sliding_window_pattern == 0
        bias = bias_global if is_global else bias_local
        h = _rms(x, blk["input_norm"], cfg.rms_norm_eps)
        h = _gemma_attention(blk["attn"], h, bias, cfg, is_global)
        x = x + _rms(h, blk["post_attn_norm"], cfg.rms_norm_eps)
        h = _rms(x, blk["pre_ffn_norm"], cfg.rms_norm_eps)
        h = _geglu(blk["mlp"], h)
        x = x + _rms(h, blk["post_ffn_norm"], cfg.rms_norm_eps)
    out = _rms(x, params["final_norm"], cfg.rms_norm_eps)
    if all_hidden_states:
        hiddens.append(out)
        return hiddens
    return out


def gemma_feature_extract(params, hidden_states, mask,
                          padding_side: str = "left"):
    """Multi-layer feature aggregation (base_encoder.py:42-52,158-215):
    stack all hidden states to (B, T, D, L), per-batch/per-layer masked
    normalize 8*(x-mean)/range over the valid (T, D) slab, zero padded
    positions, flatten to (B, T, D*L), project with `aggregate_embed`
    (feature_extractor.py: D*L -> D, no bias)."""
    f32 = jnp.float32
    x = jnp.stack([h.astype(f32) for h in hidden_states], axis=-1)
    B, T, D, NL = x.shape
    seq_len = jnp.sum(mask > 0, axis=1)                         # (B,)
    idx = jnp.arange(T)[None, :]
    if padding_side == "right":
        valid = idx < seq_len[:, None]
    else:
        valid = idx >= (T - seq_len[:, None])
    m = valid[:, :, None, None]                                 # (B,T,1,1)
    eps = 1e-6
    masked = jnp.where(m, x, 0.0)
    denom = (seq_len.astype(f32) * D).reshape(B, 1, 1, 1)
    mean = jnp.sum(masked, axis=(1, 2), keepdims=True) / (denom + eps)
    x_min = jnp.min(jnp.where(m, x, jnp.inf), axis=(1, 2), keepdims=True)
    x_max = jnp.max(jnp.where(m, x, -jnp.inf), axis=(1, 2), keepdims=True)
    normed = 8.0 * (x - mean) / (x_max - x_min + eps)
    normed = jnp.where(m, normed, 0.0).reshape(B, T, D * NL)
    w = params["aggregate_embed"]                               # (D*L, D)
    return jnp.matmul(normed.astype(w.dtype), w)


# ---------------------------------------------------------------------------
# Tokenizer (gemma/tokenizer.py: AutoTokenizer, left padding, pad=eos)
# ---------------------------------------------------------------------------

def gemma_tokenize(prompts, tokenizer_path: Optional[str],
                   max_length: int = 256):
    """Returns (ids, mask) int32 (B, max_length), left-padded.

    tokenizer_path=None falls back to a deterministic hash tokenizer for
    checkpoint-free smoke runs (loud; NOT meaningful text encoding)."""
    if isinstance(prompts, str):
        prompts = [prompts]
    if tokenizer_path is not None:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(tokenizer_path,
                                            local_files_only=True,
                                            model_max_length=max_length)
        tok.padding_side = "left"
        if tok.pad_token is None:
            tok.pad_token = tok.eos_token
        enc = tok([p.strip() for p in prompts], padding="max_length",
                  max_length=max_length, truncation=True, return_tensors="np")
        return (enc["input_ids"].astype(np.int32),
                enc["attention_mask"].astype(np.int32))
    import logging
    logging.getLogger(__name__).warning(
        "no Gemma tokenizer path; using the HASH tokenizer fallback — "
        "embeddings are NOT meaningful text encodings")
    ids = np.zeros((len(prompts), max_length), np.int32)
    mask = np.zeros((len(prompts), max_length), np.int32)
    for b, prompt in enumerate(prompts):
        words = prompt.strip().split()[:max_length]
        toks = [hash(w) % 60000 + 3 for w in words]
        ids[b, max_length - len(toks):] = toks                  # left pad
        mask[b, max_length - len(toks):] = 1
    return ids, mask


# ---------------------------------------------------------------------------
# Embeddings connector (embeddings_connector.py:15-197)
# ---------------------------------------------------------------------------

def _plain_rms(x, eps):
    """Parameterless RMS norm (ltx_core.utils rms_norm — the connector's
    _BasicTransformerBlock1D norms carry no weights)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return y.astype(x.dtype)


def _lin_b(p, x):
    y = jnp.matmul(x, p["w"].astype(x.dtype))
    return y + p["b"].astype(x.dtype) if "b" in p else y


def connector_apply(params, hidden, mask, heads: int, head_dim: int,
                    num_registers: Optional[int] = None, eps: float = 1e-6,
                    theta: float = 10000.0, max_pos: float = 1.0):
    """Embeddings1DConnector (embeddings_connector.py:70-197): padded
    positions replaced by tiled learnable registers (:131-157), then
    N _BasicTransformerBlock1D blocks — parameterless rms_norm, biased
    to_q/k/v/out with weighted qk-RMSNorm over inner_dim and interleaved
    fractional rope over the full inner width (attention.py:145-207), plain
    GELU-tanh FF with biases (feed_forward.py, gelu_approx.py) — and a
    final parameterless rms_norm (:192-194). Output mask is all-valid."""
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

    from turbodiffusion_tpu.models.rope import apply_rope_interleaved, ltx_freqs
    pos = jnp.arange(L, dtype=jnp.float32)[None]            # (1, L)
    freqs = ltx_freqs(pos, D, theta, (max_pos,))            # (L, D//2)

    def wrms(y, w):
        return _plain_rms(y, eps) * w.astype(y.dtype)

    for blk in params["blocks"]:
        h = _plain_rms(x, eps)
        q = wrms(_lin_b(blk["to_q"], h), blk["q_norm"])
        k = wrms(_lin_b(blk["to_k"], h), blk["k_norm"])
        v = _lin_b(blk["to_v"], h)
        q = apply_rope_interleaved(q[:, :, None], freqs)[:, :, 0]
        k = apply_rope_interleaved(k[:, :, None], freqs)[:, :, 0]
        q = q.reshape(B, L, heads, head_dim)
        k = k.reshape(B, L, heads, head_dim)
        vh = v.reshape(B, L, heads, head_dim)
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                            preferred_element_type=jnp.float32) * head_dim ** -0.5
        probs = jax.nn.softmax(logits, -1).astype(vh.dtype)
        o = jnp.einsum("bhlm,bmhd->blhd", probs, vh).reshape(B, L, D)
        x = x + _lin_b(blk["to_out"], o)
        h = _plain_rms(x, eps)
        ff = _lin_b(blk["ff"]["fc2"],
                    jax.nn.gelu(_lin_b(blk["ff"]["fc1"], h),
                                approximate=True))
        x = x + ff
    return _plain_rms(x, eps), out_mask


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


def init_feature_extractor_params(key, cfg: Gemma3Config,
                                  dtype=jnp.bfloat16):
    """GemmaFeaturesExtractorProjLinear: (hidden * (num_layers+1)) -> hidden,
    no bias (feature_extractor.py:22)."""
    D = cfg.hidden_size
    nl = cfg.num_layers + 1
    return {"aggregate_embed": (jax.random.normal(key, (D * nl, D))
                                * 0.02).astype(dtype)}


def init_connector_params(key, dim: int, heads: int, head_dim: int,
                          num_layers: int = 2, num_registers: int = 128,
                          dtype=jnp.bfloat16):
    def lin(k, i, o):
        return {"w": (jax.random.normal(k, (i, o)) * 0.02).astype(dtype),
                "b": jnp.zeros((o,), dtype)}

    def blk(k):
        ks = iter(jax.random.split(k, 8))
        inner = heads * head_dim
        return {"to_q": lin(next(ks), dim, inner),
                "to_k": lin(next(ks), dim, inner),
                "to_v": lin(next(ks), dim, inner),
                "to_out": lin(next(ks), inner, dim),
                "q_norm": jnp.ones((inner,), dtype),
                "k_norm": jnp.ones((inner,), dtype),
                "ff": {"fc1": lin(next(ks), dim, 4 * dim),
                       "fc2": lin(next(ks), 4 * dim, dim)}}

    keys = jax.random.split(key, num_layers + 1)
    p = {"blocks": [blk(keys[i]) for i in range(num_layers)]}
    if num_registers:
        p["registers"] = (jax.random.uniform(keys[-1], (num_registers, dim))
                          * 2.0 - 1.0).astype(dtype)
    return p


# ---------------------------------------------------------------------------
# Full conditioning pipeline (base_encoder.py _preprocess_text +
# av_encoder.py: encode -> feature-extract -> connector -> video/audio ctx)
# ---------------------------------------------------------------------------

def encode_text(prompts, gemma_params, connector_params, cfg: Gemma3Config,
                tokenizer_path: Optional[str] = None, max_length: int = 256,
                heads: int = 30, head_dim: int = 128,
                num_registers: int = 128, trim: bool = True):
    """Prompt(s) -> (caption_embeddings (B, L', hidden), mask or None).

    The LTX-2 conditioning stack end to end: tokenize (left pad) ->
    Gemma3 all-hidden-states -> per-layer masked normalize + aggregate
    projection (`gemma_params['feature_extractor']`) -> Embeddings1DConnector
    (registers replace padding) -> optional padded-span trim."""
    ids, mask = gemma_tokenize(prompts, tokenizer_path, max_length)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    hiddens = gemma3_encode(gemma_params, ids, mask, cfg,
                            all_hidden_states=True)
    feats = gemma_feature_extract(gemma_params["feature_extractor"],
                                  hiddens, mask)
    out, out_mask = connector_apply(connector_params, feats, mask,
                                    heads, head_dim,
                                    num_registers=num_registers)
    if trim and out_mask is not None:
        return trim_padded(out, out_mask)
    return out, out_mask


# ---------------------------------------------------------------------------
# Checkpoint import (HF Gemma-3 layout; LTX-2 connector layout)
# ---------------------------------------------------------------------------

def gemma_params_from_state_dict(sd, cfg: Gemma3Config, dtype=jnp.bfloat16):
    """HF Gemma3 text-model state dict -> param tree.

    Accepts both bare `model.*` (Gemma3TextModel) and
    `language_model.model.*` (Gemma3ForConditionalGeneration — the LTX-2
    loading path, base_encoder.py:6) key layouts. Linear weights are stored
    (out, in) in torch; transposed to (in, out) here."""
    pre = ("language_model.model."
           if any(k.startswith("language_model.model.") for k in sd)
           else "model.")

    def t(name):
        return jnp.asarray(sd[pre + name], dtype).T

    def vec(name):
        return jnp.asarray(sd[pre + name], dtype)

    def blk(i):
        b = f"layers.{i}."
        return {
            "input_norm": vec(b + "input_layernorm.weight"),
            "attn": {
                "q": t(b + "self_attn.q_proj.weight"),
                "k": t(b + "self_attn.k_proj.weight"),
                "v": t(b + "self_attn.v_proj.weight"),
                "o": t(b + "self_attn.o_proj.weight"),
                "q_norm": vec(b + "self_attn.q_norm.weight"),
                "k_norm": vec(b + "self_attn.k_norm.weight"),
            },
            "post_attn_norm": vec(b + "post_attention_layernorm.weight"),
            "pre_ffn_norm": vec(b + "pre_feedforward_layernorm.weight"),
            "mlp": {"gate": t(b + "mlp.gate_proj.weight"),
                    "up": t(b + "mlp.up_proj.weight"),
                    "down": t(b + "mlp.down_proj.weight")},
            "post_ffn_norm": vec(b + "post_feedforward_layernorm.weight"),
        }

    params = {
        "embed": vec("embed_tokens.weight"),
        "blocks": [blk(i) for i in range(cfg.num_layers)],
        "final_norm": vec("norm.weight"),
    }
    fe_key = "feature_extractor_linear.aggregate_embed.weight"
    if fe_key in sd:
        params["feature_extractor"] = {
            "aggregate_embed": jnp.asarray(sd[fe_key], dtype).T}
    return params


def connector_params_from_state_dict(sd, num_layers: int = 2,
                                     dtype=jnp.bfloat16):
    """Embeddings1DConnector state dict -> param tree
    (embeddings_connector.py:113-129: `transformer_1d_blocks.{i}` with
    attn1.to_{q,k,v}/to_out.0 biased linears + attn1.{q,k}_norm RMS weights
    (attention.py:166-173), ff.net.0.proj / ff.net.2 biased GELU-tanh MLP
    (feed_forward.py), `learnable_registers`; the block rms_norms are
    parameterless — nothing to import for them)."""
    def lin(name):
        p = {"w": jnp.asarray(sd[name + ".weight"], dtype).T}
        if name + ".bias" in sd:
            p["b"] = jnp.asarray(sd[name + ".bias"], dtype)
        return p

    def blk(i):
        b = f"transformer_1d_blocks.{i}."
        return {
            "to_q": lin(b + "attn1.to_q"),
            "to_k": lin(b + "attn1.to_k"),
            "to_v": lin(b + "attn1.to_v"),
            "to_out": lin(b + "attn1.to_out.0"),
            "q_norm": jnp.asarray(sd[b + "attn1.q_norm.weight"], dtype),
            "k_norm": jnp.asarray(sd[b + "attn1.k_norm.weight"], dtype),
            "ff": {"fc1": lin(b + "ff.net.0.proj"),
                   "fc2": lin(b + "ff.net.2")},
        }

    p = {"blocks": [blk(i) for i in range(num_layers)]}
    if "learnable_registers" in sd:
        p["registers"] = jnp.asarray(sd["learnable_registers"], dtype)
    return p
