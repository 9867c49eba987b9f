"""Wan 3D causal VAE — TPU-native functional implementation.

Behavioral reference: rcm/tokenizers/wan2pt1.py (WanVAE_, Encoder3d,
Decoder3d, CausalConv3d with 2-frame temporal cache, Resample with time_conv
caching, chunked streaming encode window=4 / frame-chunked decode).

TPU-first redesign: the reference threads a mutable `feat_cache` list of
tensors through every causal conv (wan2pt1.py:47-55,106-151). Here the cache
is an explicit pytree (dict keyed by construction-order op index) carried
through `jax.lax.scan` over temporal chunks, so the whole streaming decode
compiles to two XLA programs (first chunk + steady-state chunk) with static
shapes.

Semantics preserved exactly:
  * CausalConv3d(k_t=3): each chunk sees [cache(2 frames), chunk]; cache is
    the last 2 frames of the raw input stream; the first chunk's zero cache
    equals the reference's 2-frame zero padding.
  * upsample3d time_conv 'Rep' rule (wan2pt1.py:109-135): latent frame 0
    bypasses temporal upsampling entirely (1 output frame) and is *excluded*
    from the time_conv input stream — the second chunk convolves over
    [0, 0, x1]. Hence T_pixel = 1 + 4*(T_latent-1).
  * downsample3d: first chunk passes through; later chunks prepend the cached
    last frame and stride-2 convolve (wan2pt1.py:139-151).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

CACHE_T = 2

# Per-channel latent normalization constants (rcm/tokenizers/wan2pt1.py:607-645)
LATENT_MEAN = [
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
]
LATENT_STD = [
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
]


@dataclass(frozen=True)
class VAEConfig:
    """_video_vae defaults (wan2pt1.py:563-580)."""
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    temporal_window: int = 4
    dtype: Any = jnp.bfloat16

    @property
    def temporal_upsample(self) -> Tuple[bool, ...]:
        return self.temporal_downsample[::-1]

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)

    @property
    def temporal_factor(self) -> int:
        return 2 ** sum(self.temporal_downsample)


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

def _fast_params(tree):
    """One-time weight relayout for the channels-last fast path: torch
    (O, I, kt, kh, kw) -> (kt, kh, kw, I, O) and (O, I, kh, kw) ->
    (kh, kw, I, O). Runs outside the scan, so the transposes happen once
    per call, not per chunk. Checkpoints/init stay in torch layout."""
    def fix(d):
        if isinstance(d, dict):
            out = {}
            for k, v in d.items():
                if isinstance(v, dict) and "w" in v and v["w"] is not None \
                        and getattr(v["w"], "ndim", 0) in (4, 5):
                    w = v["w"]
                    perm = (2, 3, 4, 1, 0) if w.ndim == 5 else (2, 3, 1, 0)
                    out[k] = {**v, "w": jnp.transpose(w, perm)}
                else:
                    out[k] = fix(v)
            return out
        if isinstance(d, list):
            return [fix(v) for v in d]
        return d
    return fix(tree)


def _pad_decoder_c96(dec, head=False):
    """Zero-pad every 96-channel decoder tensor to 128 lanes (the MXU lane
    width). Opt-in (TDX_VAE_PAD128=1): the per-tap conv win is real
    (55.0 -> 46.9 ms on-chip, scripts_dev/probe_vae_pad128_2dtap.py) but
    the END-TO-END decode loses (3.298 s vs 3.213 s, bench r5): the finest
    stage's norm/residual/cache elementwise traffic grows 4/3x with the
    padded channels and outweighs the ~146 ms of conv savings. Kept as a
    measured experiment: a consumer that is conv-dominated at C=96 (e.g.
    batched decode) can flip it on.

    Exactness: padded input channels are identically zero (zero weight rows
    + zero bias), so conv outputs and the channel-RMS statistic are
    unchanged; the norm's sqrt(C) factor is corrected by folding
    sqrt(96/128) into the padded gamma (kept fp32 so the fold costs no
    precision). Runs on the channels-last fast layout, once per call."""
    def pad_w(w):
        # (kh, kw, I, O) or (kt, kh, kw, I, O)
        cfg = [(0, 0)] * w.ndim
        changed = False
        for ax in (w.ndim - 2, w.ndim - 1):
            if w.shape[ax] == 96:
                cfg[ax] = (0, 32)
                changed = True
        return jnp.pad(w, cfg) if changed else w

    def fix(d):
        if isinstance(d, dict):
            out = {}
            for k, v in d.items():
                isarr = getattr(v, "ndim", None) is not None
                if isarr and k == "gamma" and v.shape[0] == 96:
                    g = v.astype(jnp.float32) * float(np.sqrt(96 / 128))
                    out[k] = jnp.pad(g, [(0, 32)] + [(0, 0)] * (v.ndim - 1))
                elif isarr and k == "w":
                    out[k] = pad_w(v)
                elif isarr and k == "b" and v.shape[-1] == 96:
                    out[k] = jnp.pad(v, (0, 32))
                else:
                    out[k] = fix(v)
            return out
        if isinstance(d, list):
            return [fix(v) for v in d]
        return d
    return fix(dec)


def _conv2d_cl(w, b, x, stride=(1, 1), pad="same"):
    """NHWC conv; w: (kh, kw, I, O). pad='same' centers odd kernels."""
    kh, kw = w.shape[0], w.shape[1]
    padding = ([(kh // 2, kh // 2), (kw // 2, kw // 2)] if pad == "same"
               else pad)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), stride, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def _conv3d_cl(p, x, t_stride: int = 1):
    """Channels-last 3D conv as kt temporal-tap 2D NHWC convs summed.

    x: (B, T2, H, W, C) with the temporal extent ALREADY padded/cached
    (T2 = kt - t_stride + T_out * t_stride); w: (kt, kh, kw, I, O).
    The TPU conv unit runs the 2D taps ~1.5x faster than the equivalent
    volumetric conv (measured 28 vs 43 ms for 16x480x832x96->96), and the
    temporal slices are views in this layout — no transpose per tap."""
    w, b = p["w"], p["b"]
    kt = w.shape[0]
    B, T2, H, W, C = x.shape
    T_out = (T2 - kt) // t_stride + 1
    acc = None
    for dt in range(kt):
        xs = x[:, dt:dt + (T_out - 1) * t_stride + 1:t_stride]
        xs = xs.reshape(B * T_out, H, W, C)
        y = _conv2d_cl(w[dt], None, xs)
        acc = y if acc is None else acc + y
    acc = acc + b.astype(x.dtype)
    return acc.reshape(B, T_out, *acc.shape[1:])


def _conv1_cl(p, x):
    """1x1x1 conv = channel matmul. w: (1, 1, 1, I, O) or (1, 1, I, O)."""
    w = p["w"]
    w2 = w.reshape(w.shape[-2], w.shape[-1])
    return jnp.matmul(x, w2.astype(x.dtype)) + p["b"].astype(x.dtype)


def _channel_rms_norm(x, gamma, scale_dim):
    """VAE RMS_norm (wan2pt1.py:58-71): F.normalize over channels (last dim
    here) times sqrt(C) times gamma."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    y = xf / jnp.maximum(norm, 1e-12) * (scale_dim ** 0.5)
    g = gamma.astype(jnp.float32).reshape(-1)
    return (y * g).astype(x.dtype)


class _CacheIO:
    """Construction-order cache registry ≡ the reference's feat_idx walk.
    Cached tensors are channels-last (B, F, H, W, C)."""

    def __init__(self, cache: Optional[Dict[str, Any]], first: bool):
        self.cache = {} if cache is None else dict(cache)
        self.first = first
        self.counter = 0

    def pull(self, frames: int, like):
        """Return the cached tensor for the next stateful op (zeros on the
        first chunk) and its key."""
        key = f"c{self.counter}"
        self.counter += 1
        if self.first:
            B, _, H, W, C = like.shape
            val = jnp.zeros((B, frames, H, W, C), like.dtype)
        else:
            val = self.cache[key]
        return key, val

    def push(self, key, val):
        self.cache[key] = val


def _conv_fused_or_taps(p, x_in, t_stride: int, pre=None, gamma=None,
                        residual=None):
    """x_in: temporally extended input. XLA direct conv with the norm/silu
    applied in-graph — XLA's own fusion beats every hand kernel tried here:
    Pallas implicit GEMM (r3: 6.4 s vs 3.2 s decode), Winograd F(2,3)
    (r3: ~2x slower per hot stage), and the Pallas norm+SiLU pre-pass
    (r4 fetch-synced A/B: 4.28 s vs 3.22 s — it added an HBM round trip
    XLA would have fused into the conv). Those kernels were deleted in r4;
    per-stage XLA-vs-Pallas numbers live in scripts_dev/probe_conv_stage.py
    history and ROADMAP.md."""
    if pre == "norm_silu":
        x_in = jax.nn.silu(_channel_rms_norm(x_in, gamma, x_in.shape[-1]))
    out = _conv3d_cl(p, x_in, t_stride=t_stride)
    if residual is not None:
        out = out + residual
    return out


def _causal_conv3d(p, x, io: _CacheIO, t_stride: int = 1, pre=None,
                   gamma=None, residual=None):
    """CausalConv3d with 2-frame temporal cache (wan2pt1.py:37-55).
    x: (B, T, H, W, C). pre="norm_silu" fuses the ResidualBlock's
    norm+SiLU into the conv (the cache then holds RAW frames — numerically
    identical, the norm is per-frame pointwise)."""
    if p["w"].shape[0] > 1:
        key, cache = io.pull(CACHE_T, x)
        x_in = jnp.concatenate([cache, x], axis=1)
        io.push(key, x_in[:, -CACHE_T:])
        return _conv_fused_or_taps(p, x_in, t_stride, pre=pre, gamma=gamma,
                                   residual=residual)
    return _conv_fused_or_taps(p, x, t_stride, pre=pre, gamma=gamma,
                               residual=residual)


def _resblock(p, x, io: _CacheIO):
    """ResidualBlock (wan2pt1.py:180-215): RMS->SiLU->conv ->RMS->SiLU->conv
    + shortcut. Norm+SiLU and the residual add ride the fused conv kernel
    on TPU (the cache stores raw frames; norm is per-frame pointwise, so
    normed(cache) is identical either way)."""
    h = _causal_conv3d(p["conv1"], x, io, pre="norm_silu",
                       gamma=p["norm1"]["gamma"])
    short = x if p.get("shortcut") is None else _conv1_cl(p["shortcut"], x)
    return _causal_conv3d(p["conv2"], h, io, pre="norm_silu",
                          gamma=p["norm2"]["gamma"], residual=short)


def _attn_block(p, x):
    """Single-head per-frame spatial attention (wan2pt1.py:218-248).
    x: (B, T, H, W, C)."""
    B, T, H, W, C = x.shape
    h = _channel_rms_norm(x, p["norm"]["gamma"], C)
    qkv = _conv1_cl(p["to_qkv"], h)                       # (B,T,H,W,3C)
    qkv = qkv.reshape(B * T, H * W, 3 * C)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    logits = jnp.einsum("nld,nmd->nlm", q, k,
                        preferred_element_type=jnp.float32) * (C ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("nlm,nmd->nld", probs, v).reshape(B, T, H, W, C)
    return x + _conv1_cl(p["proj"], o)


def _spatial_upsample(p, x):
    """nearest-exact 2x + Conv2d(dim, dim//2, 3) (wan2pt1.py:93-96)."""
    B, T, H, W, C = x.shape
    h = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    h = _conv2d_cl(p["conv"]["w"], p["conv"]["b"],
                   h.reshape(B * T, 2 * H, 2 * W, C))
    return h.reshape(B, T, 2 * H, 2 * W, -1)


def _spatial_downsample(p, x):
    """ZeroPad2d((0,1,0,1)) + Conv2d(dim, dim, 3, stride 2) (wan2pt1.py:99-102)."""
    B, T, H, W, C = x.shape
    h = x.reshape(B * T, H, W, C)
    h = _conv2d_cl(p["conv"]["w"], p["conv"]["b"], h, stride=(2, 2),
                   pad=[(0, 1), (0, 1)])
    return h.reshape(B, T, *h.shape[1:])


def _upsample3d(p, x, io: _CacheIO):
    """Resample upsample3d (wan2pt1.py:96,109-135): temporal doubling via a
    2C-channel causal conv + interleave, then spatial 2x. First chunk bypasses
    the temporal conv entirely ('Rep' rule)."""
    B, T, H, W, C = x.shape
    key, cache = io.pull(CACHE_T, x)
    if not io.first:
        x_in = jnp.concatenate([cache, x], axis=1)
        io.push(key, x_in[:, -CACHE_T:])
        y = _conv3d_cl(p["time_conv"], x_in)              # (B, T, H, W, 2C)
        x = jnp.stack([y[..., :C], y[..., C:]], axis=2
                      ).reshape(B, 2 * T, H, W, C)
    else:
        # frame 0 is excluded from the time_conv stream; cache stays zeros
        io.push(key, cache)
    return _spatial_upsample(p, x)


def _downsample3d(p, x, io: _CacheIO):
    """Resample downsample3d (wan2pt1.py:99-102,139-151): spatial stride-2
    first, then stride-2 temporal causal conv with a 1-frame cache. The first
    chunk passes through untouched."""
    x = _spatial_downsample(p, x)
    key = f"c{io.counter}"
    io.counter += 1
    if io.first:
        io.push(key, x[:, -1:])
        return x
    cache = io.cache[key]
    x_in = jnp.concatenate([cache, x], axis=1)
    io.push(key, x[:, -1:])
    return _conv3d_cl(p["time_conv"], x_in, t_stride=2)


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

def decoder_apply(params, x, cache: Optional[Dict], first: bool):
    """Decoder3d over one latent chunk (wan2pt1.py:344-435). Returns
    (pixels, new_cache)."""
    io = _CacheIO(cache, first)
    h = _causal_conv3d(params["conv1"], x, io)
    for blk in params["middle"]:
        h = _attn_block(blk, h) if "to_qkv" in blk else _resblock(blk, h, io)
    for layer in params["upsamples"]:
        # layer kind is encoded in the dict structure (pytree-static):
        # res blocks have norm1, temporal resamples have time_conv.
        if "norm1" in layer:
            h = _resblock(layer, h, io)
        elif "time_conv" in layer:
            h = _upsample3d(layer, h, io)
        else:
            h = _spatial_upsample(layer, h)
    h = _causal_conv3d(params["head_conv"], h, io, pre="norm_silu",
                       gamma=params["head_norm"]["gamma"])
    return h, io.cache


def encoder_apply(params, x, cache: Optional[Dict], first: bool):
    """Encoder3d over one pixel chunk (wan2pt1.py:250-345)."""
    io = _CacheIO(cache, first)
    h = _causal_conv3d(params["conv1"], x, io)
    for layer in params["downsamples"]:
        if "norm1" in layer:
            h = _resblock(layer, h, io)
        elif "time_conv" in layer:
            h = _downsample3d(layer, h, io)
        else:
            h = _spatial_downsample(layer, h)
    for blk in params["middle"]:
        h = _attn_block(blk, h) if "to_qkv" in blk else _resblock(blk, h, io)
    h = _causal_conv3d(params["head_conv"], h, io, pre="norm_silu",
                       gamma=params["head_norm"]["gamma"])
    return h, io.cache


# ---------------------------------------------------------------------------
# Streaming encode / decode (scan over chunks)
# ---------------------------------------------------------------------------

def _latent_scale():
    mean = jnp.asarray(LATENT_MEAN, jnp.float32)[None, :, None, None, None]
    std = jnp.asarray(LATENT_STD, jnp.float32)[None, :, None, None, None]
    return mean, std


def _auto_chunk(T_rest: int, h: int, w: int) -> int:
    """Largest latent-frame chunk that divides the stream and keeps the
    stage-3 activations (~chunk * 4 frames * 64hw * 96ch bf16) under ~1.5 GB
    — per-step overhead dominates at chunk=1 (measured 6.4 s vs 3.25 s at
    chunk=4, 480p/81f)."""
    if T_rest == 0:
        return 1
    budget = int(1.5e9)
    for c in (8, 5, 4, 2):
        if T_rest % c == 0 and c * 4 * 64 * h * w * 96 * 2 <= budget:
            return c
    return 1


def vae_decode(params, z, chunk: Optional[int] = None):
    """Normalized latent (B, 16, T_lat, h, w) -> video (B, 3, 1+4*(T_lat-1),
    8h, 8w) in [-1, 1]. Streams `chunk` latent frames per scan step
    (reference decodes frame-by-frame, wan2pt1.py:520-537; chunk=None
    auto-picks). Channels-last internally; the weight relayout happens once,
    outside the scan."""
    if chunk is None:
        chunk = _auto_chunk(z.shape[2] - 1, z.shape[3], z.shape[4])
    pad128 = os.environ.get("TDX_VAE_PAD128", "0") == "1"
    return _vae_decode(params, z, chunk, pad128)


@functools.partial(jax.jit, static_argnames=("chunk", "pad128"))
def _vae_decode(params, z, chunk: int = 1, pad128: bool = False):
    mean, std = _latent_scale()
    z = z.astype(jnp.float32) * std + mean
    dtype = params["conv2"]["w"].dtype
    params = _fast_params(params)
    if pad128:
        params["decoder"] = _pad_decoder_c96(params["decoder"])
    x = jnp.moveaxis(z.astype(dtype), 1, -1)            # (B, T, h, w, C)
    x = _conv1_cl(params["conv2"], x)                   # 1x1x1 (z -> z)

    first, rest = x[:, :1], x[:, 1:]
    out0, cache = decoder_apply(params["decoder"], first, None, first=True)

    T_rest = rest.shape[1]
    if T_rest == 0:
        return jnp.moveaxis(out0, -1, 1).astype(jnp.float32)
    n_chunks = T_rest // chunk
    assert n_chunks * chunk == T_rest, \
        f"T_lat-1={T_rest} must be divisible by chunk={chunk}"
    frames = jnp.moveaxis(
        rest.reshape(rest.shape[0], n_chunks, chunk, *rest.shape[2:]),
        1, 0)                                           # (n, B, chunk, h, w, C)

    def body(cache, fr):
        out, cache = decoder_apply(params["decoder"], fr, cache, first=False)
        return cache, out

    _, outs = jax.lax.scan(body, cache, frames)
    rest_out = rearrange(outs, "n b t h w c -> b (n t) h w c")
    out = jnp.concatenate([out0, rest_out], axis=1)
    return jnp.moveaxis(out, -1, 1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=())
def vae_encode(params, video):
    """Video (B, 3, T, H, W) in [-1,1] -> normalized latent
    (B, 16, 1+(T-1)/4, H/8, W/8). Streams the reference's window of 4 pixel
    frames per step after the first frame (wan2pt1.py:479-510)."""
    window = 4
    dtype = params["encoder"]["conv1"]["w"].dtype
    params = _fast_params(params)
    x = jnp.moveaxis(video.astype(dtype), 1, -1)        # (B, T, H, W, 3)
    T = x.shape[1]
    assert (T - 1) % window == 0, f"(T-1) must be divisible by {window}"

    out0, cache = encoder_apply(params["encoder"], x[:, :1], None,
                                first=True)
    n_chunks = (T - 1) // window
    if n_chunks > 0:
        rest = x[:, 1:]
        frames = jnp.moveaxis(
            rest.reshape(rest.shape[0], n_chunks, window, *rest.shape[2:]),
            1, 0)

        def body(cache, fr):
            out, cache = encoder_apply(params["encoder"], fr, cache,
                                       first=False)
            return cache, out

        _, outs = jax.lax.scan(body, cache, frames)
        out = jnp.concatenate(
            [out0, rearrange(outs, "n b t h w c -> b (n t) h w c")], axis=1)
    else:
        out = out0

    moments = _conv1_cl(params["conv1"], out)           # 1x1x1 (2z -> 2z)
    mu = moments[..., :moments.shape[-1] // 2]
    mu = jnp.moveaxis(mu, -1, 1)                        # (B, z, T, h, w)
    mean, std = _latent_scale()
    return ((mu.astype(jnp.float32) - mean) / std)


# ---------------------------------------------------------------------------
# Parameter construction (random init; checkpoint import in utils/checkpoint)
# ---------------------------------------------------------------------------

def _conv_init(key, o, i, k, dtype):
    fan_in = i * int(np.prod(k))
    w = jax.random.normal(key, (o, i, *k)) * (1.0 / np.sqrt(fan_in))
    return {"w": w.astype(dtype), "b": jnp.zeros((o,), dtype)}


def _res_init(keys, c_in, c_out, dtype):
    p = {
        "norm1": {"gamma": jnp.ones((c_in, 1, 1, 1), dtype)},
        "conv1": _conv_init(next(keys), c_out, c_in, (3, 3, 3), dtype),
        "norm2": {"gamma": jnp.ones((c_out, 1, 1, 1), dtype)},
        "conv2": _conv_init(next(keys), c_out, c_out, (3, 3, 3), dtype),
    }
    p["shortcut"] = (_conv_init(next(keys), c_out, c_in, (1, 1, 1), dtype)
                     if c_in != c_out else None)
    return p


def _attn_init(keys, c, dtype):
    return {
        "norm": {"gamma": jnp.ones((c, 1, 1), dtype)},
        "to_qkv": _conv_init(next(keys), 3 * c, c, (1, 1), dtype),
        "proj": _conv_init(next(keys), c, c, (1, 1), dtype),
    }


def init_vae_params(key, cfg: VAEConfig = VAEConfig()):
    """Random VAE params with the reference topology (wan2pt1.py:250-473)."""
    dtype = cfg.dtype
    keys = iter(jax.random.split(key, 256))
    d, z = cfg.dim, cfg.z_dim

    # ---------------- encoder ----------------
    dims = [d * u for u in (1,) + tuple(cfg.dim_mult)]
    enc_layers: List[dict] = []
    for i, (c_in, c_out) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfg.num_res_blocks):
            enc_layers.append(_res_init(keys, c_in, c_out, dtype))
            c_in = c_out
        if i != len(cfg.dim_mult) - 1:
            if cfg.temporal_downsample[i]:
                enc_layers.append({
                    "conv": _conv_init(next(keys), c_out, c_out, (3, 3), dtype),
                    "time_conv": _conv_init(next(keys), c_out, c_out,
                                            (3, 1, 1), dtype),
                })
            else:
                enc_layers.append({
                    "conv": _conv_init(next(keys), c_out, c_out, (3, 3), dtype),
                })
    c_top = dims[-1]
    encoder = {
        "conv1": _conv_init(next(keys), dims[0], 3, (3, 3, 3), dtype),
        "downsamples": enc_layers,
        "middle": [_res_init(keys, c_top, c_top, dtype),
                   _attn_init(keys, c_top, dtype),
                   _res_init(keys, c_top, c_top, dtype)],
        "head_norm": {"gamma": jnp.ones((c_top, 1, 1, 1), dtype)},
        "head_conv": _conv_init(next(keys), 2 * z, c_top, (3, 3, 3), dtype),
    }

    # ---------------- decoder ----------------
    ddims = [d * u for u in (cfg.dim_mult[-1],) + tuple(cfg.dim_mult[::-1])]
    dec_layers: List[dict] = []
    for i, (c_in, c_out) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i in (1, 2, 3):
            c_in = c_in // 2
        for _ in range(cfg.num_res_blocks + 1):
            dec_layers.append(_res_init(keys, c_in, c_out, dtype))
            c_in = c_out
        if i != len(cfg.dim_mult) - 1:
            if cfg.temporal_upsample[i]:
                dec_layers.append({
                    "conv": _conv_init(next(keys), c_out // 2, c_out,
                                       (3, 3), dtype),
                    "time_conv": _conv_init(next(keys), 2 * c_out, c_out,
                                            (3, 1, 1), dtype),
                })
            else:
                dec_layers.append({
                    "conv": _conv_init(next(keys), c_out // 2, c_out,
                                       (3, 3), dtype),
                })
    decoder = {
        "conv1": _conv_init(next(keys), ddims[0], z, (3, 3, 3), dtype),
        "middle": [_res_init(keys, ddims[0], ddims[0], dtype),
                   _attn_init(keys, ddims[0], dtype),
                   _res_init(keys, ddims[0], ddims[0], dtype)],
        "upsamples": dec_layers,
        "head_norm": {"gamma": jnp.ones((ddims[-1], 1, 1, 1), dtype)},
        "head_conv": _conv_init(next(keys), 3, ddims[-1], (3, 3, 3), dtype),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "conv1": _conv_init(next(keys), 2 * z, 2 * z, (1, 1, 1), dtype),
        "conv2": _conv_init(next(keys), z, z, (1, 1, 1), dtype),
    }
