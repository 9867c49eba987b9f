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

def _conv3d(p, x, stride=(1, 1, 1), pad=(0, 0, 0)):
    """NCDHW conv with OIDHW weights (torch layout, zero-copy import)."""
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride,
        padding=[(pad[0], pad[0]), (pad[1], pad[1]), (pad[2], pad[2])],
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    return out + p["b"].astype(x.dtype)[None, :, None, None, None]


def _conv2d(p, x, stride=(1, 1), pad=(0, 0)):
    """(B*T, C, H, W) conv, OIHW weights."""
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride,
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["b"].astype(x.dtype)[None, :, None, None]


def _channel_rms_norm(x, gamma, scale_dim):
    """VAE RMS_norm (wan2pt1.py:58-71): F.normalize over the channel dim
    times sqrt(C) times gamma. x: (B, C, ...); gamma broadcast over C."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=1, keepdims=True))
    y = xf / jnp.maximum(norm, 1e-12) * (scale_dim ** 0.5)
    # gamma is stored with torch's trailing-singleton shape ((C,1,1,1) for
    # video, (C,1,1) for per-frame use); align it to the channel axis.
    g = gamma.astype(jnp.float32).reshape(1, -1, *([1] * (x.ndim - 2)))
    return (y * g).astype(x.dtype)


class _CacheIO:
    """Construction-order cache registry ≡ the reference's feat_idx walk."""

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
            B, C, _, H, W = like.shape
            val = jnp.zeros((B, C, frames, H, W), like.dtype)
        else:
            val = self.cache[key]
        return key, val

    def push(self, key, val):
        self.cache[key] = val


def _causal_conv3d(p, x, io: _CacheIO, k=(3, 3, 3), stride=(1, 1, 1)):
    """CausalConv3d with 2-frame temporal cache (wan2pt1.py:37-55)."""
    pt, ph, pw = k[0] // 2, k[1] // 2, k[2] // 2
    if k[0] > 1:
        key, cache = io.pull(CACHE_T, x)
        x_in = jnp.concatenate([cache, x], axis=2)
        io.push(key, x_in[:, :, -CACHE_T:])
        return _conv3d(p, x_in, stride=stride, pad=(0, ph, pw))
    return _conv3d(p, x, stride=stride, pad=(0, ph, pw))


def _resblock(p, x, io: _CacheIO):
    """ResidualBlock (wan2pt1.py:180-215): RMS->SiLU->conv ->RMS->SiLU->conv
    + shortcut."""
    C_in = x.shape[1]
    h = _channel_rms_norm(x, p["norm1"]["gamma"], C_in)
    h = jax.nn.silu(h)
    h = _causal_conv3d(p["conv1"], h, io)
    C_mid = h.shape[1]
    h = _channel_rms_norm(h, p["norm2"]["gamma"], C_mid)
    h = jax.nn.silu(h)
    h = _causal_conv3d(p["conv2"], h, io)
    short = x if p.get("shortcut") is None else _conv3d(p["shortcut"], x)
    return h + short


def _attn_block(p, x):
    """Single-head per-frame spatial attention (wan2pt1.py:218-248)."""
    B, C, T, H, W = x.shape
    h = _channel_rms_norm(x, p["norm"]["gamma"], C)
    h = rearrange(h, "b c t h w -> (b t) c h w")
    qkv = _conv2d(p["to_qkv"], h)                       # (BT, 3C, H, W)
    q, k, v = jnp.split(rearrange(qkv, "n c h w -> n (h w) c"), 3, axis=-1)
    logits = jnp.einsum("nld,nmd->nlm", q, k,
                        preferred_element_type=jnp.float32) * (C ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("nlm,nmd->nld", probs, v)
    o = rearrange(o, "n (h w) c -> n c h w", h=H)
    o = _conv2d(p["proj"], o)
    return x + rearrange(o, "(b t) c h w -> b c t h w", b=B)


def _spatial_upsample(p, x):
    """nearest-exact 2x + Conv2d(dim, dim//2, 3) (wan2pt1.py:93-96)."""
    B, C, T, H, W = x.shape
    h = rearrange(x, "b c t h w -> (b t) c h w")
    h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
    h = _conv2d(p["conv"], h, pad=(1, 1))
    return rearrange(h, "(b t) c h w -> b c t h w", b=B)


def _spatial_downsample(p, x):
    """ZeroPad2d((0,1,0,1)) + Conv2d(dim, dim, 3, stride 2) (wan2pt1.py:99-102)."""
    B, C, T, H, W = x.shape
    h = rearrange(x, "b c t h w -> (b t) c h w")
    h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 1)))
    h = jax.lax.conv_general_dilated(
        h, p["conv"]["w"].astype(h.dtype), window_strides=(2, 2),
        padding=[(0, 0), (0, 0)], dimension_numbers=("NCHW", "OIHW", "NCHW"))
    h = h + p["conv"]["b"].astype(h.dtype)[None, :, None, None]
    return rearrange(h, "(b t) c h w -> b c t h w", b=B)


def _upsample3d(p, x, io: _CacheIO):
    """Resample upsample3d (wan2pt1.py:96,109-135): temporal doubling via a
    2C-channel causal conv + interleave, then spatial 2x. First chunk bypasses
    the temporal conv entirely ('Rep' rule)."""
    B, C, T, H, W = x.shape
    key, cache = io.pull(CACHE_T, x)
    if not io.first:
        x_in = jnp.concatenate([cache, x], axis=2)
        io.push(key, x_in[:, :, -CACHE_T:])
        y = _conv3d(p["time_conv"], x_in)               # (B, 2C, T, H, W)
        y = y.reshape(B, 2, C, T, H, W)
        x = jnp.stack([y[:, 0], y[:, 1]], axis=3).reshape(B, C, 2 * T, H, W)
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
        io.push(key, x[:, :, -1:])
        return x
    cache = io.cache[key]
    x_in = jnp.concatenate([cache, x], axis=2)
    io.push(key, x[:, :, -1:])
    return _conv3d(p["time_conv"], x_in, stride=(2, 1, 1))


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
    h = _channel_rms_norm(h, params["head_norm"]["gamma"], h.shape[1])
    h = jax.nn.silu(h)
    h = _causal_conv3d(params["head_conv"], h, io)
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
    h = _channel_rms_norm(h, params["head_norm"]["gamma"], h.shape[1])
    h = jax.nn.silu(h)
    h = _causal_conv3d(params["head_conv"], h, io)
    return h, io.cache


# ---------------------------------------------------------------------------
# Streaming encode / decode (scan over chunks)
# ---------------------------------------------------------------------------

def _latent_scale():
    mean = jnp.asarray(LATENT_MEAN, jnp.float32)[None, :, None, None, None]
    std = jnp.asarray(LATENT_STD, jnp.float32)[None, :, None, None, None]
    return mean, std


@functools.partial(jax.jit, static_argnames=("chunk",))
def vae_decode(params, z, chunk: int = 1):
    """Normalized latent (B, 16, T_lat, h, w) -> video (B, 3, 1+4*(T_lat-1),
    8h, 8w) in [-1, 1]. Streams `chunk` latent frames per scan step
    (reference decodes frame-by-frame, wan2pt1.py:520-537)."""
    mean, std = _latent_scale()
    z = z.astype(jnp.float32) * std + mean
    dtype = params["conv2"]["w"].dtype
    z = z.astype(dtype)
    x = _conv3d(params["conv2"], z)                     # 1x1x1 (z -> z)

    first, rest = x[:, :, :1], x[:, :, 1:]
    out0, cache = decoder_apply(params["decoder"], first, None, first=True)

    T_rest = rest.shape[2]
    if T_rest == 0:
        return out0.astype(jnp.float32)
    n_chunks = T_rest // chunk
    assert n_chunks * chunk == T_rest, \
        f"T_lat-1={T_rest} must be divisible by chunk={chunk}"
    frames = jnp.moveaxis(
        rest.reshape(rest.shape[0], rest.shape[1], n_chunks, chunk,
                     *rest.shape[3:]), 2, 0)            # (n, B, C, chunk, h, w)

    def body(cache, fr):
        out, cache = decoder_apply(params["decoder"], fr, cache, first=False)
        return cache, out

    _, outs = jax.lax.scan(body, cache, frames)
    rest_out = rearrange(outs, "n b c t h w -> b c (n t) h w")
    return jnp.concatenate([out0, rest_out], axis=2).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=())
def vae_encode(params, video):
    """Video (B, 3, T, H, W) in [-1,1] -> normalized latent
    (B, 16, 1+(T-1)/4, H/8, W/8). Streams the reference's window of 4 pixel
    frames per step after the first frame (wan2pt1.py:479-510)."""
    window = 4
    dtype = params["encoder"]["conv1"]["w"].dtype
    x = video.astype(dtype)
    T = x.shape[2]
    assert (T - 1) % window == 0, f"(T-1) must be divisible by {window}"

    out0, cache = encoder_apply(params["encoder"], x[:, :, :1], None,
                                first=True)
    n_chunks = (T - 1) // window
    if n_chunks > 0:
        rest = x[:, :, 1:]
        frames = jnp.moveaxis(
            rest.reshape(rest.shape[0], rest.shape[1], n_chunks, window,
                         *rest.shape[3:]), 2, 0)

        def body(cache, fr):
            out, cache = encoder_apply(params["encoder"], fr, cache,
                                       first=False)
            return cache, out

        _, outs = jax.lax.scan(body, cache, frames)
        out = jnp.concatenate(
            [out0, jnp.moveaxis(outs, 0, 2).reshape(
                out0.shape[0], out0.shape[1], -1, *out0.shape[3:])], axis=2)
    else:
        out = out0

    moments = _conv3d(params["conv1"], out)             # 1x1x1 (2z -> 2z)
    mu = moments[:, :params["conv1"]["w"].shape[0] // 2]
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
