"""LTX-2 video VAE — functional JAX implementation (standard config).

Behavioral reference: ltx-core model/video_vae/ (video_vae.py VideoEncoder/
VideoDecoder, sampling.py SpaceToDepthDownsample/DepthToSpaceUpsample,
resnet.py ResnetBlock3D with PixelNorm, ops.py PerChannelStatistics,
tiling.py spatial tiling). Standard LTX configuration (video_vae.py:150-156):

    patch_size=4; encoder_blocks = 1x compress_space_res, 1x
    compress_time_res, 2x compress_all_res
    => F' = 1 + (F-1)/8, H' = H/32, W' = W/32, 128 latent channels.

Causality: temporal convs are causal (2-frame left pad); the temporal
space-to-depth duplicates the first frame (sampling.py:39-41) so
F' = 1 + (F-1)/8 holds.

Channel widths per stage are parameterized (`base_channels`, doubling at each
compression); the reference reads them from checkpoint configs, none of which
exist in this environment — import mapping lands with the checkpoints.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange


@dataclass(frozen=True)
class LTXVAEConfig:
    in_channels: int = 3
    latent_channels: int = 128
    patch_size: int = 4
    base_channels: int = 128
    # (block kind, num res layers, channel multiplier after block)
    blocks: Tuple[Tuple[str, int, int], ...] = (
        ("compress_space_res", 2, 2),
        ("compress_time_res", 2, 2),
        ("compress_all_res", 2, 2),
        ("compress_all_res", 2, 1),
    )
    dtype: Any = jnp.bfloat16

    @property
    def spatial_factor(self) -> int:
        f = self.patch_size
        for kind, _, _ in self.blocks:
            if "space" in kind or "all" in kind:
                f *= 2
        return f

    @property
    def temporal_factor(self) -> int:
        f = 1
        for kind, _, _ in self.blocks:
            if "time" in kind or "all" in kind:
                f *= 2
        return f


def ltx_vae_test_config(**kw):
    base = dict(base_channels=8, latent_channels=8, dtype=jnp.float32,
                blocks=(("compress_space_res", 1, 2),
                        ("compress_time_res", 1, 2),
                        ("compress_all_res", 1, 1)))
    base.update(kw)
    return LTXVAEConfig(**base)


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _pixel_norm(x, eps: float = 1e-6):
    """PixelNorm over the channel dim (video_vae normalization.py)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=1, keepdims=True) + eps)).astype(x.dtype)


def _causal_conv3d(p, x, stride=(1, 1, 1)):
    """3x3x3 causal conv: 2-frame temporal left pad, symmetric spatial pad."""
    x = jnp.pad(x, ((0, 0), (0, 0), (2, 0), (1, 1), (1, 1)))
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride,
        padding=[(0, 0)] * 3, dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    return out + p["b"].astype(x.dtype)[None, :, None, None, None]


def _conv1(p, x):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1, 1, 1),
        padding=[(0, 0)] * 3, dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    return out + p["b"].astype(x.dtype)[None, :, None, None, None]


def _resblock(p, x):
    """ResnetBlock3D, pixel-norm variant (resnet.py:24-121)."""
    h = _causal_conv3d(p["conv1"], jax.nn.silu(_pixel_norm(x)))
    h = _causal_conv3d(p["conv2"], jax.nn.silu(_pixel_norm(h)))
    if p.get("shortcut") is not None:
        x = _conv1(p["shortcut"], x)
    return x + h


def _space_to_depth_down(p, x, stride):
    """SpaceToDepthDownsample (sampling.py:12-66): causal first-frame
    duplication, conv to C_out/prod(stride), space-to-depth, mean-group skip."""
    st, sh, sw = stride
    if st == 2:
        x = jnp.concatenate([x[:, :, :1], x], axis=2)
    s2d = lambda y: rearrange(
        y, "b c (d p1) (h p2) (w p3) -> b (c p1 p2 p3) d h w",
        p1=st, p2=sh, p3=sw)
    out_ch = p["conv"]["w"].shape[0] * st * sh * sw
    group = x.shape[1] * st * sh * sw // out_ch
    x_in = s2d(x)
    x_in = x_in.reshape(x_in.shape[0], out_ch, group, *x_in.shape[2:]).mean(2)
    h = _causal_conv3d(p["conv"], x)
    return s2d(h) + x_in


def _depth_to_space_up(p, x, stride):
    """DepthToSpaceUpsample, residual variant (sampling.py:68-124)."""
    st, sh, sw = stride
    d2s = lambda y: rearrange(
        y, "b (c p1 p2 p3) d h w -> b c (d p1) (h p2) (w p3)",
        p1=st, p2=sh, p3=sw)
    # residual path: depth-to-space the input, repeated to out channels
    out_ch = p["conv"]["w"].shape[0] // (st * sh * sw)
    num_repeat = out_ch * st * sh * sw // x.shape[1]
    x_in = d2s(jnp.tile(x, (1, num_repeat, 1, 1, 1)) if num_repeat > 1 else x)
    if st == 2:
        x_in = x_in[:, :, 1:]
    h = d2s(_causal_conv3d(p["conv"], x))
    if st == 2:
        h = h[:, :, 1:]
    return h + x_in


def _stride_of(kind: str) -> Tuple[int, int, int]:
    if "all" in kind:
        return (2, 2, 2)
    if "time" in kind:
        return (2, 1, 1)
    if "space" in kind:
        return (1, 2, 2)
    return (1, 1, 1)


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------

def ltx_vae_encode(params, cfg: LTXVAEConfig, video):
    """(B, 3, 1+8k, H, W) in [-1,1] -> normalized latent
    (B, 128, 1+k, H/32, W/32)."""
    ps = cfg.patch_size
    x = rearrange(video.astype(cfg.dtype),
                  "b c d (h p2) (w p3) -> b (c p2 p3) d h w", p2=ps, p3=ps)
    x = _causal_conv3d(params["conv_in"], x)
    for blk, (kind, n_layers, _) in zip(params["down_blocks"], cfg.blocks):
        for rp in blk["res"]:
            x = _resblock(rp, x)
        x = _space_to_depth_down(blk["down"], x, _stride_of(kind))
    x = jax.nn.silu(_pixel_norm(x))
    moments = _causal_conv3d(params["conv_out"], x)
    mu = moments[:, :cfg.latent_channels].astype(jnp.float32)
    # per-channel statistics normalization (ops.py:63-90)
    stats = params["per_channel_statistics"]
    return (mu - stats["mean"][None, :, None, None, None]) / \
        stats["std"][None, :, None, None, None]


def ltx_vae_decode(params, cfg: LTXVAEConfig, latent):
    """Normalized latent -> video (B, 3, 1+8k, H, W)."""
    stats = params["per_channel_statistics"]
    z = latent.astype(jnp.float32) * stats["std"][None, :, None, None, None] \
        + stats["mean"][None, :, None, None, None]
    x = _causal_conv3d(params["conv_in"], z.astype(cfg.dtype))
    for blk, (kind, n_layers, _) in zip(params["up_blocks"],
                                        reversed(cfg.blocks)):
        x = _depth_to_space_up(blk["up"], x, _stride_of(kind))
        for rp in blk["res"]:
            x = _resblock(rp, x)
    x = jax.nn.silu(_pixel_norm(x))
    x = _causal_conv3d(params["conv_out"], x)
    ps = cfg.patch_size
    return rearrange(x, "b (c p2 p3) d h w -> b c d (h p2) (w p3)",
                     p2=ps, p3=ps).astype(jnp.float32)


def ltx_vae_decode_tiled(params, cfg: LTXVAEConfig, latent,
                         tile: int = 16, overlap: int = 2):
    """Spatially tiled decode with linear blending (tiling.py) — bounds the
    full-resolution activation footprint for large frames."""
    B, C, T, H, W = latent.shape
    if H <= tile and W <= tile:
        return ltx_vae_decode(params, cfg, latent)
    sf = cfg.spatial_factor // cfg.patch_size * cfg.patch_size
    step = tile - overlap
    out = None
    weight = None
    for y0 in range(0, max(H - overlap, 1), step):
        for x0 in range(0, max(W - overlap, 1), step):
            y1, x1 = min(y0 + tile, H), min(x0 + tile, W)
            part = ltx_vae_decode(params, cfg, latent[:, :, :, y0:y1, x0:x1])
            if out is None:
                full_h = H * cfg.spatial_factor
                full_w = W * cfg.spatial_factor
                out = np.zeros((B, part.shape[1], part.shape[2],
                                full_h, full_w), np.float32)
                weight = np.zeros((1, 1, 1, full_h, full_w), np.float32)
            py, px = y0 * cfg.spatial_factor, x0 * cfg.spatial_factor
            ph, pw = part.shape[3], part.shape[4]
            out[:, :, :, py:py + ph, px:px + pw] += np.asarray(part)
            weight[:, :, :, py:py + ph, px:px + pw] += 1.0
    return jnp.asarray(out / np.maximum(weight, 1.0))


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _conv_init(key, o, i, k, dtype):
    fan_in = i * int(np.prod(k))
    return {"w": (jax.random.normal(key, (o, i, *k)) / math.sqrt(fan_in)
                  ).astype(dtype),
            "b": jnp.zeros((o,), dtype)}


def _res_init(keys, c_in, c_out, dtype):
    p = {"conv1": _conv_init(next(keys), c_out, c_in, (3, 3, 3), dtype),
         "conv2": _conv_init(next(keys), c_out, c_out, (3, 3, 3), dtype)}
    p["shortcut"] = (_conv_init(next(keys), c_out, c_in, (1, 1, 1), dtype)
                     if c_in != c_out else None)
    return p


def init_ltx_vae(key, cfg: LTXVAEConfig = LTXVAEConfig()):
    """Returns (encoder_params, decoder_params) sharing per-channel stats."""
    k1, k2 = jax.random.split(key)
    keys = iter(jax.random.split(k1, 256))
    ps, ch, dtype = cfg.patch_size, cfg.base_channels, cfg.dtype

    # ---------------- encoder ----------------
    down_blocks = []
    c = ch
    for kind, n_layers, mult in cfg.blocks:
        res = [_res_init(keys, c, c, dtype) for _ in range(n_layers)]
        stride = _stride_of(kind)
        c_next = c * mult
        down_blocks.append({"res": res, "down": {"conv": _conv_init(
            next(keys), c_next // int(np.prod(stride)), c, (3, 3, 3), dtype)}})
        c = c_next

    stats = {"mean": jnp.zeros((cfg.latent_channels,), jnp.float32),
             "std": jnp.ones((cfg.latent_channels,), jnp.float32)}
    enc = {
        "conv_in": _conv_init(next(keys), ch, cfg.in_channels * ps * ps,
                              (3, 3, 3), dtype),
        "down_blocks": down_blocks,
        "conv_out": _conv_init(next(keys), cfg.latent_channels, c,
                               (3, 3, 3), dtype),
        "per_channel_statistics": stats,
    }

    # ---------------- decoder ----------------
    keys = iter(jax.random.split(k2, 256))
    up_blocks = []
    cd = c
    for kind, n_layers, mult in reversed(cfg.blocks):
        stride = _stride_of(kind)
        c_next = max(cd // mult, ch)
        res = [_res_init(keys, cd if li == 0 else c_next, c_next, dtype)
               for li in range(n_layers)]
        up_blocks.append({"up": {"conv": _conv_init(
            next(keys), cd * int(np.prod(stride)), cd, (3, 3, 3), dtype)},
            "res": res})
        cd = c_next

    dec = {
        "conv_in": _conv_init(next(keys), c, cfg.latent_channels,
                              (3, 3, 3), dtype),
        "up_blocks": up_blocks,
        "conv_out": _conv_init(next(keys), cfg.in_channels * ps * ps, cd,
                               (3, 3, 3), dtype),
        "per_channel_statistics": stats,
    }
    return enc, dec
