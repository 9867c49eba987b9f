"""LTX-2 video VAE — functional JAX implementation, schedule-driven.

Behavioral reference: ltx-core model/video_vae/ (video_vae.py VideoEncoder/
VideoDecoder + _make_encoder_block/_make_decoder_block:29-133,315-392,
sampling.py SpaceToDepthDownsample/DepthToSpaceUpsample, resnet.py
ResnetBlock3D/UNetMidBlock3D with PixelNorm + optional timestep
conditioning + noise injection, ops.py PerChannelStatistics, convolution.py
CausalConv3d, tiling.py spatial tiling).

The encoder/decoder are driven by explicit block schedules in the
checkpoint-config format — `(block_name, {config})` tuples — so any released
LTX-2 VAE configuration loads as data:

    encoder block names: res_x, res_x_y, compress_time, compress_space,
        compress_all, compress_all_x_y, compress_{space,time,all}_res
    decoder block names: res_x, attn_res_x (unsupported), res_x_y,
        compress_{time,space,all}

Standard configuration (video_vae.py:150-156): patch_size=4, encoder =
1x compress_space_res + 1x compress_time_res + 2x compress_all_res
=> F' = 1 + (F-1)/8, H' = H/32, W' = W/32, 128 latent channels; the decoder
schedule is stored in config order and processed REVERSED
(video_vae.py:461-499).

Causality: encoder temporal convs are causal (2-frame left pad); the
temporal space-to-depth duplicates the first frame (sampling.py:39-41) so
F' = 1 + (F-1)/8 holds. The decoder is non-causal by default
(video_vae.py:430: causal=False -> symmetric temporal padding).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

_STD_ENCODER = (
    ("compress_space_res", {"multiplier": 2}),
    ("compress_time_res", {"multiplier": 2}),
    ("compress_all_res", {"multiplier": 2}),
    ("compress_all_res", {"multiplier": 2}),
)
# stored in config order; the decoder processes it REVERSED
_STD_DECODER = (
    ("res_x", {"num_layers": 2}),
    ("compress_all", {"multiplier": 2, "residual": True}),
    ("compress_all", {"multiplier": 2, "residual": True}),
    ("compress_time", {}),
    ("compress_space", {}),
)


@dataclass(frozen=True)
class LTXVAEConfig:
    in_channels: int = 3
    latent_channels: int = 128
    patch_size: int = 4
    encoder_blocks: Tuple[Tuple[str, Mapping], ...] = _STD_ENCODER
    decoder_blocks: Tuple[Tuple[str, Mapping], ...] = _STD_DECODER
    decoder_causal: bool = False          # video_vae.py:430
    timestep_conditioning: bool = False   # decoder-only (video_vae.py:431)
    decode_timestep: float = 0.05         # video_vae.py:459
    dtype: Any = jnp.bfloat16

    @property
    def spatial_factor(self) -> int:
        f = self.patch_size
        for kind, _ in self.encoder_blocks:
            if "space" in kind or "all" in kind:
                f *= 2
        return f

    @property
    def temporal_factor(self) -> int:
        f = 1
        for kind, _ in self.encoder_blocks:
            if "time" in kind or "all" in kind:
                f *= 2
        return f

    @property
    def encoder_widths(self):
        """Feature width before each encoder block (conv_in emits
        latent_channels, multiplier blocks widen; video_vae.py:189-219)."""
        c = self.latent_channels
        out = []
        for kind, bc in self.encoder_blocks:
            out.append(c)
            if kind in ("res_x_y", "compress_all_x_y") or kind.endswith("_res"):
                c *= bc.get("multiplier", 2)
        return out, c

    @property
    def decoder_widths(self):
        """Feature width before each *processed* (reversed) decoder block
        (video_vae.py:461-499)."""
        c = self.latent_channels
        for kind, bc in reversed(self.decoder_blocks):
            if kind == "res_x_y":
                c *= bc.get("multiplier", 2)
            if kind == "compress_all":
                c *= bc.get("multiplier", 1)
        out = []
        for kind, bc in reversed(self.decoder_blocks):
            out.append(c)
            if kind == "res_x_y":
                c //= bc.get("multiplier", 2)
            if kind == "compress_all":
                c //= bc.get("multiplier", 1)
        return out, c


def ltx_vae_test_config(**kw):
    base = dict(
        latent_channels=8, dtype=jnp.float32,
        encoder_blocks=(("compress_space_res", {"multiplier": 2}),
                        ("res_x", {"num_layers": 1}),
                        ("compress_time_res", {"multiplier": 2}),
                        ("compress_all_res", {"multiplier": 1})),
        decoder_blocks=(("res_x", {"num_layers": 1}),
                        ("compress_all", {"multiplier": 2, "residual": True}),
                        ("compress_time", {}),
                        ("compress_space", {})),
    )
    base.update(kw)
    return LTXVAEConfig(**base)


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _pixel_norm(x, eps: float = 1e-6):
    """PixelNorm over the channel dim (video_vae normalization)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=1, keepdims=True) + eps)).astype(x.dtype)


def _conv3d(p, x, stride=(1, 1, 1), causal=True):
    """3x3x3 conv: causal => 2-frame temporal left pad, else symmetric
    (convolution.py CausalConv3d, causal flag)."""
    tpad = (2, 0) if causal else (1, 1)
    x = jnp.pad(x, ((0, 0), (0, 0), tpad, (1, 1), (1, 1)))
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride,
        padding=[(0, 0)] * 3, dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    return out + p["b"].astype(x.dtype)[None, :, None, None, None]


# back-compat alias (tests, converters)
def _causal_conv3d(p, x, stride=(1, 1, 1)):
    return _conv3d(p, x, stride, causal=True)


def _conv1(p, x):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1, 1, 1),
        padding=[(0, 0)] * 3, dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    return out + p["b"].astype(x.dtype)[None, :, None, None, None]


def _resblock(p, x, causal=True, t_embed=None, key=None):
    """ResnetBlock3D, pixel-norm variant (resnet.py:12-187).

    t_embed: (B, 4*C, 1, 1, 1) timestep embedding for the decoder's
    conditioned blocks (scale_shift table chunks [shift1, scale1, shift2,
    scale2], resnet.py:131-149). key: PRNG for StyleGAN-style spatial noise
    injection when per_channel_scale params are present (:104-119)."""
    h = _pixel_norm(x)
    if t_embed is not None and "scale_shift" in p:
        B, C = x.shape[0], x.shape[1]
        ada = p["scale_shift"][None, :, :, None, None, None].astype(
            jnp.float32) + t_embed.reshape(B, 4, C, 1, 1, 1)
        sh1, sc1, sh2, sc2 = [a[:, i].astype(x.dtype) for i, a in
                              [(0, ada), (1, ada), (2, ada), (3, ada)]]
        h = h * (1 + sc1) + sh1
    h = _conv3d(p["conv1"], jax.nn.silu(h), causal=causal)
    if key is not None and p.get("pcs1") is not None:
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, h.shape[-2:], h.dtype)[None]
        h = h + (noise * p["pcs1"].astype(h.dtype))[None]
    h2 = _pixel_norm(h)
    if t_embed is not None and "scale_shift" in p:
        h2 = h2 * (1 + sc2) + sh2
    h = _conv3d(p["conv2"], jax.nn.silu(h2), causal=causal)
    if key is not None and p.get("pcs2") is not None:
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, h.shape[-2:], h.dtype)[None]
        h = h + (noise * p["pcs2"].astype(h.dtype))[None]
    if p.get("shortcut") is not None:
        x = _conv1(p["shortcut"], x)
    return x + h


def _time_embed(p, timestep, width: int):
    """PixArtAlphaCombinedTimestepSizeEmbeddings: sinusoidal(256) -> silu
    MLP -> width (resnet.py:229-232; adaln)."""
    from turbodiffusion_tpu.models import layers as L
    emb = L.sinusoidal_embedding_1d(256, timestep.reshape(-1))
    h = jnp.matmul(emb, p["fc1"]["w"].astype(jnp.float32)) + \
        p["fc1"]["b"].astype(jnp.float32)
    h = jnp.matmul(jax.nn.silu(h), p["fc2"]["w"].astype(jnp.float32)) + \
        p["fc2"]["b"].astype(jnp.float32)
    return h.reshape(timestep.shape[0], width, 1, 1, 1)


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
    h = _conv3d(p["conv"], x, causal=True)
    return s2d(h) + x_in


def _depth_to_space_up(p, x, stride, residual=True, causal=False):
    """DepthToSpaceUpsample (sampling.py:68-124)."""
    st, sh, sw = stride
    d2s = lambda y: rearrange(
        y, "b (c p1 p2 p3) d h w -> b c (d p1) (h p2) (w p3)",
        p1=st, p2=sh, p3=sw)
    h = d2s(_conv3d(p["conv"], x, causal=causal))
    if st == 2:
        h = h[:, :, 1:]
    if not residual:
        return h
    out_ch = p["conv"]["w"].shape[0] // (st * sh * sw)
    num_repeat = out_ch * st * sh * sw // x.shape[1]
    x_in = d2s(jnp.tile(x, (1, num_repeat, 1, 1, 1)) if num_repeat > 1 else x)
    if st == 2:
        x_in = x_in[:, :, 1:]
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
    (B, 128, 1+k, H/32, W/32) (video_vae.py:246-312)."""
    ps = cfg.patch_size
    x = rearrange(video.astype(cfg.dtype),
                  "b c d (h p2) (w p3) -> b (c p2 p3) d h w", p2=ps, p3=ps)
    x = _conv3d(params["conv_in"], x, causal=True)
    for blk, (kind, bc) in zip(params["blocks"], cfg.encoder_blocks):
        if kind in ("res_x", "res_x_y"):
            for rp in blk["res"]:
                x = _resblock(rp, x, causal=True)
        elif kind.endswith("_res"):
            x = _space_to_depth_down(blk, x, _stride_of(kind))
        else:  # plain strided conv compress_*
            x = _conv3d(blk["conv"], x, stride=_stride_of(kind), causal=True)
    x = jax.nn.silu(_pixel_norm(x))
    moments = _conv3d(params["conv_out"], x, causal=True)
    mu = moments[:, :cfg.latent_channels].astype(jnp.float32)
    # per-channel statistics normalization (ops.py:63-90)
    stats = params["per_channel_statistics"]
    return (mu - stats["mean"][None, :, None, None, None]) / \
        stats["std"][None, :, None, None, None]


def ltx_vae_decode(params, cfg: LTXVAEConfig, latent, timestep=None,
                   key=None):
    """Normalized latent -> video (B, 3, 1+8k, H, W)
    (video_vae.py:530-615). The decoder schedule runs REVERSED.

    timestep: scalar denoise conditioning (defaults to cfg.decode_timestep
    when the checkpoint is timestep-conditioned); key: PRNG for noise
    injection (omitted => no noise, the deterministic parity mode)."""
    causal = cfg.decoder_causal
    stats = params["per_channel_statistics"]
    z = latent.astype(jnp.float32) * stats["std"][None, :, None, None, None] \
        + stats["mean"][None, :, None, None, None]
    x = _conv3d(params["conv_in"], z.astype(cfg.dtype), causal=causal)

    conditioned = "timestep_scale_multiplier" in params
    t_scaled = None
    if conditioned:
        t = jnp.full((latent.shape[0],),
                     cfg.decode_timestep if timestep is None else timestep,
                     jnp.float32)
        t_scaled = t * params["timestep_scale_multiplier"]

    for blk, (kind, bc) in zip(params["blocks"],
                               tuple(reversed(cfg.decoder_blocks))):
        if kind in ("res_x", "res_x_y"):
            t_embed = None
            if conditioned and "time_emb" in blk:
                width = blk["res"][0]["scale_shift"].shape[1] * 4
                t_embed = _time_embed(blk["time_emb"], t_scaled, width)
            for rp in blk["res"]:
                x = _resblock(rp, x, causal=causal, t_embed=t_embed, key=key)
        else:
            x = _depth_to_space_up(blk, x, _stride_of(kind),
                                   residual=bc.get("residual", False)
                                   or "up_res" in blk,
                                   causal=causal)
    x = _pixel_norm(x)
    if conditioned and "last_scale_shift_table" in params:
        width = params["last_scale_shift_table"].shape[1]
        emb = _time_embed(params["last_time_embedder"], t_scaled, 2 * width)
        ada = params["last_scale_shift_table"][None, :, :, None, None, None
                                               ].astype(jnp.float32) + \
            emb.reshape(-1, 2, width, 1, 1, 1)
        x = x * (1 + ada[:, 1].astype(x.dtype)) + ada[:, 0].astype(x.dtype)
    x = _conv3d(params["conv_out"], jax.nn.silu(x), causal=causal)
    ps = cfg.patch_size
    return rearrange(x, "b (c p2 p3) d h w -> b c d (h p2) (w p3)",
                     p2=ps, p3=ps).astype(jnp.float32)


def ltx_vae_decode_tiled(params, cfg: LTXVAEConfig, latent,
                         tile: int = 16, overlap: int = 2):
    """Spatially tiled decode with blending (tiling.py) — bounds the
    full-resolution activation footprint for large frames."""
    B, C, T, H, W = latent.shape
    if H <= tile and W <= tile:
        return ltx_vae_decode(params, cfg, latent)
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


def _res_init(keys, c_in, c_out, dtype, conditioned=False):
    p = {"conv1": _conv_init(next(keys), c_out, c_in, (3, 3, 3), dtype),
         "conv2": _conv_init(next(keys), c_out, c_out, (3, 3, 3), dtype)}
    p["shortcut"] = (_conv_init(next(keys), c_out, c_in, (1, 1, 1), dtype)
                     if c_in != c_out else None)
    if conditioned:
        p["scale_shift"] = jnp.zeros((4, c_in), jnp.float32)
    return p


def _lin_init(key, i, o, dtype):
    k1, _ = jax.random.split(key)
    return {"w": (jax.random.normal(k1, (i, o)) * 0.02).astype(dtype),
            "b": jnp.zeros((o,), dtype)}


def init_ltx_vae(key, cfg: LTXVAEConfig = LTXVAEConfig()):
    """Returns (encoder_params, decoder_params) sharing per-channel stats."""
    k1, k2 = jax.random.split(key)
    keys = iter(jax.random.split(k1, 512))
    ps, dtype = cfg.patch_size, cfg.dtype

    stats = {"mean": jnp.zeros((cfg.latent_channels,), jnp.float32),
             "std": jnp.ones((cfg.latent_channels,), jnp.float32)}

    # ---------------- encoder ----------------
    widths, c_final = cfg.encoder_widths
    blocks = []
    for (kind, bc), c in zip(cfg.encoder_blocks, widths):
        mult = bc.get("multiplier", 2)
        if kind == "res_x":
            blocks.append({"res": [_res_init(keys, c, c, dtype)
                                   for _ in range(bc.get("num_layers", 1))]})
        elif kind == "res_x_y":
            blocks.append({"res": [_res_init(keys, c, c * mult, dtype)]})
        elif kind.endswith("_res"):
            stride = _stride_of(kind)
            blocks.append({"conv": _conv_init(
                next(keys), c * mult // int(np.prod(stride)), c,
                (3, 3, 3), dtype)})
        else:
            c_out = c * mult if kind == "compress_all_x_y" else c
            blocks.append({"conv": _conv_init(next(keys), c_out, c,
                                              (3, 3, 3), dtype)})
    enc = {
        "conv_in": _conv_init(next(keys), cfg.latent_channels,
                              cfg.in_channels * ps * ps, (3, 3, 3), dtype),
        "blocks": blocks,
        "conv_out": _conv_init(next(keys), cfg.latent_channels, c_final,
                               (3, 3, 3), dtype),
        "per_channel_statistics": stats,
    }

    # ---------------- decoder ----------------
    keys = iter(jax.random.split(k2, 512))
    dwidths, d_final = cfg.decoder_widths
    cond = cfg.timestep_conditioning
    blocks = []
    for (kind, bc), c in zip(tuple(reversed(cfg.decoder_blocks)), dwidths):
        if kind == "res_x":
            b = {"res": [_res_init(keys, c, c, dtype, conditioned=cond)
                         for _ in range(bc.get("num_layers", 1))]}
            if cond:
                b["time_emb"] = {"fc1": _lin_init(next(keys), 256, 4 * c, dtype),
                                 "fc2": _lin_init(next(keys), 4 * c, 4 * c,
                                                  dtype)}
            blocks.append(b)
        elif kind == "res_x_y":
            mult = bc.get("multiplier", 2)
            blocks.append({"res": [_res_init(keys, c, c // mult, dtype)]})
        else:
            stride = _stride_of(kind)
            blocks.append({"conv": _conv_init(
                next(keys), c * int(np.prod(stride)) //
                bc.get("multiplier", 1), c, (3, 3, 3), dtype)})
    dec = {
        "conv_in": _conv_init(next(keys), dwidths[0] if dwidths
                              else cfg.latent_channels,
                              cfg.latent_channels, (3, 3, 3), dtype),
        "blocks": blocks,
        "conv_out": _conv_init(next(keys), cfg.in_channels * ps * ps,
                               d_final, (3, 3, 3), dtype),
        "per_channel_statistics": stats,
    }
    if cond:
        dec["timestep_scale_multiplier"] = jnp.float32(1000.0)
        dec["last_time_embedder"] = {
            "fc1": _lin_init(next(keys), 256, 2 * d_final, dtype),
            "fc2": _lin_init(next(keys), 2 * d_final, 2 * d_final, dtype)}
        dec["last_scale_shift_table"] = jnp.zeros((2, d_final), jnp.float32)
    return enc, dec


# ---------------------------------------------------------------------------
# Checkpoint import (torch layout)
# ---------------------------------------------------------------------------

def ltx_vae_config_from_blocks(encoder_blocks, decoder_blocks, **kw):
    """Reference checkpoint-config block lists (`[name, int|dict]` entries,
    video_vae.py:205-208) -> LTXVAEConfig."""
    def norm(blocks):
        out = []
        for name, bc in blocks:
            if isinstance(bc, int):
                bc = {"num_layers": bc}
            out.append((name, dict(bc)))
        return tuple(out)
    return LTXVAEConfig(encoder_blocks=norm(encoder_blocks),
                        decoder_blocks=norm(decoder_blocks), **kw)


def ltx_vae_params_from_state_dict(sd, cfg: LTXVAEConfig,
                                   dtype=jnp.bfloat16):
    """torch VideoEncoder/VideoDecoder state dict -> (enc, dec) param trees.

    Key layout: `encoder.conv_in.conv.weight`, `encoder.down_blocks.{i}.…`
    (res_x -> `res_blocks.{j}.conv1.conv.weight` + optional
    `conv_shortcut.conv.weight` / `scale_shift_table` / `per_channel_scale1`;
    compress_*_res -> `conv.conv.weight`), `encoder.conv_out.conv.weight`,
    `encoder.per_channel_statistics.{std-of-means,mean-of-means}`; decoder
    mirrors with `up_blocks` + optional `last_time_embedder` /
    `last_scale_shift_table` / `timestep_scale_multiplier`
    (video_vae.py:186-243,460-522; resnet.py:44-102; ops.py:63-90)."""
    def conv(name):
        return {"w": jnp.asarray(sd[name + ".conv.weight"], dtype),
                "b": jnp.asarray(sd[name + ".conv.bias"], dtype)}

    def res(pre):
        p = {"conv1": conv(pre + ".conv1"), "conv2": conv(pre + ".conv2")}
        if pre + ".conv_shortcut.conv.weight" in sd:
            p["shortcut"] = conv(pre + ".conv_shortcut")
        elif pre + ".conv_shortcut.weight" in sd:   # 1x1 plain conv
            p["shortcut"] = {
                "w": jnp.asarray(sd[pre + ".conv_shortcut.weight"], dtype),
                "b": jnp.asarray(sd[pre + ".conv_shortcut.bias"], dtype)}
        else:
            p["shortcut"] = None
        if pre + ".scale_shift_table" in sd:
            p["scale_shift"] = jnp.asarray(sd[pre + ".scale_shift_table"],
                                           jnp.float32)
        for t_key, ours in (("per_channel_scale1", "pcs1"),
                            ("per_channel_scale2", "pcs2")):
            if f"{pre}.{t_key}" in sd:
                p[ours] = jnp.asarray(sd[f"{pre}.{t_key}"], jnp.float32)
        return p

    def time_emb(pre):
        # PixArtAlphaCombinedTimestepSizeEmbeddings.timestep_embedder MLP
        return {"fc1": {"w": jnp.asarray(
                    sd[pre + ".timestep_embedder.linear_1.weight"], dtype).T,
                        "b": jnp.asarray(
                    sd[pre + ".timestep_embedder.linear_1.bias"], dtype)},
                "fc2": {"w": jnp.asarray(
                    sd[pre + ".timestep_embedder.linear_2.weight"], dtype).T,
                        "b": jnp.asarray(
                    sd[pre + ".timestep_embedder.linear_2.bias"], dtype)}}

    def stats(pre):
        return {"mean": jnp.asarray(sd[pre + ".mean-of-means"], jnp.float32),
                "std": jnp.asarray(sd[pre + ".std-of-means"], jnp.float32)}

    def side(side_name, schedule, block_key):
        blocks = []
        for i, (kind, bc) in enumerate(schedule):
            pre = f"{side_name}.{block_key}.{i}"
            if kind in ("res_x", "res_x_y"):
                n = bc.get("num_layers", 1) if kind == "res_x" else 1
                if kind == "res_x":
                    b = {"res": [res(f"{pre}.res_blocks.{j}")
                                 for j in range(n)]}
                    if pre + ".time_embedder.timestep_embedder.linear_1.weight" in sd:
                        b["time_emb"] = time_emb(pre + ".time_embedder")
                else:
                    b = {"res": [res(pre)]}
                blocks.append(b)
            else:
                blocks.append({"conv": conv(pre + ".conv")
                               if pre + ".conv.conv.weight" in sd
                               else conv(pre)})
        return {
            "conv_in": conv(f"{side_name}.conv_in"),
            "blocks": blocks,
            "conv_out": conv(f"{side_name}.conv_out"),
            "per_channel_statistics": stats(
                f"{side_name}.per_channel_statistics"),
        }

    # comfy checkpoints may ship only one side (VAE_DECODER_COMFY_KEYS_FILTER
    # vs VAE_ENCODER_COMFY_KEYS_FILTER select disjoint key sets)
    enc = (side("encoder", cfg.encoder_blocks, "down_blocks")
           if "encoder.conv_in.conv.weight" in sd else None)
    dec = (side("decoder", tuple(reversed(cfg.decoder_blocks)), "up_blocks")
           if "decoder.conv_in.conv.weight" in sd else None)
    if dec is not None and "decoder.timestep_scale_multiplier" in sd:
        dec["timestep_scale_multiplier"] = jnp.asarray(
            sd["decoder.timestep_scale_multiplier"], jnp.float32)
        dec["last_time_embedder"] = time_emb("decoder.last_time_embedder")
        dec["last_scale_shift_table"] = jnp.asarray(
            sd["decoder.last_scale_shift_table"], jnp.float32)
    return enc, dec
