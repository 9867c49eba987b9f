"""LTX-2 audio VAE + vocoder — functional JAX implementation.

Behavioral reference: ltx-core model/audio_vae/ — AudioEncoder/AudioDecoder
(audio_vae.py:59-430): VQGAN-style 2D conv stacks over mel spectrograms with
width(time)-causal convolutions, group-norm res blocks, x4 temporal latent
downsampling (25 latent fps from 16 kHz / hop 160, ltx_wrapper.py:49); and
the HiFi-GAN Vocoder (vocoder.py): conv_pre -> [transposed-conv upsample +
parallel dilated ResBlock1 bank averaged] -> conv_post, stereo out.

Exact channel schedules / upsample rates are checkpoint-config driven in the
reference; defaults here follow the documented geometry (mel 64 bins, latent
x4 time downsample, vocoder upsample product == mel hop 160).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class AudioVAEConfig:
    mel_bins: int = 64
    in_channels: int = 2            # stereo
    base_ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 64
    # per level: (time_stride, freq_stride); product of time strides = 4
    strides: Tuple[Tuple[int, int], ...] = ((2, 2), (2, 2))
    sample_rate: int = 16000
    mel_hop_length: int = 160
    dtype: Any = jnp.float32

    @property
    def latent_fps(self) -> float:
        t_down = int(np.prod([s[0] for s in self.strides]))
        return self.sample_rate / self.mel_hop_length / t_down  # 25.0


def audio_vae_test_config(**kw):
    base = dict(mel_bins=16, base_ch=8, ch_mult=(1, 2), z_channels=8,
                strides=((2, 2),), num_res_blocks=1)
    base.update(kw)
    return AudioVAEConfig(**base)


# ---------------------------------------------------------------------------
# primitives: time-causal 2D conv (causality_axis=WIDTH, audio_vae causal_conv_2d)
# ---------------------------------------------------------------------------

def _tconv2d(p, x, stride=(1, 1), causal_time=True, k=3):
    """x: (B, C, T, F). kxk conv, causal along T (left pad), symmetric on F."""
    pad_t = (k - 1, 0) if causal_time else (k // 2, k // 2)
    x = jnp.pad(x, ((0, 0), (0, 0), pad_t, (k // 2, k // 2)))
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride,
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["b"].astype(x.dtype)[None, :, None, None]


def _group_norm(x, p, groups: int = 32, eps: float = 1e-6):
    B, C, T, F = x.shape
    g = math.gcd(groups, C)
    xf = x.astype(jnp.float32).reshape(B, g, C // g, T, F)
    mu = xf.mean(axis=(2, 3, 4), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(2, 3, 4), keepdims=True)
    xf = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(B, C, T, F)
    return (xf * p["scale"].astype(jnp.float32)[None, :, None, None]
            + p["bias"].astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


def _resblock2d(p, x):
    h = _tconv2d(p["conv1"], jax.nn.silu(_group_norm(x, p["norm1"])))
    h = _tconv2d(p["conv2"], jax.nn.silu(_group_norm(h, p["norm2"])))
    if p.get("shortcut") is not None:
        x = _tconv2d(p["shortcut"], x, k=1, causal_time=False)
    return x + h


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def audio_vae_encode(params, cfg: AudioVAEConfig, mel):
    """mel: (B, C_in, T_mel, mel_bins) -> normalized latent
    (B, z, T_mel/4, F')."""
    x = _tconv2d(params["conv_in"], mel.astype(cfg.dtype))
    for blk in params["down"]:
        for rp in blk["res"]:
            x = _resblock2d(rp, x)
        if blk.get("down") is not None:
            x = _tconv2d(blk["down"], x, stride=blk["stride"])
    for rp in params["mid"]:
        x = _resblock2d(rp, x)
    x = jax.nn.silu(_group_norm(x, params["norm_out"]))
    moments = _tconv2d(params["conv_out"], x)
    mu = moments[:, :cfg.z_channels].astype(jnp.float32)
    st = params["per_channel_statistics"]
    return (mu - st["mean"][None, :, None, None]) / st["std"][None, :, None, None]


def audio_vae_decode(params, cfg: AudioVAEConfig, z):
    """latent -> mel (B, C_in, T_mel, mel_bins)."""
    st = params["per_channel_statistics"]
    z = z.astype(jnp.float32) * st["std"][None, :, None, None] + \
        st["mean"][None, :, None, None]
    x = _tconv2d(params["conv_in"], z.astype(cfg.dtype))
    for rp in params["mid"]:
        x = _resblock2d(rp, x)
    for blk in params["up"]:
        if blk.get("up") is not None:
            st_t, st_f = blk["stride"]
            B, C, T, F = x.shape
            x = jnp.repeat(jnp.repeat(x, st_t, axis=2), st_f, axis=3)
            x = _tconv2d(blk["up"], x)
        for rp in blk["res"]:
            x = _resblock2d(rp, x)
    x = jax.nn.silu(_group_norm(x, params["norm_out"]))
    return _tconv2d(params["conv_out"], x).astype(jnp.float32)


# ---------------------------------------------------------------------------
# HiFi-GAN vocoder (vocoder.py)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class VocoderConfig:
    mel_bins: int = 64
    stereo: bool = True
    upsample_initial_channel: int = 1024
    upsample_rates: Tuple[int, ...] = (5, 4, 4, 2)       # product = 160 = hop
    upsample_kernel_sizes: Tuple[int, ...] = (10, 8, 8, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    output_sample_rate: int = 24000
    dtype: Any = jnp.float32


def vocoder_test_config(**kw):
    base = dict(mel_bins=8, upsample_initial_channel=16,
                upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),))
    base.update(kw)
    return VocoderConfig(**base)


def _conv1d(p, x, stride=1, dilation=1, pad=0):
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride,),
        padding=[(0, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out + p["b"].astype(x.dtype)[None, :, None]


def _tconv1d(p, x, stride, kernel):
    # jax conv_transpose padding pads the stride-dilated forward conv; this
    # choice reproduces torch ConvTranspose1d(padding=(k-s)//2):
    # out_len == in_len * stride.
    pad = kernel - 1 - (kernel - stride) // 2
    out = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=(stride,),
        padding=[(pad, pad)], dimension_numbers=("NCH", "IOH", "NCH"))
    return out + p["b"].astype(x.dtype)[None, :, None]


def _vocoder_resblock(p, x, kernel: int, dilations):
    """ResBlock1 (audio_vae/resnet.py): pairs of leaky-relu + dilated conv."""
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        h = jax.nn.leaky_relu(x, LRELU_SLOPE)
        h = _conv1d(c1, h, dilation=d, pad=(kernel - 1) * d // 2)
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        h = _conv1d(c2, h, dilation=1, pad=(kernel - 1) // 2)
        x = x + h
    return x


def vocoder_synthesize(params, cfg: VocoderConfig, mel):
    """mel (B, T, mel_bins) mono or (B, 2, T, mel_bins) stereo ->
    waveform (B, out_ch, T * prod(upsample_rates)) (vocoder.py:88-131)."""
    if mel.ndim == 3:
        x = jnp.swapaxes(mel, 1, 2)                       # (B, mel, T)
    else:
        x = jnp.swapaxes(mel, 2, 3)                       # (B, 2, mel, T)
        x = x.reshape(x.shape[0], -1, x.shape[-1])        # (B, 2*mel, T)
    x = x.astype(cfg.dtype)
    x = _conv1d(params["conv_pre"], x, pad=3)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (rate, ksz) in enumerate(zip(cfg.upsample_rates,
                                        cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = _tconv1d(params["ups"][i], x, rate, ksz)
        outs = []
        for j in range(nk):
            rb = params["resblocks"][i * nk + j]
            outs.append(_vocoder_resblock(
                rb, x, cfg.resblock_kernel_sizes[j],
                cfg.resblock_dilations[j]))
        x = jnp.mean(jnp.stack(outs, 0), axis=0)
    x = jax.nn.leaky_relu(x, LRELU_SLOPE)
    x = _conv1d(params["conv_post"], x, pad=3)
    return jnp.tanh(x).astype(jnp.float32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _c2(key, o, i, k, dtype):
    return {"w": (jax.random.normal(key, (o, i, k, k)) / math.sqrt(i * k * k)
                  ).astype(dtype), "b": jnp.zeros((o,), dtype)}


def _gn(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _rb2(keys, ci, co, dtype):
    p = {"norm1": _gn(ci, dtype), "conv1": _c2(next(keys), co, ci, 3, dtype),
         "norm2": _gn(co, dtype), "conv2": _c2(next(keys), co, co, 3, dtype)}
    p["shortcut"] = _c2(next(keys), co, ci, 1, dtype) if ci != co else None
    return p


def init_audio_vae(key, cfg: AudioVAEConfig = AudioVAEConfig()):
    dtype = cfg.dtype
    k1, k2 = jax.random.split(key)
    chs = [cfg.base_ch * m for m in cfg.ch_mult]
    stats = {"mean": jnp.zeros((cfg.z_channels,), jnp.float32),
             "std": jnp.ones((cfg.z_channels,), jnp.float32)}

    keys = iter(jax.random.split(k1, 128))
    down = []
    c = chs[0]
    for li, co in enumerate(chs):
        res = []
        for ri in range(cfg.num_res_blocks):
            res.append(_rb2(keys, c if ri == 0 else co, co, dtype))
        blk = {"res": res, "down": None, "stride": (1, 1)}
        if li < len(cfg.strides):
            blk["down"] = _c2(next(keys), co, co, 3, dtype)
            blk["stride"] = cfg.strides[li]
        down.append(blk)
        c = co
    enc = {
        "conv_in": _c2(next(keys), chs[0], cfg.in_channels, 3, dtype),
        "down": down,
        "mid": [_rb2(keys, c, c, dtype), _rb2(keys, c, c, dtype)],
        "norm_out": _gn(c, dtype),
        "conv_out": _c2(next(keys), cfg.z_channels, c, 3, dtype),
        "per_channel_statistics": stats,
    }

    keys = iter(jax.random.split(k2, 128))
    up = []
    cd = c
    for li, co in enumerate(reversed(chs)):
        blk = {"res": [], "up": None, "stride": (1, 1)}
        if li > 0 and (len(chs) - 1 - li) < len(cfg.strides):
            blk["up"] = _c2(next(keys), cd, cd, 3, dtype)
            blk["stride"] = cfg.strides[len(chs) - 1 - li]
        for ri in range(cfg.num_res_blocks):
            blk["res"].append(_rb2(keys, cd if ri == 0 else co, co, dtype))
        up.append(blk)
        cd = co
    dec = {
        "conv_in": _c2(next(keys), c, cfg.z_channels, 3, dtype),
        "mid": [_rb2(keys, c, c, dtype), _rb2(keys, c, c, dtype)],
        "up": up,
        "norm_out": _gn(cd, dtype),
        "conv_out": _c2(next(keys), cfg.in_channels, cd, 3, dtype),
        "per_channel_statistics": stats,
    }
    return enc, dec


def init_vocoder(key, cfg: VocoderConfig = VocoderConfig()):
    dtype = cfg.dtype
    keys = iter(jax.random.split(key, 256))
    in_ch = cfg.mel_bins * (2 if cfg.stereo else 1)
    uic = cfg.upsample_initial_channel

    def c1(o, i, k):
        kk = next(keys)
        return {"w": (jax.random.normal(kk, (o, i, k)) / math.sqrt(i * k)
                      ).astype(dtype), "b": jnp.zeros((o,), dtype)}

    ups, resblocks = [], []
    for i, (rate, ksz) in enumerate(zip(cfg.upsample_rates,
                                        cfg.upsample_kernel_sizes)):
        ci, co = uic // (2 ** i), uic // (2 ** (i + 1))
        kk = next(keys)
        ups.append({"w": (jax.random.normal(kk, (ci, co, ksz))
                          / math.sqrt(ci * ksz)).astype(dtype),
                    "b": jnp.zeros((co,), dtype)})
        for j, kzz in enumerate(cfg.resblock_kernel_sizes):
            nd = len(cfg.resblock_dilations[j])
            resblocks.append({
                "convs1": [c1(co, co, kzz) for _ in range(nd)],
                "convs2": [c1(co, co, kzz) for _ in range(nd)],
            })
    out_ch = 2 if cfg.stereo else 1
    return {
        "conv_pre": c1(uic, in_ch, 7),
        "ups": ups,
        "resblocks": resblocks,
        "conv_post": c1(out_ch, uic // (2 ** len(cfg.upsample_rates)), 7),
    }
