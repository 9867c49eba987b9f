"""LTX-2 audio VAE + vocoder — functional JAX implementation with
checkpoint importers.

Behavioral reference: ltx-core model/audio_vae/ —
  * AudioEncoder/AudioDecoder (audio_vae.py:59-465): VQGAN-style 2D conv
    stacks over (B, C, frames, mel_bins) spectrogram latents with
    frame-causal convolutions (CausalityAxis.HEIGHT, causal_conv_2d.py:45),
    pixel- or group-norm res blocks (normalization.py:14-58), optional
    vanilla attention at configured resolutions (attention.py:16-57),
    per-channel latent statistics applied over patchified (c f) channels
    (ops.py:61-76, patchifiers.py:282-330), x4 temporal latent downsampling
    (LATENT_DOWNSAMPLE_FACTOR=4, audio_vae.py:18).
  * HiFi-GAN Vocoder (vocoder.py:12-135): conv_pre -> [transposed-conv
    upsample + parallel dilated ResBlock1 bank averaged] -> conv_post,
    stereo mel (B, 2, T, 64) -> 24 kHz waveform; upsample product 240
    (= hop 160 x 24k/16k).

Checkpoint layout (comfy single-file): decoder under `audio_vae.decoder.*` +
`audio_vae.per_channel_statistics.*`, encoder under `audio_vae.encoder.*`,
vocoder under `vocoder.*` (model_configurator.py:26-124).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1
LATENT_DOWNSAMPLE_FACTOR = 4


@dataclass(frozen=True)
class AudioVAEConfig:
    """ddconfig surface (model_configurator.py:33-66 defaults)."""
    ch: int = 128
    out_ch: int = 2
    in_channels: int = 2
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (8, 16, 32)
    resolution: int = 256
    z_channels: int = 8
    double_z: bool = True
    norm_type: str = "pixel"              # "group" | "pixel"
    causality_axis: str = "height"        # "none" | "height" | "width"
    mid_block_add_attention: bool = True
    sample_rate: int = 16000
    mel_hop_length: int = 160
    mel_bins: int = 64
    dtype: Any = jnp.float32

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def latent_mel_bins(self) -> int:
        return self.mel_bins // (2 ** (self.num_resolutions - 1))

    @property
    def latent_channels(self) -> int:
        """Patchified (c f) channel count — the transformer's audio_in."""
        return self.z_channels * self.latent_mel_bins

    @property
    def latent_fps(self) -> float:
        return self.sample_rate / self.mel_hop_length / LATENT_DOWNSAMPLE_FACTOR


def audio_vae_test_config(**kw):
    base = dict(ch=8, ch_mult=(1, 2), z_channels=4, num_res_blocks=1,
                mel_bins=16, resolution=16, attn_resolutions=(8,))
    base.update(kw)
    return AudioVAEConfig(**base)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _causal_pad(k: int, axis: str):
    """(H_pad, W_pad) pairs for a kxk conv (causal_conv_2d.py:39-46);
    axis "height" = frames dim causal (top pad k-1)."""
    sym = (k // 2, (k - 1) - (k - 1) // 2)
    full = (k - 1, 0)
    if axis == "height":
        return full, sym
    if axis == "width":
        return sym, full
    return sym, sym


def _conv2d(p, x, stride=(1, 1), causality: str = "none", k: Optional[int] = None):
    """x: (B, C, T, F) NCHW. Causal padding along the configured axis."""
    kh = k if k is not None else p["w"].shape[2]
    ph, pw = _causal_pad(kh, causality)
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride,
        padding=[ph, pw] if kh > 1 else [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["b"].astype(x.dtype)[None, :, None, None]


def _norm(x, p, norm_type: str, eps: float = 1e-6, groups: int = 32):
    if norm_type == "pixel":
        # per-location RMS over channels (normalization.py:14-40)
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
        return y.astype(x.dtype)
    B, C, T, F = x.shape
    g = math.gcd(groups, C)
    xf = x.astype(jnp.float32).reshape(B, g, C // g, T, F)
    mu = xf.mean(axis=(2, 3, 4), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(2, 3, 4), keepdims=True)
    xf = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(B, C, T, F)
    return (xf * p["scale"].astype(jnp.float32)[None, :, None, None]
            + p["bias"].astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


def _resblock(p, x, cfg: AudioVAEConfig):
    """ResnetBlock (resnet.py:115-177): norm-silu-conv x2 + nin shortcut."""
    h = _conv2d(p["conv1"], jax.nn.silu(_norm(x, p.get("norm1"), cfg.norm_type)),
                causality=cfg.causality_axis)
    h = _conv2d(p["conv2"], jax.nn.silu(_norm(h, p.get("norm2"), cfg.norm_type)),
                causality=cfg.causality_axis)
    if p.get("nin_shortcut") is not None:
        x = _conv2d(p["nin_shortcut"], x, k=1)
    return x + h


def _attnblock(p, x, cfg: AudioVAEConfig):
    """AttnBlock (attention.py:16-57): single-head spatial attention."""
    B, C, T, F = x.shape
    h = _norm(x, p.get("norm"), cfg.norm_type)
    q = _conv2d(p["q"], h, k=1).reshape(B, C, T * F)
    k = _conv2d(p["k"], h, k=1).reshape(B, C, T * F)
    v = _conv2d(p["v"], h, k=1).reshape(B, C, T * F)
    w = jnp.einsum("bci,bcj->bij", q, k,
                   preferred_element_type=jnp.float32) * (C ** -0.5)
    w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
    h = jnp.einsum("bcj,bij->bci", v, w).reshape(B, C, T, F)
    return x + _conv2d(p["proj_out"], h, k=1)


def _mid(p, x, cfg: AudioVAEConfig):
    x = _resblock(p["block_1"], x, cfg)
    if p.get("attn_1") is not None:
        x = _attnblock(p["attn_1"], x, cfg)
    return _resblock(p["block_2"], x, cfg)


def _upsample(p, x, cfg: AudioVAEConfig):
    """Upsample (upsample.py:12-55): 2x nearest both dims + conv + drop the
    first row of the causal axis."""
    B, C, T, F = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    x = _conv2d(p, x, causality=cfg.causality_axis)
    if cfg.causality_axis == "height":
        x = x[:, :, 1:]
    elif cfg.causality_axis == "width":
        x = x[:, :, :, 1:]
    return x


def _downsample(p, x, cfg: AudioVAEConfig):
    """Downsample (downsample.py:11-58): asymmetric pad + stride-2 conv.
    Pad (W_l, W_r, H_t, H_b)."""
    pads = {"none": (0, 1, 0, 1), "width": (2, 0, 0, 1),
            "height": (0, 1, 2, 0)}[cfg.causality_axis]
    x = jnp.pad(x, ((0, 0), (0, 0), (pads[2], pads[3]), (pads[0], pads[1])))
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(2, 2),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["b"].astype(x.dtype)[None, :, None, None]


# ---------------------------------------------------------------------------
# patchify + statistics (ops.py:61-76; patchifiers.py:282-330)
# ---------------------------------------------------------------------------

def audio_patchify(z):
    """(B, C, T, F) -> (B, T, C*F) latent tokens (einops `b c t f -> b t (c f)`)."""
    B, C, T, F = z.shape
    return jnp.moveaxis(z, 1, 2).reshape(B, T, C * F)


def audio_unpatchify(tokens, z_channels: int):
    """(B, T, C*F) -> (B, C, T, F)."""
    B, T, CF = tokens.shape
    return jnp.moveaxis(tokens.reshape(B, T, z_channels, CF // z_channels),
                        2, 1)


def _normalize_tokens(tokens, st, inverse: bool):
    mean = st["mean"].astype(jnp.float32)
    std = st["std"].astype(jnp.float32)
    t = tokens.astype(jnp.float32)
    return t * std + mean if inverse else (t - mean) / std


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def audio_vae_encode(params, cfg: AudioVAEConfig, mel, normalize: bool = True):
    """mel (B, in_ch, T_mel, mel_bins) -> latent (B, z, T_lat, F_lat),
    normalized per patchified channel (audio_vae.py:200-245)."""
    ca = cfg.causality_axis
    x = _conv2d(params["conv_in"], mel.astype(cfg.dtype), causality=ca)
    for level, stage in enumerate(params["down"]):
        for bi, rp in enumerate(stage["block"]):
            x = _resblock(rp, x, cfg)
            if stage["attn"]:
                x = _attnblock(stage["attn"][bi], x, cfg)
        if stage.get("downsample") is not None:
            x = _downsample(stage["downsample"], x, cfg)
    x = _mid(params["mid"], x, cfg)
    x = jax.nn.silu(_norm(x, params.get("norm_out"), cfg.norm_type))
    moments = _conv2d(params["conv_out"], x, causality=ca)
    mu = moments[:, :cfg.z_channels].astype(jnp.float32)
    if not normalize:
        return mu
    tok = _normalize_tokens(audio_patchify(mu),
                            params["per_channel_statistics"], inverse=False)
    return audio_unpatchify(tok, cfg.z_channels)


def audio_vae_decode(params, cfg: AudioVAEConfig, z,
                     denormalize: bool = True):
    """latent (B, z, T_lat, F_lat) -> mel (B, out_ch, T_mel, mel_bins);
    T_mel = T_lat*4 - 3 under causality (audio_vae.py:374-392)."""
    T_lat = z.shape[2]
    if denormalize:
        tok = _normalize_tokens(audio_patchify(z),
                                params["per_channel_statistics"],
                                inverse=True)
        z = audio_unpatchify(tok, cfg.z_channels)
    ca = cfg.causality_axis
    x = _conv2d(params["conv_in"], z.astype(cfg.dtype), causality=ca)
    x = _mid(params["mid"], x, cfg)
    for level in reversed(range(cfg.num_resolutions)):
        stage = params["up"][level]
        for bi, rp in enumerate(stage["block"]):
            x = _resblock(rp, x, cfg)
            if stage["attn"]:
                x = _attnblock(stage["attn"][bi], x, cfg)
        if stage.get("upsample") is not None:
            x = _upsample(stage["upsample"], x, cfg)
    x = jax.nn.silu(_norm(x, params.get("norm_out"), cfg.norm_type))
    x = _conv2d(params["conv_out"], x, causality=ca).astype(jnp.float32)
    # target shape: frames*4 - 3 causal, mel_bins (audio_vae.py:382-392)
    t_tgt = max(T_lat * LATENT_DOWNSAMPLE_FACTOR -
                (LATENT_DOWNSAMPLE_FACTOR - 1 if ca != "none" else 0), 1)
    x = x[:, :cfg.out_ch, :t_tgt, :cfg.mel_bins]
    pad_t = t_tgt - x.shape[2]
    pad_f = cfg.mel_bins - x.shape[3]
    if pad_t > 0 or pad_f > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, max(pad_t, 0)),
                        (0, max(pad_f, 0))))
    return x


# ---------------------------------------------------------------------------
# HiFi-GAN vocoder (vocoder.py)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class VocoderConfig:
    """Constructor surface (vocoder.py:34-86; checkpoint `config.vocoder`)."""
    mel_bins: int = 64
    stereo: bool = True
    upsample_initial_channel: int = 1024
    upsample_rates: Tuple[int, ...] = (6, 5, 2, 2, 2)     # product 240
    upsample_kernel_sizes: Tuple[int, ...] = (16, 15, 8, 4, 4)
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
    """ResBlock1 (resnet.py:12-82): pairs of leaky-relu + dilated conv."""
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        h = jax.nn.leaky_relu(x, LRELU_SLOPE)
        h = _conv1d(c1, h, dilation=d, pad=(kernel - 1) * d // 2)
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        h = _conv1d(c2, h, dilation=1, pad=(kernel - 1) // 2)
        x = x + h
    return x


def vocoder_synthesize(params, cfg: VocoderConfig, mel):
    """mel (B, T, mel_bins) mono or (B, 2, T, mel_bins) stereo ->
    waveform (B, out_ch, T * prod(upsample_rates)) (vocoder.py:88-135).
    Stereo channels interleave as (s c) after the (…, mel, T) transpose."""
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
    # conv_post input uses torch's default leaky slope 0.01 (vocoder.py:134)
    x = jax.nn.leaky_relu(x, 0.01)
    x = _conv1d(params["conv_post"], x, pad=3)
    return jnp.tanh(x).astype(jnp.float32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _c2(key, o, i, k, dtype):
    return {"w": (jax.random.normal(key, (o, i, k, k)) / math.sqrt(i * k * k)
                  ).astype(dtype), "b": jnp.zeros((o,), dtype)}


def _gn(c, dtype, norm_type):
    if norm_type == "pixel":
        return None
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _rb_init(keys, ci, co, cfg):
    dtype = cfg.dtype
    p = {"norm1": _gn(ci, dtype, cfg.norm_type),
         "conv1": _c2(next(keys), co, ci, 3, dtype),
         "norm2": _gn(co, dtype, cfg.norm_type),
         "conv2": _c2(next(keys), co, co, 3, dtype)}
    p["nin_shortcut"] = _c2(next(keys), co, ci, 1, dtype) if ci != co else None
    return p


def _attn_init(keys, c, cfg):
    dtype = cfg.dtype
    return {"norm": _gn(c, dtype, cfg.norm_type),
            "q": _c2(next(keys), c, c, 1, dtype),
            "k": _c2(next(keys), c, c, 1, dtype),
            "v": _c2(next(keys), c, c, 1, dtype),
            "proj_out": _c2(next(keys), c, c, 1, dtype)}


def _mid_init(keys, c, cfg):
    return {"block_1": _rb_init(keys, c, c, cfg),
            "attn_1": (_attn_init(keys, c, cfg)
                       if cfg.mid_block_add_attention else None),
            "block_2": _rb_init(keys, c, c, cfg)}


def init_audio_vae(key, cfg: AudioVAEConfig = AudioVAEConfig()):
    """Returns (encoder_params, decoder_params) matching the reference
    module trees (audio_vae.py:59-360)."""
    dtype = cfg.dtype
    k1, k2 = jax.random.split(key)
    n = cfg.num_resolutions
    stats = {"mean": jnp.zeros((cfg.latent_channels,), jnp.float32),
             "std": jnp.ones((cfg.latent_channels,), jnp.float32)}

    # ---- encoder (build_downsampling_path, downsample.py:60-120) ----
    keys = iter(jax.random.split(k1, 256))
    in_mult = (1,) + tuple(cfg.ch_mult)
    curr_res = cfg.resolution
    down = []
    for i in range(n):
        ci = cfg.ch * in_mult[i]
        co = cfg.ch * cfg.ch_mult[i]
        stage = {"block": [], "attn": []}
        c = ci
        for _ in range(cfg.num_res_blocks):
            stage["block"].append(_rb_init(keys, c, co, cfg))
            c = co
            if curr_res in cfg.attn_resolutions:
                stage["attn"].append(_attn_init(keys, c, cfg))
        if i != n - 1:
            stage["downsample"] = _c2(next(keys), c, c, 3, dtype)
            curr_res //= 2
        else:
            stage["downsample"] = None
        down.append(stage)
    block_in = cfg.ch * cfg.ch_mult[-1]
    enc = {
        "conv_in": _c2(next(keys), cfg.ch, cfg.in_channels, 3, dtype),
        "down": down,
        "mid": _mid_init(keys, block_in, cfg),
        "norm_out": _gn(block_in, dtype, cfg.norm_type),
        "conv_out": _c2(next(keys),
                        2 * cfg.z_channels if cfg.double_z else cfg.z_channels,
                        block_in, 3, dtype),
        "per_channel_statistics": stats,
    }

    # ---- decoder (build_upsampling_path, upsample.py:58-105) ----
    keys = iter(jax.random.split(k2, 256))
    curr_res = cfg.resolution // (2 ** (n - 1))
    block_in = cfg.ch * cfg.ch_mult[-1]
    dec_conv_in = _c2(next(keys), block_in, cfg.z_channels, 3, dtype)
    mid = _mid_init(keys, block_in, cfg)
    up: list = [None] * n
    c = block_in
    for level in reversed(range(n)):
        co = cfg.ch * cfg.ch_mult[level]
        stage = {"block": [], "attn": []}
        for _ in range(cfg.num_res_blocks + 1):
            stage["block"].append(_rb_init(keys, c, co, cfg))
            c = co
            if curr_res in cfg.attn_resolutions:
                stage["attn"].append(_attn_init(keys, c, cfg))
        if level != 0:
            stage["upsample"] = _c2(next(keys), c, c, 3, dtype)
            curr_res *= 2
        else:
            stage["upsample"] = None
        up[level] = stage
    dec = {
        "conv_in": dec_conv_in,
        "mid": mid,
        "up": up,
        "norm_out": _gn(c, dtype, cfg.norm_type),
        "conv_out": _c2(next(keys), cfg.out_ch, c, 3, dtype),
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


# ---------------------------------------------------------------------------
# checkpoint import
# ---------------------------------------------------------------------------

def _filter_prefix(sd, prefix: str):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def audio_vae_config_from_state_dict(sd, **overrides) -> AudioVAEConfig:
    """Infer ddconfig geometry from a decoder state dict (keys already
    stripped to `conv_in.conv.weight`, `up.{i}...`)."""
    z = sd["conv_in.conv.weight"].shape[1]
    out_ch = sd["conv_out.conv.weight"].shape[0]
    n = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("up."))
    base = sd["conv_out.conv.weight"].shape[1]     # ch * ch_mult[0]
    mult = []
    for level in range(n):
        co = sd[f"up.{level}.block.0.conv1.conv.weight"].shape[0]
        mult.append(co)
    ch = base // (mult[0] // min(mult) if mult[0] >= min(mult) else 1)
    ch = min(mult)
    ch_mult = tuple(m // ch for m in mult)
    nrb = max(int(k.split(".")[3]) for k in sd
              if k.startswith("up.0.block.")) + 1 - 1  # +1 blocks in decoder
    stats_len = sd["per_channel_statistics.std-of-means"].shape[0]
    norm_type = "group" if "norm_out.weight" in sd else "pixel"
    has_mid_attn = any(k.startswith("mid.attn_1.q") for k in sd)
    kw = dict(ch=ch, ch_mult=ch_mult, z_channels=z, out_ch=out_ch,
              in_channels=out_ch, num_res_blocks=nrb, norm_type=norm_type,
              mid_block_add_attention=has_mid_attn,
              mel_bins=(stats_len // z) * (2 ** (len(ch_mult) - 1)))
    kw.update(overrides)
    return AudioVAEConfig(**kw)


def audio_vae_params_from_state_dict(sd, cfg: Optional[AudioVAEConfig] = None,
                                     side: str = "decoder",
                                     dtype=jnp.float32):
    """torch AudioDecoder/AudioEncoder state dict -> (params, cfg).

    Accepts comfy-layout keys (`audio_vae.decoder.*` /
    `audio_vae.per_channel_statistics.*`, model_configurator.py:108-124) or
    pre-stripped keys. Key layout: `conv_in.conv.weight` (CausalConv2d wraps
    a Conv2d), `mid.{block_1,attn_1,block_2}.*`, `up.{i}.block.{j}.
    {norm1,conv1,norm2,conv2,nin_shortcut}.*`, `up.{i}.upsample.conv.conv.*`,
    `down.{i}.downsample.conv.*` (plain Conv2d), AttnBlock `q/k/v/proj_out`
    plain convs, `per_channel_statistics.{std-of-means,mean-of-means}`."""
    pref = f"audio_vae.{side}."
    if any(k.startswith(pref) for k in sd):
        flat = _filter_prefix(sd, pref)
        stats = _filter_prefix(sd, "audio_vae.per_channel_statistics.")
        for k, v in stats.items():
            flat["per_channel_statistics." + k] = v
        sd = flat
    if cfg is None:
        if side != "decoder":
            raise ValueError("config inference needs the decoder side")
        cfg = audio_vae_config_from_state_dict(sd)

    def conv(name):
        key = name + ".conv.weight" if name + ".conv.weight" in sd \
            else name + ".weight"
        bkey = key.replace("weight", "bias")
        w = np.asarray(sd[key])
        if w.ndim == 3:          # 1x1 stored squeezed — not expected, guard
            w = w[..., None]
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(sd[bkey], dtype)}

    def norm(name):
        if name + ".weight" in sd:
            return {"scale": jnp.asarray(sd[name + ".weight"], dtype),
                    "bias": jnp.asarray(sd[name + ".bias"], dtype)}
        return None              # pixel norm: parameterless

    def res(pre):
        p = {"norm1": norm(pre + ".norm1"), "conv1": conv(pre + ".conv1"),
             "norm2": norm(pre + ".norm2"), "conv2": conv(pre + ".conv2")}
        if pre + ".nin_shortcut.conv.weight" in sd or \
                pre + ".nin_shortcut.weight" in sd:
            p["nin_shortcut"] = conv(pre + ".nin_shortcut")
        elif pre + ".conv_shortcut.conv.weight" in sd:
            p["nin_shortcut"] = conv(pre + ".conv_shortcut")
        else:
            p["nin_shortcut"] = None
        return p

    def attn(pre):
        return {"norm": norm(pre + ".norm"), "q": conv(pre + ".q"),
                "k": conv(pre + ".k"), "v": conv(pre + ".v"),
                "proj_out": conv(pre + ".proj_out")}

    def mid(pre):
        has_attn = any(k.startswith(pre + ".attn_1.q") for k in sd)
        return {"block_1": res(pre + ".block_1"),
                "attn_1": attn(pre + ".attn_1") if has_attn else None,
                "block_2": res(pre + ".block_2")}

    def stage(pre, n_blocks):
        st = {"block": [res(f"{pre}.block.{j}") for j in range(n_blocks)],
              "attn": []}
        j = 0
        while any(k.startswith(f"{pre}.attn.{j}.") for k in sd):
            st["attn"].append(attn(f"{pre}.attn.{j}"))
            j += 1
        if any(k.startswith(f"{pre}.upsample.") for k in sd):
            st["upsample"] = conv(f"{pre}.upsample.conv")
        elif any(k.startswith(f"{pre}.downsample.") for k in sd):
            st["downsample"] = conv(f"{pre}.downsample.conv")
        else:
            st["upsample" if side == "decoder" else "downsample"] = None
        return st

    stats = {
        "mean": jnp.asarray(sd["per_channel_statistics.mean-of-means"],
                            jnp.float32),
        "std": jnp.asarray(sd["per_channel_statistics.std-of-means"],
                           jnp.float32)}
    n = cfg.num_resolutions
    params = {
        "conv_in": conv("conv_in"),
        "mid": mid("mid"),
        "norm_out": norm("norm_out"),
        "conv_out": conv("conv_out"),
        "per_channel_statistics": stats,
    }
    if side == "decoder":
        params["up"] = [stage(f"up.{i}", cfg.num_res_blocks + 1)
                        for i in range(n)]
    else:
        params["down"] = [stage(f"down.{i}", cfg.num_res_blocks)
                          for i in range(n)]
    return params, cfg


def vocoder_config_from_state_dict(sd, **overrides) -> VocoderConfig:
    """Infer vocoder geometry from state-dict shapes; rates/dilations are
    config-only, taken from defaults unless overridden
    (model_configurator.py:10-28)."""
    n_up = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("ups."))
    uic = sd["conv_pre.weight"].shape[0]
    in_ch = sd["conv_pre.weight"].shape[1]
    stereo = sd["conv_post.weight"].shape[0] == 2
    kernel_sizes = tuple(sd[f"ups.{i}.weight"].shape[2] for i in range(n_up))
    n_res = 1 + max(int(k.split(".")[1])
                    for k in sd if k.startswith("resblocks."))
    nk = n_res // n_up
    res_k = tuple(sd[f"resblocks.{j}.convs1.0.weight"].shape[2]
                  for j in range(nk))
    defaults = VocoderConfig()
    rates = defaults.upsample_rates if len(
        defaults.upsample_rates) == n_up else tuple(
        k // 2 for k in kernel_sizes)           # HiFi-GAN convention k=2s
    dil = defaults.resblock_dilations[:nk] if len(
        defaults.resblock_dilations) >= nk else ((1, 3, 5),) * nk
    nd = max(int(k.split(".")[3]) for k in sd
             if k.startswith("resblocks.0.convs1.")) + 1
    dil = tuple(d[:nd] if len(d) >= nd else tuple([1] * nd) for d in dil)
    kw = dict(mel_bins=in_ch // (2 if stereo else 1), stereo=stereo,
              upsample_initial_channel=uic,
              upsample_rates=rates, upsample_kernel_sizes=kernel_sizes,
              resblock_kernel_sizes=res_k, resblock_dilations=dil)
    kw.update(overrides)
    return VocoderConfig(**kw)


def vocoder_params_from_state_dict(sd, cfg: Optional[VocoderConfig] = None,
                                   dtype=jnp.float32):
    """torch Vocoder state dict -> (params, cfg). Accepts comfy `vocoder.*`
    keys (VOCODER_COMFY_KEYS_FILTER) or pre-stripped. ConvTranspose1d weights
    keep torch's (in, out, k) layout (our _tconv1d uses IOH)."""
    if any(k.startswith("vocoder.") for k in sd):
        sd = _filter_prefix(sd, "vocoder.")
    if cfg is None:
        cfg = vocoder_config_from_state_dict(sd)

    def c1(name):
        return {"w": jnp.asarray(sd[name + ".weight"], dtype),
                "b": jnp.asarray(sd[name + ".bias"], dtype)}

    nk = len(cfg.resblock_kernel_sizes)
    n_up = len(cfg.upsample_rates)
    params = {
        "conv_pre": c1("conv_pre"),
        "ups": [c1(f"ups.{i}") for i in range(n_up)],
        "resblocks": [],
        "conv_post": c1("conv_post"),
    }
    for idx in range(n_up * nk):
        nd = len(cfg.resblock_dilations[idx % nk])
        params["resblocks"].append({
            "convs1": [c1(f"resblocks.{idx}.convs1.{j}") for j in range(nd)],
            "convs2": [c1(f"resblocks.{idx}.convs2.{j}") for j in range(nd)],
        })
    return params, cfg
