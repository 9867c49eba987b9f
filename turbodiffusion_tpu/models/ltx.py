"""LTX-2 joint audio-video diffusion transformer — TPU-native functional model.

Behavioral reference: TurboT2AV/LTX-2/packages/ltx-core/src/ltx_core/model/
transformer/{model.py, transformer.py, attention.py, adaln.py} — the 19B
AV DiT: 48 BasicAVTransformerBlocks, video stream 32 heads x 128 d_head
(inner 4096), audio stream 32 heads x 64 d_head (inner 2048), Gemma caption
context (3840), AdaLN-single scale-shift tables, bidirectional audio<->video
cross attention with 4+1-entry ada tables, per-modality output modulation.

The fused "FastNorm" helper suite (modulated_rms_norm / modulate /
gated_residual / *_from_ada / output_modulate — TurboT2AV
fast_norm_kernels.py and transformer.py:21-96) is implemented as jnp
functions; XLA fuses these elementwise chains into neighbors on TPU, which is
exactly what the reference's Triton kernels do by hand on H20.

Blocks are stacked and run under one lax.scan, like models/wan.py.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from turbodiffusion_tpu.config import AttentionConfig
from turbodiffusion_tpu.models import layers as L

from turbodiffusion_tpu.ops.attention import attention as attn_dispatch
from turbodiffusion_tpu.ops.attention import dense_attention
from turbodiffusion_tpu.ops.quant import linear_maybe_quant


@dataclass(frozen=True)
class LTXConfig:
    """LTXModel constructor surface (ltx-core model.py:47-125)."""
    num_layers: int = 48
    # video stream
    video_heads: int = 32
    video_head_dim: int = 128
    video_in_channels: int = 128
    video_out_channels: int = 128
    cross_attention_dim: int = 4096
    caption_channels: int = 3840
    # audio stream
    audio_heads: int = 32
    audio_head_dim: int = 64
    audio_in_channels: int = 128
    audio_out_channels: int = 128
    audio_cross_attention_dim: int = 2048
    norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    timestep_scale_multiplier: float = 1000.0
    dtype: Any = jnp.bfloat16
    # acceleration hooks (applied per layer by ltx_accel)
    video_self_attention: AttentionConfig = field(
        default_factory=AttentionConfig)
    remat: str = "none"

    @property
    def video_dim(self) -> int:
        return self.video_heads * self.video_head_dim

    @property
    def audio_dim(self) -> int:
        return self.audio_heads * self.audio_head_dim

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def ltx_test_config(**kw) -> LTXConfig:
    base = dict(num_layers=2, video_heads=2, video_head_dim=24,
                video_in_channels=8, video_out_channels=8,
                cross_attention_dim=48, caption_channels=16,
                audio_heads=2, audio_head_dim=12, audio_in_channels=4,
                audio_out_channels=4, audio_cross_attention_dim=24,
                dtype=jnp.float32)
    base.update(kw)
    return LTXConfig(**base)


# ---------------------------------------------------------------------------
# FastNorm fusion helpers (transformer.py:21-96; fast_norm_kernels.py)
# ---------------------------------------------------------------------------

def rms_norm(x, eps: float = 1e-6):
    """Unweighted RMS norm (ltx_core.utils.rms_norm)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype)


def modulate(x, scale, shift):
    return x * (1 + scale) + shift


def modulated_rms_norm(x, scale, shift, eps: float = 1e-6):
    return modulate(rms_norm(x, eps), scale, shift)


def gated_residual(x, residual, gate, mask=1.0):
    return x + residual * gate * mask


def _ada_value(table, timestep, index: int, num_ada: int):
    """table (num_ada, D); timestep (B, Lt, num_ada*D) -> (B, Lt, D)
    (transformer.py:45-54)."""
    B, Lt = timestep.shape[0], timestep.shape[1]
    tv = timestep.reshape(B, Lt, num_ada, -1)[:, :, index]
    return table[index][None, None].astype(timestep.dtype) + tv


def modulated_rms_norm_from_ada(x, table, timestep, scale_index, shift_index,
                                num_ada, eps: float = 1e-6):
    scale = _ada_value(table, timestep, scale_index, num_ada)
    shift = _ada_value(table, timestep, shift_index, num_ada)
    return modulated_rms_norm(x, scale.astype(x.dtype),
                              shift.astype(x.dtype), eps)


def modulate_from_ada(x, table, timestep, scale_index, shift_index, num_ada):
    scale = _ada_value(table, timestep, scale_index, num_ada)
    shift = _ada_value(table, timestep, shift_index, num_ada)
    return modulate(x, scale.astype(x.dtype), shift.astype(x.dtype))


def gated_residual_from_ada(x, residual, table, timestep, gate_index, num_ada,
                            mask=1.0):
    gate = _ada_value(table, timestep, gate_index, num_ada)
    return gated_residual(x, residual, gate.astype(x.dtype), mask)


def output_modulate(x, scale_shift_table, embedded_timestep):
    """Final modulation (model.py:32-38): table (2, D); embedded (B, Lt, D)."""
    vals = scale_shift_table[None, None].astype(x.dtype) + \
        embedded_timestep[:, :, None].astype(x.dtype)
    shift, scale = vals[:, :, 0], vals[:, :, 1]
    return x * (1 + scale) + shift


# ---------------------------------------------------------------------------
# Attention (attention.py:145-207): qk-RMSNorm(weighted), optional rope
# ---------------------------------------------------------------------------

def _wrms(x, w, eps):
    return rms_norm(x, eps) * w.astype(x.dtype)


def ltx_attention(p, x, heads: int, d_head: int, cfg: LTXConfig,
                  context=None, freqs=None, k_freqs=None, mask=None,
                  attn_cfg: Optional[AttentionConfig] = None):
    """Returns to_out(attn(q_norm(to_q x) . k_norm(to_k ctx) . to_v ctx)).

    Supports fused to_qkv / to_kv weights if present (attention.py:186-196)
    and pluggable attention backends via attn_cfg — the injection point the
    reference's acceleration layer monkey-patches (acceleration.py:441-575).
    """
    ctx = x if context is None else context
    if context is None and "to_qkv" in p:
        qkv = linear_maybe_quant(p["to_qkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear_maybe_quant(p["to_q"], x)
        if "to_kv" in p:
            k, v = jnp.split(linear_maybe_quant(p["to_kv"], ctx), 2, axis=-1)
        else:
            k = linear_maybe_quant(p["to_k"], ctx)
            v = linear_maybe_quant(p["to_v"], ctx)
    q = _wrms(q, p["q_norm"], cfg.norm_eps)
    k = _wrms(k, p["k_norm"], cfg.norm_eps)

    B, Lq = q.shape[:2]
    Lk = k.shape[1]
    if freqs is not None:
        # LTX rope runs over the FULL inner width before the head split
        # (attention.py:198-203 applies pe to (B, L, inner); the ladder
        # spans inner_dim, so heads see different frequency slices)
        from turbodiffusion_tpu.models.rope import apply_rope_interleaved
        inner = q.shape[-1]
        q = apply_rope_interleaved(q[:, :, None], freqs)[:, :, 0]
        kf = k_freqs if k_freqs is not None else freqs
        k = apply_rope_interleaved(k[:, :, None], kf)[:, :, 0]
    q = q.reshape(B, Lq, heads, d_head)
    k = k.reshape(B, Lk, heads, d_head)
    v = v.reshape(B, Lk, heads, d_head)

    if attn_cfg is not None and attn_cfg.backend in ("sla", "sagesla") \
            and context is None:
        o = attn_dispatch(q, k, v, attn_cfg, proj_l=p.get("proj_l"))
    else:
        import os as _os

        import jax as _jax
        if (context is not None and mask is None
                and "w_int8" in p["to_out"]
                and p["to_out"]["scale"].ndim == 1
                and _jax.default_backend() == "tpu" and d_head % 128 == 0
                # wide widths (LTX-2 video trunk: 32*128=4096) route to the
                # head-grouped kernel inside cross_attention_qout
                and _os.environ.get("TDX_CROSS_QOUT", "1") == "1"):
            # fused text-cross attention + per-token int8 to_out feed
            # (same kernel as the Wan cross-attn, models/wan.py)
            from turbodiffusion_tpu.ops.flash_pallas import (
                cross_attention_qout)
            from turbodiffusion_tpu.ops.quant import int8_linear_prequant
            xq8, rs = cross_attention_qout(q, k, v)
            return int8_linear_prequant(xq8, rs, p["to_out"])
        o = dense_attention(q, k, v)
    return linear_maybe_quant(p["to_out"], o.reshape(B, Lq, heads * d_head))


# ---------------------------------------------------------------------------
# AV transformer block (transformer.py:97-393)
# ---------------------------------------------------------------------------

def ltx_av_block(p, vx, ax, vts, ats, v_cross_ts, a_cross_ts, v_gate_ts,
                 a_gate_ts, v_ctx, a_ctx, v_freqs, a_freqs, v_cross_freqs,
                 a_cross_freqs, cfg: LTXConfig,
                 attn_cfg: Optional[AttentionConfig] = None):
    eps = cfg.norm_eps
    Hv, Dv = cfg.video_heads, cfg.video_head_dim
    Ha, Da = cfg.audio_heads, cfg.audio_head_dim

    # -------- video self + text-cross --------
    norm_vx = modulated_rms_norm_from_ada(vx, p["scale_shift_table"], vts,
                                          scale_index=1, shift_index=0,
                                          num_ada=6, eps=eps)
    vx = gated_residual_from_ada(
        vx, ltx_attention(p["attn1"], norm_vx, Hv, Dv, cfg, freqs=v_freqs,
                          attn_cfg=attn_cfg),
        p["scale_shift_table"], vts, gate_index=2, num_ada=6)
    vx = vx + ltx_attention(p["attn2"], rms_norm(vx, eps), Hv, Dv, cfg,
                            context=v_ctx)

    # -------- audio self + text-cross --------
    norm_ax = modulated_rms_norm_from_ada(ax, p["audio_scale_shift_table"],
                                          ats, scale_index=1, shift_index=0,
                                          num_ada=6, eps=eps)
    ax = gated_residual_from_ada(
        ax, ltx_attention(p["audio_attn1"], norm_ax, Ha, Da, cfg,
                          freqs=a_freqs),
        p["audio_scale_shift_table"], ats, gate_index=2, num_ada=6)
    ax = ax + ltx_attention(p["audio_attn2"], rms_norm(ax, eps), Ha, Da, cfg,
                            context=a_ctx)

    # -------- audio <-> video cross attention --------
    vx_n3 = rms_norm(vx, eps)
    ax_n3 = rms_norm(ax, eps)
    vt_av = p["scale_shift_table_a2v_ca_video"]   # (5, Dv): 4 scale/shift + 1 gate
    at_av = p["scale_shift_table_a2v_ca_audio"]

    vx_s = modulate_from_ada(vx_n3, vt_av, v_cross_ts, 0, 1, 4)
    ax_s = modulate_from_ada(ax_n3, at_av, a_cross_ts, 0, 1, 4)
    a2v = ltx_attention(p["audio_to_video_attn"], vx_s, Ha, Da, cfg,
                        context=ax_s, freqs=v_cross_freqs,
                        k_freqs=a_cross_freqs)
    vx = gated_residual_from_ada(vx, a2v, vt_av[4:], v_gate_ts, 0, 1)

    ax_s2 = modulate_from_ada(ax_n3, at_av, a_cross_ts, 2, 3, 4)
    vx_s2 = modulate_from_ada(vx_n3, vt_av, v_cross_ts, 2, 3, 4)
    v2a = ltx_attention(p["video_to_audio_attn"], ax_s2, Ha, Da, cfg,
                        context=vx_s2, freqs=a_cross_freqs,
                        k_freqs=v_cross_freqs)
    ax = gated_residual_from_ada(ax, v2a, at_av[4:], a_gate_ts, 0, 1)

    # -------- FFNs --------
    vx_s = modulated_rms_norm_from_ada(vx, p["scale_shift_table"], vts,
                                       scale_index=4, shift_index=3,
                                       num_ada=6, eps=eps)
    ff = linear_maybe_quant(
        p["ff"]["fc2"], L.gelu_tanh(linear_maybe_quant(p["ff"]["fc1"], vx_s)))
    vx = gated_residual_from_ada(vx, ff, p["scale_shift_table"], vts,
                                 gate_index=5, num_ada=6)

    ax_s = modulated_rms_norm_from_ada(ax, p["audio_scale_shift_table"], ats,
                                       scale_index=4, shift_index=3,
                                       num_ada=6, eps=eps)
    aff = linear_maybe_quant(
        p["audio_ff"]["fc2"],
        L.gelu_tanh(linear_maybe_quant(p["audio_ff"]["fc1"], ax_s)))
    ax = gated_residual_from_ada(ax, aff, p["audio_scale_shift_table"], ats,
                                 gate_index=5, num_ada=6)
    return vx, ax


# ---------------------------------------------------------------------------
# AdaLN-single (adaln.py:8-34): PixArt combined timestep embedding
# ---------------------------------------------------------------------------

def adaln_single(p, timestep_B_L, dim: int, coeff: int):
    """timestep (B, Lt) scaled values -> (modulation (B, Lt, coeff*dim),
    embedded (B, Lt, dim))."""
    emb = L.sinusoidal_embedding_1d(256, timestep_B_L.reshape(-1))
    h = jnp.matmul(emb, p["emb_fc1"]["w"].astype(jnp.float32)) + \
        p["emb_fc1"]["b"].astype(jnp.float32)
    h = jax.nn.silu(h)
    embedded = jnp.matmul(h, p["emb_fc2"]["w"].astype(jnp.float32)) + \
        p["emb_fc2"]["b"].astype(jnp.float32)
    mod = jnp.matmul(jax.nn.silu(embedded),
                     p["linear"]["w"].astype(jnp.float32)) + \
        p["linear"]["b"].astype(jnp.float32)
    B, Lt = timestep_B_L.shape
    return mod.reshape(B, Lt, coeff * dim), embedded.reshape(B, Lt, dim)


def video_token_positions(T: int, H: int, W: int, fps: float = 24.0,
                          scale=(8, 32, 32)):
    """(3, T*H*W) middle positions (time sec, y px, x px) of video tokens.

    Patch bounds [i, i+1) in latent coords scaled by the VAE downscale
    factors (video_vae.py:442: time 8, space 32) with the causal-VAE
    temporal fix `(p + 1 - 8).clamp(0)` applied to both bounds, time /fps
    (tools.get_pixel_coords; patchifiers.get_patch_grid_bounds;
    ltx_wrapper.py:196-224); rope uses the bound middles
    (use_middle_indices_grid, rope.py:131-134)."""
    st, sy, sx = scale

    def mid_t(i):
        lo = jnp.clip(i * st + 1 - st, 0)
        hi = jnp.clip((i + 1) * st + 1 - st, 0)
        return (lo + hi) / 2.0 / fps

    t = mid_t(jnp.arange(T, dtype=jnp.float32))
    y = (jnp.arange(H, dtype=jnp.float32) + 0.5) * sy
    x = (jnp.arange(W, dtype=jnp.float32) + 0.5) * sx
    tt = jnp.broadcast_to(t[:, None, None], (T, H, W)).reshape(-1)
    yy = jnp.broadcast_to(y[None, :, None], (T, H, W)).reshape(-1)
    xx = jnp.broadcast_to(x[None, None, :], (T, H, W)).reshape(-1)
    return jnp.stack([tt, yy, xx])


def audio_token_positions(La: int, sample_rate: float = 16000.0,
                          hop: float = 160.0, down: int = 4):
    """(1, La) middle positions (seconds) of audio latent tokens
    (ltx_wrapper.py:233-288: mel frame = latent*4 with causal clip
    `(m + 1 - 4).clip(0)`, seconds = mel * hop / sample_rate)."""
    def t_sec(i):
        return jnp.clip(i * down + 1 - down, 0) * hop / sample_rate

    lo = t_sec(jnp.arange(La, dtype=jnp.float32))
    hi = t_sec(jnp.arange(1, La + 1, dtype=jnp.float32))
    return ((lo + hi) / 2.0)[None]


def ltx_forward(params, cfg: LTXConfig, video_tokens, audio_tokens,
                video_timestep, audio_timestep, caption_video, caption_audio,
                video_grid: Tuple[int, int, int],
                attn_cfgs: Optional[list] = None):
    """LTXModel.forward. video_tokens (B, Lv, C_in) pre-patchified latents
    (patch_size=1 reshape, ltx-core patchifiers); audio (B, La, C_in);
    timesteps (B, 1) sigma in [0,1]; captions (B, Lc, caption_channels);
    video_grid = (T, H, W) with T*H*W == Lv.

    attn_cfgs: optional per-layer AttentionConfig list (the --sla_topk_schedule
    mechanism, acceleration.py:441-492). None -> dense everywhere.
    """
    B, Lv, _ = video_tokens.shape
    La = audio_tokens.shape[1]
    dt = cfg.dtype

    # multi-chip: video tokens ride (data, context) like the Wan trunk
    # (wan.py:403); audio is short — data-sharded only. constrain is a
    # no-op without an active mesh (parallel/sharding.py:69).
    from turbodiffusion_tpu.parallel.sharding import constrain
    vx = L.linear(params["patchify_proj"], video_tokens.astype(dt))
    ax = L.linear(params["audio_patchify_proj"], audio_tokens.astype(dt))
    vx = constrain(vx, ("data", "context", None))
    ax = constrain(ax, ("data", None, None))

    ts_mult = cfg.timestep_scale_multiplier
    vts, v_emb = adaln_single(params["adaln_single"],
                              video_timestep * ts_mult, cfg.video_dim, 6)
    ats, a_emb = adaln_single(params["audio_adaln_single"],
                              audio_timestep * ts_mult, cfg.audio_dim, 6)
    # AV cross-attention scale-shift/gate adalns (model.py:178-201);
    # av_ca_timestep_scale_multiplier = 1
    v_cts, _ = adaln_single(params["av_ca_video_ss"], video_timestep,
                            cfg.video_dim, 4)
    a_cts, _ = adaln_single(params["av_ca_audio_ss"], audio_timestep,
                            cfg.audio_dim, 4)
    v_gts, _ = adaln_single(params["av_ca_a2v_gate"], video_timestep,
                            cfg.video_dim, 1)
    a_gts, _ = adaln_single(params["av_ca_v2a_gate"], audio_timestep,
                            cfg.audio_dim, 1)

    v_ctx = L.linear(params["caption_projection"]["fc2"], jax.nn.gelu(
        L.linear(params["caption_projection"]["fc1"],
                 caption_video.astype(dt)), approximate=True))
    a_ctx = L.linear(params["audio_caption_projection"]["fc2"], jax.nn.gelu(
        L.linear(params["audio_caption_projection"]["fc1"],
                 caption_audio.astype(dt)), approximate=True))

    T, Hh, W = video_grid
    # LTX fractional rope over the FULL inner width (transformer_args.py:106:
    # dim=inner_dim; max_pos [20, 2048, 2048] video / [20] audio,
    # model.py:84-109)
    from turbodiffusion_tpu.models.rope import ltx_freqs
    v_pos = video_token_positions(T, Hh, W)
    a_pos = audio_token_positions(La)
    v_freqs = ltx_freqs(v_pos, cfg.video_dim, cfg.rope_theta,
                        (20.0, 2048.0, 2048.0))
    a_freqs = ltx_freqs(a_pos, cfg.audio_dim, cfg.rope_theta, (20.0,))
    # AV cross attention: temporal-only pe at audio_cross_attention_dim,
    # max_pos [max(20, 20)] (transformer_args.py:193-200)
    ca_dim = cfg.audio_heads * cfg.audio_head_dim
    v_cross_freqs = ltx_freqs(v_pos[0:1], ca_dim, cfg.rope_theta, (20.0,))
    a_cross_freqs = ltx_freqs(a_pos, ca_dim, cfg.rope_theta, (20.0,))

    per_layer = attn_cfgs is not None

    def block_fn(carry, blk):
        vx, ax = carry
        vx, ax = ltx_av_block(
            blk, vx, ax, vts, ats, v_cts, a_cts, v_gts, a_gts, v_ctx, a_ctx,
            v_freqs, a_freqs, v_cross_freqs, a_cross_freqs, cfg,
            attn_cfg=None)
        vx = constrain(vx, ("data", "context", None))
        return (vx, ax), None

    if per_layer:
        # heterogeneous per-layer attention configs: python loop over layers
        for i in range(cfg.num_layers):
            blk = jax.tree.map(lambda x: x[i], params["blocks"])
            vx, ax = ltx_av_block(
                blk, vx, ax, vts, ats, v_cts, a_cts, v_gts, a_gts, v_ctx,
                a_ctx, v_freqs, a_freqs, v_cross_freqs, a_cross_freqs, cfg,
                attn_cfg=attn_cfgs[i])
    else:
        bf = block_fn
        if cfg.remat != "none":
            bf = jax.checkpoint(
                bf, policy=jax.checkpoint_policies.checkpoint_dots)
        (vx, ax), _ = jax.lax.scan(bf, (vx, ax), params["blocks"])

    # output heads (model.py:32-38,146-176)
    vx = output_modulate(L.layer_norm(vx, eps=cfg.norm_eps),
                         params["scale_shift_table"], v_emb)
    video_out = L.linear(params["proj_out"], vx)
    ax = output_modulate(L.layer_norm(ax, eps=cfg.norm_eps),
                         params["audio_scale_shift_table"], a_emb)
    audio_out = L.linear(params["audio_proj_out"], ax)
    return video_out.astype(jnp.float32), audio_out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Scheduler (ltx-core components/schedulers.py:14-56)
# ---------------------------------------------------------------------------

def ltx2_sigmas(steps: int, num_tokens: int = 4096, max_shift: float = 2.05,
                base_shift: float = 0.95, stretch: bool = True,
                terminal: float = 0.1) -> np.ndarray:
    """Token-count-shifted sigma schedule with terminal stretch."""
    sigmas = np.linspace(1.0, 0.0, steps + 1)
    mm = (max_shift - base_shift) / (4096 - 1024)
    b = base_shift - mm * 1024
    shift = num_tokens * mm + b
    nz = sigmas != 0
    out = sigmas.copy()
    out[nz] = math.exp(shift) / (math.exp(shift) + (1 / sigmas[nz] - 1))
    if stretch:
        one_minus = 1.0 - out[nz]
        scale = one_minus[-1] / (1.0 - terminal)
        out[nz] = 1.0 - one_minus / scale
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# Checkpoint import (ltx_core/loader + model_configurator.py:170-174)
# ---------------------------------------------------------------------------

COMFY_GENERATOR_PREFIX = "model.diffusion_model."


def strip_comfy_prefix(sd, prefix: str = COMFY_GENERATOR_PREFIX):
    """Comfy-layout safetensors keep the generator under
    `model.diffusion_model.` (LTXV_MODEL_COMFY_RENAMING_MAP,
    model_configurator.py:170-174). Pass-through when absent."""
    if not any(k.startswith(prefix) for k in sd):
        return sd
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def ltx_config_from_state_dict(sd, **overrides) -> LTXConfig:
    """Infer the LTXConfig geometry from a generator state dict (dims and
    depth from weight shapes; head_dim is fixed by the architecture:
    128 video / 64 audio, model.py:50-68)."""
    import numpy as _np

    def shape(k):
        return tuple(sd[k].shape)

    num_layers = 1 + max(int(k.split(".")[1]) for k in sd
                         if k.startswith("transformer_blocks."))
    Dv, v_in = shape("patchify_proj.weight")
    Da, a_in = shape("audio_patchify_proj.weight")
    caption = shape("caption_projection.linear_1.weight")[1]
    kw = dict(
        num_layers=num_layers,
        video_head_dim=128, video_heads=Dv // 128,
        audio_head_dim=64, audio_heads=Da // 64,
        video_in_channels=v_in, audio_in_channels=a_in,
        video_out_channels=shape("proj_out.weight")[0],
        audio_out_channels=shape("audio_proj_out.weight")[0],
        caption_channels=caption,
        cross_attention_dim=shape(
            "transformer_blocks.0.attn2.to_k.weight")[1],
        audio_cross_attention_dim=shape(
            "transformer_blocks.0.audio_attn2.to_k.weight")[1],
    )
    kw.update(overrides)
    return LTXConfig(**kw)


def ltx_params_from_state_dict(sd, cfg: Optional[LTXConfig] = None,
                               dtype=jnp.bfloat16):
    """torch LTXModel state dict -> (params, cfg).

    Key layout (model.py:135-176, transformer.py:110-178, attention.py:166-173,
    adaln.py:20-26, text_projection.py:14-21, feed_forward.py:12 /
    gelu_approx.py:7, timestep_embedding.py:130-134):
      patchify_proj.{weight,bias}; adaln_single.emb.timestep_embedder.
      linear_{1,2}.* + adaln_single.linear.*; caption_projection.linear_{1,2};
      scale_shift_table; proj_out; audio_* twins;
      av_ca_{video,audio}_scale_shift_adaln_single, av_ca_{a2v,v2a}_gate_…;
      transformer_blocks.{i}.{attn1,attn2,audio_attn1,audio_attn2,
      audio_to_video_attn,video_to_audio_attn}.{to_q,to_k,to_v,to_out.0,
      q_norm,k_norm}; …{ff,audio_ff}.net.{0.proj,2}; the four per-block
      scale-shift tables. SLA-finetuned checkpoints may carry
      …attention_function.local_attn.proj_l.* (acceleration.py:223-256).
    """
    sd = strip_comfy_prefix(sd)
    if cfg is None:
        cfg = ltx_config_from_state_dict(sd)
    if dtype is not None and dtype != cfg.dtype:
        cfg = cfg.replace(dtype=dtype)
    dt = cfg.dtype

    def lin(name, d=None):
        p = {"w": jnp.asarray(np.asarray(sd[name + ".weight"]).T, d or dt)}
        if name + ".bias" in sd:
            p["b"] = jnp.asarray(sd[name + ".bias"], d or dt)
        return p

    def adaln(name):
        return {
            "emb_fc1": lin(name + ".emb.timestep_embedder.linear_1",
                           jnp.float32),
            "emb_fc2": lin(name + ".emb.timestep_embedder.linear_2",
                           jnp.float32),
            "linear": lin(name + ".linear", jnp.float32),
        }

    def caption(name):
        return {"fc1": lin(name + ".linear_1"), "fc2": lin(name + ".linear_2")}

    def attn(pre):
        p = {"to_q": lin(pre + ".to_q"), "to_k": lin(pre + ".to_k"),
             "to_v": lin(pre + ".to_v"), "to_out": lin(pre + ".to_out.0"),
             "q_norm": jnp.asarray(sd[pre + ".q_norm.weight"], dt),
             "k_norm": jnp.asarray(sd[pre + ".k_norm.weight"], dt)}
        for pl in (pre + ".attention_function.local_attn.proj_l",
                   pre + ".proj_l"):
            if pl + ".weight" in sd:
                p["proj_l"] = {
                    "w": jnp.asarray(np.asarray(sd[pl + ".weight"]).T,
                                     jnp.float32),
                    "b": jnp.asarray(sd[pl + ".bias"], jnp.float32)}
                break
        return p

    def ff(pre):
        return {"fc1": lin(pre + ".net.0.proj"), "fc2": lin(pre + ".net.2")}

    def table(key, d=dt):
        return jnp.asarray(sd[key], d)

    def one_block(i):
        pre = f"transformer_blocks.{i}"
        return {
            "attn1": attn(pre + ".attn1"),
            "attn2": attn(pre + ".attn2"),
            "ff": ff(pre + ".ff"),
            "scale_shift_table": table(pre + ".scale_shift_table"),
            "audio_attn1": attn(pre + ".audio_attn1"),
            "audio_attn2": attn(pre + ".audio_attn2"),
            "audio_ff": ff(pre + ".audio_ff"),
            "audio_scale_shift_table": table(
                pre + ".audio_scale_shift_table"),
            "audio_to_video_attn": attn(pre + ".audio_to_video_attn"),
            "video_to_audio_attn": attn(pre + ".video_to_audio_attn"),
            "scale_shift_table_a2v_ca_video": table(
                pre + ".scale_shift_table_a2v_ca_video"),
            "scale_shift_table_a2v_ca_audio": table(
                pre + ".scale_shift_table_a2v_ca_audio"),
        }

    blocks = [one_block(i) for i in range(cfg.num_layers)]
    # proj_l presence must be uniform for scan-stacking; blocks missing it
    # get the zero init (equivalent: zero proj_l contributes nothing)
    for a_key in ("attn1", "audio_attn1"):
        if any("proj_l" in b[a_key] for b in blocks):
            dh = (cfg.video_head_dim if a_key == "attn1"
                  else cfg.audio_head_dim)
            for b in blocks:
                b[a_key].setdefault("proj_l", {
                    "w": jnp.zeros((dh, dh), jnp.float32),
                    "b": jnp.zeros((dh,), jnp.float32)})
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    params = {
        "patchify_proj": lin("patchify_proj"),
        "audio_patchify_proj": lin("audio_patchify_proj"),
        "adaln_single": adaln("adaln_single"),
        "audio_adaln_single": adaln("audio_adaln_single"),
        "av_ca_video_ss": adaln("av_ca_video_scale_shift_adaln_single"),
        "av_ca_audio_ss": adaln("av_ca_audio_scale_shift_adaln_single"),
        "av_ca_a2v_gate": adaln("av_ca_a2v_gate_adaln_single"),
        "av_ca_v2a_gate": adaln("av_ca_v2a_gate_adaln_single"),
        "caption_projection": caption("caption_projection"),
        "audio_caption_projection": caption("audio_caption_projection"),
        "scale_shift_table": table("scale_shift_table", jnp.float32),
        "audio_scale_shift_table": table("audio_scale_shift_table",
                                         jnp.float32),
        "proj_out": lin("proj_out", jnp.float32),
        "audio_proj_out": lin("audio_proj_out", jnp.float32),
        "blocks": stacked,
    }
    return params, cfg


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _lin_init(key, i, o, dtype, std=0.02):
    k1, _ = jax.random.split(key)
    return {"w": (jax.random.normal(k1, (i, o)) * std).astype(dtype),
            "b": jnp.zeros((o,), dtype)}


def init_ltx_params(key, cfg: LTXConfig):
    dt = cfg.dtype
    Dv, Da = cfg.video_dim, cfg.audio_dim
    keys = iter(jax.random.split(key, 64))

    def adaln_init(k, dim, coeff):
        ks = iter(jax.random.split(k, 4))
        return {"emb_fc1": _lin_init(next(ks), 256, dim, jnp.float32),
                "emb_fc2": _lin_init(next(ks), dim, dim, jnp.float32),
                "linear": _lin_init(next(ks), dim, coeff * dim, jnp.float32)}

    def attn_init(k, q_dim, ctx_dim, heads, d_head):
        ks = iter(jax.random.split(k, 6))
        inner = heads * d_head
        return {"to_q": _lin_init(next(ks), q_dim, inner, dt),
                "to_k": _lin_init(next(ks), ctx_dim, inner, dt),
                "to_v": _lin_init(next(ks), ctx_dim, inner, dt),
                "to_out": _lin_init(next(ks), inner, q_dim, dt),
                "q_norm": jnp.ones((inner,), dt),
                "k_norm": jnp.ones((inner,), dt)}

    def block_init(k):
        ks = iter(jax.random.split(k, 16))
        ffv, ffa = 4 * Dv, 4 * Da
        return {
            "attn1": attn_init(next(ks), Dv, Dv, cfg.video_heads,
                               cfg.video_head_dim),
            "attn2": attn_init(next(ks), Dv, Dv, cfg.video_heads,
                               cfg.video_head_dim),
            "ff": {"fc1": _lin_init(next(ks), Dv, ffv, dt),
                   "fc2": _lin_init(next(ks), ffv, Dv, dt)},
            "scale_shift_table": (jax.random.normal(next(ks), (6, Dv))
                                  * Dv ** -0.5).astype(dt),
            "audio_attn1": attn_init(next(ks), Da, Da, cfg.audio_heads,
                                     cfg.audio_head_dim),
            "audio_attn2": attn_init(next(ks), Da, Da, cfg.audio_heads,
                                     cfg.audio_head_dim),
            "audio_ff": {"fc1": _lin_init(next(ks), Da, ffa, dt),
                         "fc2": _lin_init(next(ks), ffa, Da, dt)},
            "audio_scale_shift_table": (jax.random.normal(
                jax.random.fold_in(k, 1), (6, Da)) * Da ** -0.5).astype(dt),
            "audio_to_video_attn": attn_init(
                jax.random.fold_in(k, 2), Dv, Da, cfg.audio_heads,
                cfg.audio_head_dim),
            "video_to_audio_attn": attn_init(
                jax.random.fold_in(k, 3), Da, Dv, cfg.audio_heads,
                cfg.audio_head_dim),
            "scale_shift_table_a2v_ca_video": (jax.random.normal(
                jax.random.fold_in(k, 4), (5, Dv)) * Dv ** -0.5).astype(dt),
            "scale_shift_table_a2v_ca_audio": (jax.random.normal(
                jax.random.fold_in(k, 5), (5, Da)) * Da ** -0.5).astype(dt),
        }

    blocks = jax.vmap(block_init)(
        jax.random.split(next(keys), cfg.num_layers))

    return {
        "patchify_proj": _lin_init(next(keys), cfg.video_in_channels, Dv, dt),
        "audio_patchify_proj": _lin_init(next(keys), cfg.audio_in_channels,
                                         Da, dt),
        "adaln_single": adaln_init(next(keys), Dv, 6),
        "audio_adaln_single": adaln_init(next(keys), Da, 6),
        "av_ca_video_ss": adaln_init(next(keys), Dv, 4),
        "av_ca_audio_ss": adaln_init(next(keys), Da, 4),
        "av_ca_a2v_gate": adaln_init(next(keys), Dv, 1),
        "av_ca_v2a_gate": adaln_init(next(keys), Da, 1),
        "caption_projection": {
            "fc1": _lin_init(next(keys), cfg.caption_channels, Dv, dt),
            "fc2": _lin_init(next(keys), Dv, Dv, dt)},
        "audio_caption_projection": {
            "fc1": _lin_init(next(keys), cfg.caption_channels, Da, dt),
            "fc2": _lin_init(next(keys), Da, Da, dt)},
        "scale_shift_table": (jax.random.normal(next(keys), (2, Dv))
                              * Dv ** -0.5).astype(jnp.float32),
        "audio_scale_shift_table": (jax.random.normal(next(keys), (2, Da))
                                    * Da ** -0.5).astype(jnp.float32),
        "proj_out": _lin_init(next(keys), Dv, cfg.video_out_channels,
                              jnp.float32),
        "audio_proj_out": _lin_init(next(keys), Da, cfg.audio_out_channels,
                                    jnp.float32),
        "blocks": blocks,
    }
