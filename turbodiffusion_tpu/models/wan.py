"""Wan2.1 / Wan2.2 video diffusion transformer — TPU-native functional model.

Behavioral reference: rcm/networks/wan2pt1.py:489-760 (WanModel) and
wan2pt2.py (single cross-attn; i2v via channel concat). Key design departures
from the torch module tree:

  * Pure function over a params pytree; no module surgery. Attention backend
    and quantized linears are selected by `WanConfig`, replacing
    inference/modify_model.py:40-81's replace_attention/replace_linear_norm.
  * All transformer blocks are *stacked* (leading num_layers axis) and run
    under one `jax.lax.scan`, so XLA compiles one block, not 30-40.
  * fp32 islands preserved exactly: time embedding/projection, AdaLN
    modulation, norms (wan2pt1.py:399-416,671-674).
  * Context/sequence parallelism is expressed with sharding constraints on a
    named mesh axis instead of explicit split/all-gather
    (rcm/utils/context_parallel.py:25-94 ≡ sequence-dim sharding here).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from einops import rearrange

from turbodiffusion_tpu.config import WanConfig
from turbodiffusion_tpu.models import layers as L
from turbodiffusion_tpu.models.rope import apply_rope, rope_freqs_3d
from turbodiffusion_tpu.ops.attention import attention, dense_attention
from turbodiffusion_tpu.ops.fused_norm import (
    modulated_layer_norm, rmsnorm_rope, rope_cos_sin_full)
from turbodiffusion_tpu.ops.quant import linear_maybe_quant
from turbodiffusion_tpu.parallel.sharding import constrain

# CLIP context tokens for wan2.1 i2v (wan2pt1.py:41-42)
T5_CONTEXT_TOKEN_NUMBER = 512


# ---------------------------------------------------------------------------
# Sub-forward functions
# ---------------------------------------------------------------------------

def _use_fused_sla(p, cfg: WanConfig) -> bool:
    """TPU inference takes the fully-fused SageSLA path
    (ops/attention.sla_attention_fused single-chip; parallel/ulysses.
    ulysses_sla_fused under a context mesh axis); CPU, training (jvp needs
    the reference impl) and non-sage backends use the composable path."""
    import jax as _jax
    from turbodiffusion_tpu.parallel.sharding import get_mesh
    from turbodiffusion_tpu.parallel.ulysses import context_parallel_size
    a = cfg.attention
    if not (a.backend == "sagesla" and not a.use_reference_impl
            and not a.jvp_mode
            and _jax.default_backend() == "tpu"
            and cfg.head_dim % 128 == 0
            # beyond dim 4096 (14B: 5120) the fused front-end tiles over
            # head groups with a precomputed full-dim RMS (row_rms_inv)
            and a.block_q >= 128 and a.block_k >= 128):
        return False
    cp = context_parallel_size(get_mesh())
    # the CP-fused path all-to-alls whole heads: need H divisible by cp
    return cp <= 1 or cfg.num_heads % cp == 0


def _prequantized(x):
    """x may be a (int8, row_scale) pair emitted by the quant-out fused LN."""
    return isinstance(x, tuple)


def _lin_q(p, x, act=None):
    """linear over a maybe-prequantized activation."""
    if _prequantized(x):
        from turbodiffusion_tpu.ops.quant import int8_linear_prequant
        return int8_linear_prequant(x[0], x[1], p, act=act)
    return linear_maybe_quant(p, x, act=act)


def _self_attention(p, x, rope_cs, cfg: WanConfig, gate=None,
                    residual=None):
    """WanSelfAttention (wan2pt1.py:215-277): QKV + RMSNorm-QK + RoPE + attn.

    The RMSNorm (full-dim) + rotate-half RoPE on Q/K run as one fused Pallas
    pass (ops/fused_norm.rmsnorm_rope) — the unfused chain costs 4 extra HBM
    round-trips per layer at 480p geometry. On single-chip TPU the whole
    SageSLA front-end (norm+rope+fold+pool+quant) is fused further
    (sla_attention_fused)."""
    xa = x[0] if _prequantized(x) else x
    B, Lx = xa.shape[0], xa.shape[1]
    H, Dh = cfg.num_heads, cfg.head_dim
    D = H * Dh
    cosF, sinF = rope_cs
    fused_sla = _use_fused_sla(p, cfg)

    if "qkv" in p:
        # fused-QKV GEMM (one activation quantization, one MXU launch);
        # the fused SLA path reads the three column groups via BlockSpec
        # offsets — no split copies
        qkv = _lin_q(p["qkv"], x)
        if not fused_sla:
            q_proj, k_proj, v_proj = jnp.split(qkv, 3, axis=-1)
    else:
        q_proj = _lin_q(p["q"], x)
        k_proj = _lin_q(p["k"], x)
        v_proj = _lin_q(p["v"], x)

    if fused_sla:
        from turbodiffusion_tpu.ops.attention import sla_attention_fused
        from turbodiffusion_tpu.ops.sla_fused import (
            unfold_planes, unfold_quant)
        from turbodiffusion_tpu.parallel.sharding import get_mesh
        from turbodiffusion_tpu.parallel.ulysses import (
            context_parallel_size, ulysses_sla_fused)
        if context_parallel_size(get_mesh()) > 1:
            # Ulysses CP: per-shard fused norm/rope, a2a, then the same
            # fused pool/quant/sparse pipeline on full-sequence head shards
            y = ulysses_sla_fused(
                qkv if "qkv" in p else q_proj,
                None if "qkv" in p else k_proj,
                None if "qkv" in p else v_proj,
                p["norm_q"]["scale"], p["norm_k"]["scale"], rope_cs,
                p.get("proj_l"), cfg.attention, num_heads=H, eps=cfg.eps,
                qkv_fused="qkv" in p)
            y = constrain(y, ("data", "context", None))
            return linear_maybe_quant(p["o"], y, gate=gate,
                                      residual=residual)
        if "qkv" in p:
            o_planes = sla_attention_fused(
                qkv, None, None, p["norm_q"]["scale"],
                p["norm_k"]["scale"], rope_cs, p.get("proj_l"),
                cfg.attention, num_heads=H, eps=cfg.eps, qkv_fused=True)
        else:
            o_planes = sla_attention_fused(
                q_proj, k_proj, v_proj, p["norm_q"]["scale"],
                p["norm_k"]["scale"], rope_cs, p.get("proj_l"),
                cfg.attention, num_heads=H, eps=cfg.eps)
        if "w_int8" in p["o"] and p["o"]["scale"].ndim == 1:
            from turbodiffusion_tpu.ops.quant import int8_linear_prequant
            xq, rs = unfold_quant(o_planes, Lx)
            if gate is not None and B == 1:
                return int8_linear_prequant(xq, rs, p["o"],
                                            gate=gate.reshape(-1),
                                            residual=residual)
            y = int8_linear_prequant(xq, rs, p["o"])
            if gate is not None:
                y = residual + y * gate.astype(y.dtype)
            return y
        return linear_maybe_quant(p["o"], unfold_planes(o_planes, Lx),
                                  gate=gate, residual=residual)

    q = rmsnorm_rope(q_proj, p["norm_q"]["scale"], cosF, sinF,
                     num_heads=H, eps=cfg.eps,
                     force_ref=cfg.attention.jvp_mode)
    k = rmsnorm_rope(k_proj, p["norm_k"]["scale"], cosF, sinF,
                     num_heads=H, eps=cfg.eps,
                     force_ref=cfg.attention.jvp_mode)
    v = v_proj.reshape(B, Lx, H, Dh)
    # Ulysses CP: explicit shard_map + all_to_all when a context axis is
    # active (≡ rcm/utils/a2a_cp.py:43-200); plain dispatch otherwise.
    from turbodiffusion_tpu.parallel.ulysses import ulysses_attention
    q = constrain(q, ("data", "context", None, None))
    k = constrain(k, ("data", "context", None, None))
    v = constrain(v, ("data", "context", None, None))
    o = ulysses_attention(q, k, v, cfg.attention, proj_l=p.get("proj_l"))
    o = constrain(o, ("data", "context", None, None))
    return linear_maybe_quant(p["o"], o.reshape(B, Lx, D), gate=gate,
                              residual=residual)


def _cross_attention(p, x, context, cfg: WanConfig, img_context=None,
                     residual=None):
    """WanT2VCrossAttention / WanI2VCrossAttention (wan2pt1.py:280-355).

    Text K/V (512 tokens) are replicated, so no head resharding is needed —
    matching the reference's flattened-CP observation (SURVEY §5.7).
    x may be a prequantized (int8, row_scale) pair from the quant-out norm3;
    residual fuses the `x + cross_attn(...)` add into the O-GEMM epilogue."""
    xa = x[0] if _prequantized(x) else x
    B, Lx, D = xa.shape
    H, Dh = cfg.num_heads, cfg.head_dim
    q_proj = _lin_q(p["q"], x)
    # K/V over 512 text tokens are tiny; the jnp chain is fine.
    k = L.rms_norm(linear_maybe_quant(p["k"], context), p["norm_k"]["scale"], eps=cfg.eps)
    v = linear_maybe_quant(p["v"], context)
    k = k.reshape(B, -1, H, Dh)
    v = v.reshape(B, -1, H, Dh)
    import os as _os

    import jax as _jax
    if ("w_int8" in p["o"] and p["o"]["scale"].ndim == 1
            and img_context is None
            and not cfg.attention.jvp_mode
            and not cfg.attention.use_reference_impl
            and _jax.default_backend() == "tpu" and Dh % 128 == 0
            # narrow models run every head in one program; wider ones
            # (14B: H*Dh=5120) take the head-grouped grid variant inside
            # cross_attention_qout (flash_pallas._cross_attention_qout_wide)
            and _os.environ.get("TDX_CROSS_QOUT", "1") == "1"):
        # fused norm + attention + per-token int8 O-feed: the standalone
        # q-norm pass, the q planes transpose, the unfold transpose and the
        # standalone quantize_rows pass all disappear (the q norm+transpose
        # alone were ~400 MB of HBM traffic per layer-call, r5 profile)
        from turbodiffusion_tpu.ops.flash_pallas import cross_attention_qout
        from turbodiffusion_tpu.ops.quant import int8_linear_prequant
        xq8, rs = cross_attention_qout(q_proj, k, v,
                                       norm_w=p["norm_q"]["scale"],
                                       eps=cfg.eps)
        return int8_linear_prequant(xq8, rs, p["o"], residual=residual)
    q = rmsnorm_rope(q_proj, p["norm_q"]["scale"],
                     num_heads=H, eps=cfg.eps,
                     force_ref=cfg.attention.jvp_mode)
    o = dense_attention(q, k, v,
                        use_reference_impl=cfg.attention.use_reference_impl,
                        jvp_mode=cfg.attention.jvp_mode)
    if img_context is not None:
        k_img = L.rms_norm(linear_maybe_quant(p["k_img"], img_context),
                           p["norm_k_img"]["scale"], eps=cfg.eps)
        v_img = linear_maybe_quant(p["v_img"], img_context)
        k_img = k_img.reshape(B, -1, H, Dh)
        v_img = v_img.reshape(B, -1, H, Dh)
        o = o + dense_attention(q, k_img, v_img,
                                jvp_mode=cfg.attention.jvp_mode)
    return linear_maybe_quant(p["o"], o.reshape(B, Lx, D),
                              residual=residual)


def _ffn(p, x, gate=None, residual=None):
    """Linear -> GELU(tanh) -> Linear (wan2pt1.py:364); the gelu rides the
    fc1 GEMM epilogue on the quantized path; fc1 accepts a prequantized
    (int8, scale) pair from the quant-out fused LN; the AdaLN-gated
    residual rides the fc2 epilogue.

    Fully-quantized fast path: fc1's epilogue emits INT8 + per-(row, N-tile)
    scales and fc2 rescales per K-block — the FFN hidden never exists in
    bf16 and the standalone activation-quant pass (a ~0.9 GB HBM round trip
    at 480p) disappears.

    Wide models chunk the sequence through the FFN: the (L, ffn_dim) hidden
    is ~900 MB bf16 at 14B/480p — the margin that decides whether the int8
    14B fits ONE 16 GB chip."""
    fc1, fc2 = p["fc1"], p["fc2"]
    xa = x[0] if _prequantized(x) else x
    B, L = xa.shape[0], xa.shape[1]
    n_ffn = fc1["w_int8"].shape[1] if "w_int8" in fc1 else fc1["w"].shape[1]

    if (_prequantized(x) and "w_int8" in fc1 and "w_int8" in fc2
            and fc1["scale"].ndim == 1 and fc2["scale"].ndim == 1
            and B == 1 and L * n_ffn < 700_000_000):
        from turbodiffusion_tpu.ops.quant import (
            _pick_bn_div, int8_gemm_blockact_pallas,
            int8_gemm_postscale_qout_pallas)
        BN = _pick_bn_div(n_ffn)
        if BN:
            xq, rs = x
            K = xq.shape[-1]
            hq, hs = int8_gemm_postscale_qout_pallas(
                xq.reshape(-1, K), rs.reshape(-1, 1),
                fc1["w_int8"], fc1["scale"], bias=fc1.get("b"),
                act="gelu_tanh", has_bias=fc1.get("b") is not None)
            y = int8_gemm_blockact_pallas(
                hq, hs, fc2["w_int8"], fc2["scale"], bias=fc2.get("b"),
                has_bias=fc2.get("b") is not None, bk=BN,
                gate=None if gate is None else gate.reshape(-1),
                residual=None if residual is None
                else residual.reshape(-1, residual.shape[-1]))
            return y.reshape(B, L, -1)

    if L % 2 == 0 and L * n_ffn * 2 > 600_000_000:
        half = L // 2

        def body(i):
            sl = lambda t: jax.lax.dynamic_slice_in_dim(t, i * half, half, 1)
            xi = (sl(x[0]), sl(x[1])) if _prequantized(x) else sl(x)
            ri = None if residual is None else sl(residual)
            return linear_maybe_quant(p["fc2"],
                                      _lin_q(fc1, xi, act="gelu_tanh"),
                                      gate=gate, residual=ri)

        o = jax.lax.map(body, jnp.arange(2))        # (2, B, L/2, D)
        return jnp.swapaxes(o, 0, 1).reshape(B, L, -1)
    return linear_maybe_quant(p["fc2"], _lin_q(fc1, x, act="gelu_tanh"),
                              gate=gate, residual=residual)


def wan_block(p, x, e0_B6D, rope_cs, context, cfg: WanConfig,
              img_context=None):
    """WanAttentionBlock (wan2pt1.py:358-417), exact precision flow:
    norm1 (fp32->x.dtype) -> re-upcast -> fp32 AdaLN modulate -> cast back.
    The LN + AdaLN islands run as single fused Pallas passes on TPU
    (ops/fused_norm.modulated_layer_norm)."""
    e = p["modulation"].astype(jnp.float32)[None] + e0_B6D  # (B, 6, D) fp32
    e0, e1, e2, e3, e4, e5 = [e[:, i:i + 1] for i in range(6)]  # each (B,1,D)

    # quant-out fused LN: when the consumer GEMMs are postscale-int8 (and
    # we're not under forward-mode AD), the LN emits int8 rows directly —
    # the standalone row-quant pass is a full HBM round trip each
    sa_l = p["self_attn"].get("qkv", p["self_attn"].get("q", {}))
    import jax as _jax
    qout = ("w_int8" in sa_l and sa_l["scale"].ndim == 1
            and not cfg.attention.jvp_mode
            and not cfg.attention.use_reference_impl
            and _jax.default_backend() == "tpu")

    x = _self_attention(p["self_attn"],
                        modulated_layer_norm(
                            x, e1, e0, eps=cfg.eps, quant_out=qout,
                            force_ref=cfg.attention.jvp_mode),
                        rope_cs, cfg, gate=e2, residual=x)
    # remat="attn_only" saves exactly these two residual streams: the
    # gather-bound attention is the expensive recompute, the int8 GEMMs are
    # cheap to replay (SAC policy between mm_only's 21.4 GB and full)
    x = checkpoint_name(x, "attn_out")

    ca_q = p["cross_attn"]["q"]
    qout_ca = (qout and "w_int8" in ca_q and ca_q["scale"].ndim == 1
               and cfg.cross_attn_norm)
    if cfg.cross_attn_norm:
        n3 = modulated_layer_norm(x, weight=p["norm3"]["scale"],
                                  bias=p["norm3"]["bias"], eps=cfg.eps,
                                  quant_out=qout_ca,
                                  force_ref=cfg.attention.jvp_mode)
    else:
        n3 = x
    x = _cross_attention(p["cross_attn"], n3, context, cfg,
                         img_context=img_context, residual=x)
    x = checkpoint_name(x, "cross_out")

    fc1 = p["ffn"]["fc1"]
    qout_ffn = (qout and "w_int8" in fc1 and fc1["scale"].ndim == 1)
    x = _ffn(p["ffn"], modulated_layer_norm(
        x, e4, e3, eps=cfg.eps, quant_out=qout_ffn,
        force_ref=cfg.attention.jvp_mode), gate=e5, residual=x)
    return x


def wan_head(p, x, e_B_D, cfg: WanConfig):
    """Head (wan2pt1.py:420-454): 2-way modulated output projection, fp32."""
    e = p["modulation"].astype(jnp.float32)[None] + e_B_D[:, None]  # (B,2,D)
    e0, e1 = e[:, 0:1], e[:, 1:2]
    n = L.layer_norm(x, eps=cfg.eps).astype(jnp.float32)
    h = n * (1 + e1) + e0
    return jnp.matmul(h, p["head"]["w"].astype(jnp.float32)) + \
        p["head"]["b"].astype(jnp.float32)


def _img_emb(p, image_embeds):
    """MLPProj for CLIP image features (wan2pt1.py:457-486).

    flf2v: first/last-frame CLIP features arrive as consecutive batch pairs
    (…, 257, 1280); they are merged to (…, 514, 1280) and offset by the
    zero-init learned position embedding before the MLP
    (wan2pt1.py:468-485, FIRST_LAST_FRAME_CONTEXT_TOKEN_NUMBER=514)."""
    if "emb_pos" in p:
        b, n, d = image_embeds.shape
        pos = p["emb_pos"]
        if n != pos.shape[1]:           # pairs stacked on batch: merge
            image_embeds = image_embeds.reshape(-1, 2 * n, d)
        image_embeds = image_embeds + pos.astype(image_embeds.dtype)
    x = L.layer_norm(image_embeds, eps=1e-5, scale=p["norm1"]["scale"],
                     bias=p["norm1"]["bias"])
    x = L.linear(p["fc1"], x)
    x = jax.nn.gelu(x, approximate=False)
    x = L.linear(p["fc2"], x)
    return L.layer_norm(x, eps=1e-5, scale=p["norm2"]["scale"],
                        bias=p["norm2"]["bias"])


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def patchify(x_BCTHW, patch_size):
    """(B,C,T,H,W) -> (B, T*H/kh*W/kw, C*kt*kh*kw) (wan2pt1.py:654-660)."""
    kt, kh, kw = patch_size
    return rearrange(x_BCTHW, "b c (t kt) (h kh) (w kw) -> b (t h w) (c kt kh kw)",
                     kt=kt, kh=kh, kw=kw)


def unpatchify(x_BLD, T, H, W, patch_size, out_dim):
    kt, kh, kw = patch_size
    return rearrange(x_BLD, "b (t h w) (kt kh kw d) -> b d (t kt) (h kh) (w kw)",
                     t=T, h=H, w=W, kt=kt, kh=kh, kw=kw, d=out_dim)


def wan_forward(params, cfg: WanConfig, x_B_C_T_H_W, timesteps_B_T,
                crossattn_emb, y_B_C_T_H_W=None,
                frame_cond_crossattn_emb=None):
    """WanModel.forward (wan2pt1.py:598-721). Returns fp32 (B, out_dim, T, H, W).

    x: noisy latent (B, C, T, H, W); timesteps (B, 1) in [0, 1000];
    crossattn_emb: umT5 text embedding (B, 512, text_dim);
    y: i2v conditioning channels, concatenated on C (wan2pt2 path);
    frame_cond_crossattn_emb: CLIP features for wan2.1 i2v.
    """
    t_B = timesteps_B_T[:, 0]
    if y_B_C_T_H_W is not None:
        x_B_C_T_H_W = jnp.concatenate([x_B_C_T_H_W, y_B_C_T_H_W], axis=1)

    kt, kh, kw = cfg.patch_size
    B, _, T_in, H_in, W_in = x_B_C_T_H_W.shape
    T, H, W = T_in // kt, H_in // kh, W_in // kw

    x = patchify(x_B_C_T_H_W.astype(cfg.dtype), cfg.patch_size)
    x = L.linear(params["patch_embedding"], x)
    x = constrain(x, ("data", "context", None))

    # fp32 time embedding + projection (wan2pt1.py:671-674); explicitly
    # replicated — tiny, and without the pin SPMD invents shardings for it
    # that force replicate-then-repartition churn inside every block
    e_B_D = L.mlp_time_embedding(params["time_embedding"], t_B, cfg.freq_dim)
    e0_B6D = constrain(
        L.time_projection(params["time_projection"], e_B_D, cfg.dim),
        ("data", None, None))

    # text context MLP (wan2pt1.py:678)
    te = params["text_embedding"]
    context = L.linear(te["fc2"], L.gelu_tanh(
        L.linear(te["fc1"], crossattn_emb.astype(cfg.dtype))))

    img_context = None
    if frame_cond_crossattn_emb is not None:
        img_context = _img_emb(params["img_emb"],
                               frame_cond_crossattn_emb.astype(cfg.dtype)
                               ).astype(cfg.dtype)

    freqs = rope_freqs_3d(T, H, W, cfg.head_dim)  # (L, Dh/2) fp32
    rope_cs = rope_cos_sin_full(freqs)            # ((L, Dh), (L, Dh)) fp32

    def block_fn(carry, blk_params):
        out = wan_block(blk_params, carry, e0_B6D, rope_cs, context, cfg,
                        img_context=img_context)
        return out, None

    if cfg.remat != "none":
        # mm_only ≡ SAC mm_only (saves every dot; 21.4 GB at 81f/1.3B);
        # attn_only saves just the two named attention residual streams per
        # block (~6 GB) and replays the int8 GEMMs; full/block_wise saves
        # only the scan carry (selective_activation_checkpoint.py:26-59)
        if cfg.remat == "mm_only":
            policy = jax.checkpoint_policies.checkpoint_dots
        elif cfg.remat == "attn_only":
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_out", "cross_out")
        elif cfg.remat == "self_attn_only":
            # saves only the sparse self-attention residual stream — the
            # one expensive recompute; cross-attention (512 text tokens) and
            # the int8 GEMMs replay cheaply. One (nblocks, B, L, D) stack
            # less than attn_only: the margin that fits the 81f sCM step on
            # a single 16 GB chip (attn_only needs 16.4 GB there).
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_out")
        else:
            policy = jax.checkpoint_policies.nothing_saveable
        block_fn = jax.checkpoint(block_fn, policy=policy)

    x, _ = jax.lax.scan(block_fn, x, params["blocks"])

    out = wan_head(params["head"], x, e_B_D, cfg)
    # gather the sequence BEFORE unpatchify (≡ cat_outputs_cp at the head
    # output, wan2pt1.py:703-707): reshaping a context-sharded token dim
    # into (t kt)(h kh)(w kw) forces SPMD into involuntary full
    # rematerialization (replicate-then-repartition) — one explicit
    # all-gather here is the cheap, intended collective
    out = constrain(out, ("data", None, None))
    return unpatchify(out, T, H, W, cfg.patch_size, cfg.out_dim)


# ---------------------------------------------------------------------------
# Parameter initialization (reference init_weights, wan2pt1.py:723-760)
# ---------------------------------------------------------------------------

def _linear_init(key, fan_in, fan_out, dtype, std=None, zero=False, bias=True):
    kw, kb = jax.random.split(key)
    if zero:
        w = jnp.zeros((fan_in, fan_out), dtype)
    elif std is not None:
        w = (jax.random.truncated_normal(kw, -2, 2, (fan_in, fan_out)) * std
             ).astype(dtype)
    else:  # xavier uniform
        limit = math.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32,
                               -limit, limit).astype(dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((fan_out,), dtype)
    return p


def init_wan_params(key, cfg: WanConfig):
    """Random init matching the reference's schemes (trunc-normal attention
    weights std=1/sqrt(dim), zero head, wan2pt1.py:240-250,741-760)."""
    dtype = cfg.dtype
    D, F = cfg.dim, cfg.ffn_dim
    Dh = cfg.head_dim
    std = 1.0 / math.sqrt(D)
    keys = iter(jax.random.split(key, 16))

    use_sla = cfg.attention.backend in ("sla", "sagesla")
    has_img = cfg.arch == "wan2.1" and cfg.model_type in ("i2v", "flf2v")

    def attn_params(kit, has_img=False, with_proj_l=False):
        p = {
            "q": _linear_init(next(kit), D, D, dtype, std=std),
            "k": _linear_init(next(kit), D, D, dtype, std=std),
            "v": _linear_init(next(kit), D, D, dtype, std=std),
            "o": _linear_init(next(kit), D, D, dtype, std=std),
            "norm_q": {"scale": jnp.ones((D,), dtype)},
            "norm_k": {"scale": jnp.ones((D,), dtype)},
        }
        if has_img:
            p["k_img"] = _linear_init(next(kit), D, D, dtype, std=std)
            p["v_img"] = _linear_init(next(kit), D, D, dtype, std=std)
            p["norm_k_img"] = {"scale": jnp.ones((D,), dtype)}
        if with_proj_l:
            # zero-init learned linear-branch projection (SLA/core.py:78-81)
            p["proj_l"] = {"w": jnp.zeros((Dh, Dh), jnp.float32),
                           "b": jnp.zeros((Dh,), jnp.float32)}
        return p

    def one_block(key):
        kit = iter(jax.random.split(key, 16))
        blk = {
            "self_attn": attn_params(kit, with_proj_l=use_sla),
            "cross_attn": attn_params(kit, has_img=has_img),
            "ffn": {"fc1": _linear_init(next(kit), D, F, dtype),
                    "fc2": _linear_init(next(kit), F, D, dtype)},
            "modulation": (jax.random.truncated_normal(
                next(kit), -2, 2, (6, D)) * std).astype(dtype),
        }
        if cfg.cross_attn_norm:
            blk["norm3"] = {"scale": jnp.ones((D,), dtype),
                            "bias": jnp.zeros((D,), dtype)}
        return blk

    block_keys = jax.random.split(jax.random.fold_in(key, 1), cfg.num_layers)
    blocks = jax.vmap(one_block)(block_keys)  # stacked (num_layers, ...)

    Din = cfg.in_dim * cfg.patch_size[0] * cfg.patch_size[1] * cfg.patch_size[2]
    params = {
        "patch_embedding": _linear_init(next(keys), Din, D, dtype),
        "text_embedding": {
            "fc1": _linear_init(next(keys), cfg.text_dim, D, dtype, std=0.02),
            "fc2": _linear_init(next(keys), D, D, dtype, std=0.02),
        },
        "time_embedding": {
            "fc1": _linear_init(next(keys), cfg.freq_dim, D, jnp.float32, std=0.02),
            "fc2": _linear_init(next(keys), D, D, jnp.float32, std=0.02),
        },
        "time_projection": {
            "fc": _linear_init(next(keys), D, 6 * D, jnp.float32, std=0.02),
        },
        "blocks": blocks,
        "head": {
            "head": _linear_init(
                next(keys), D,
                cfg.out_dim * cfg.patch_size[0] * cfg.patch_size[1] * cfg.patch_size[2],
                jnp.float32, zero=True),
            "modulation": (jax.random.truncated_normal(
                next(keys), -2, 2, (2, D)) * std).astype(jnp.float32),
        },
    }
    if has_img:
        params["img_emb"] = {
            "norm1": {"scale": jnp.ones((1280,), dtype), "bias": jnp.zeros((1280,), dtype)},
            "fc1": _linear_init(next(keys), 1280, 1280, dtype),
            "fc2": _linear_init(next(keys), 1280, D, dtype),
            "norm2": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        }
        if cfg.model_type == "flf2v":
            # zero-init first/last-frame position embedding
            # (wan2pt1.py:469,478: 2*257 CLIP tokens)
            params["img_emb"]["emb_pos"] = jnp.zeros((1, 514, 1280), dtype)
    return params
