"""Attention backends for TurboDiffusion-TPU.

Public API (all layouts are (B, L, H, D), matching the reference convention
through MinimalA2AAttnOp → local_attn, rcm/utils/a2a_cp.py:189-200):

  * dense_attention(q, k, v)            — softmax attention
  * sla_attention(q, k, v, params, cfg) — Sparse-Linear Attention: block-sparse
    top-k softmax branch + linear-attention compensation branch with a learned
    zero-init per-head-dim projection (SLA/core.py:38-119)
  * get_block_map(q, k, ...)            — smooth-k mean-pooled block scoring +
    top-k LUT (SLA/utils.py:55-67)

Each backend has a pure-jnp reference implementation (used on CPU and in
equivalence tests) and a Pallas TPU kernel fast path (ops/flash_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from turbodiffusion_tpu.config import AttentionConfig


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Dense reference attention
# ---------------------------------------------------------------------------

def dense_attention_ref(q, k, v, scale: Optional[float] = None):
    """Plain softmax attention, fp32 accumulation. (B, L, H, D) layout."""
    D = q.shape[-1]
    scale = D ** -0.5 if scale is None else scale
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# SLA block map (SLA/utils.py:55-67)
# ---------------------------------------------------------------------------

def _mean_pool_blocks(x, blk: int):
    """Mean over length blocks with masked tail (SLA/utils.py:21-52).

    x: (B, H, L, D) -> (B, H, ceil(L/blk), D); the last block averages only
    its valid rows.
    """
    B, H, L, D = x.shape
    n_blocks = -(-L // blk)
    pad = n_blocks * blk - L
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    xp = xp.reshape(B, H, n_blocks, blk, D)
    sums = jnp.sum(xp.astype(jnp.float32), axis=3)
    counts = jnp.minimum(blk, L - jnp.arange(n_blocks) * blk).astype(jnp.float32)
    return (sums / counts[None, None, :, None]).astype(x.dtype)


def get_block_map(q, k, topk_ratio: float, block_q: int, block_k: int):
    """Top-k K-block selection per Q-block (SLA/utils.py:55-67).

    q, k: (B, L, H, D). Returns (sparse_map, lut, topk):
      sparse_map: (B, H, nQ, nK) int8 0/1 selection map
      lut:        (B, H, nQ, topk) int32 selected K-block ids
      topk:       python int = min(nK, int(topk_ratio * nK))  (floor, as in ref)
    """
    qh = jnp.swapaxes(q, 1, 2)  # (B, H, L, D)
    kh = jnp.swapaxes(k, 1, 2)
    # smooth-k: subtract per-head key mean (SageAttention technique)
    kh = kh - jnp.mean(kh, axis=-2, keepdims=True)
    pq = _mean_pool_blocks(qh, block_q)       # (B, H, nQ, D)
    pk = _mean_pool_blocks(kh, block_k)       # (B, H, nK, D)
    score = jnp.einsum("bhqd,bhkd->bhqk", pq, pk, preferred_element_type=jnp.float32)

    nK = score.shape[-1]
    topk = min(nK, int(topk_ratio * nK))
    topk = max(topk, 1)
    _, lut = jax.lax.top_k(score, topk)       # (B, H, nQ, topk)

    one_hot = jax.nn.one_hot(lut, nK, dtype=jnp.int8)
    sparse_map = jnp.max(one_hot, axis=-2)
    return sparse_map, lut.astype(jnp.int32), topk


# ---------------------------------------------------------------------------
# Block-sparse softmax attention — jnp reference (SLA/kernel.py:22-82 semantics)
# ---------------------------------------------------------------------------

def sparse_attention_ref(q, k, v, lut, block_q: int, block_k: int,
                         scale: Optional[float] = None):
    """Reference block-sparse attention: each Q-block attends only to the
    K-blocks listed in its LUT row. Masked dense implementation for testing.

    q, k, v: (B, L, H, D); lut: (B, H, nQ, topk).
    """
    B, L, H, D = q.shape
    Lk = k.shape[1]
    scale = D ** -0.5 if scale is None else scale
    nK = -(-Lk // block_k)

    # allowed[b,h,i,kb] = 1 if K-block kb selected for Q-block i
    allowed = jnp.max(jax.nn.one_hot(lut, nK, dtype=jnp.bool_), axis=-2)  # (B,H,nQ,nK)
    # expand to token resolution
    qb = jnp.arange(L) // block_q           # (L,)
    kb = jnp.arange(Lk) // block_k          # (Lk,)
    mask = allowed[:, :, qb][:, :, :, kb]   # (B, H, L, Lk)

    logits = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32) * scale
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Linear-attention compensation branch (SLA/core.py:94-114)
# ---------------------------------------------------------------------------

def _feature_map(x, kind: str):
    if kind == "softmax":
        return jax.nn.softmax(x, axis=-1)
    if kind == "elu":
        return jax.nn.elu(x) + 1.0
    if kind == "relu":
        return jax.nn.relu(x)
    raise NotImplementedError(f"feature map {kind}")


def linear_attention(q, k, v, feature_map: str = "softmax"):
    """o_l = (phi(q) @ (phi(k)^T v)) / (1e-5 + phi(q)·sum(phi(k)))
    (SLA/core.py:106-110). Layout (B, L, H, D)."""
    fq = _feature_map(q, feature_map)
    fk = _feature_map(k, feature_map)
    kv = jnp.einsum("bmhd,bmhe->bhde", fk, v, preferred_element_type=jnp.float32)
    ksum = jnp.sum(fk.astype(jnp.float32), axis=1)                     # (B, H, D)
    num = jnp.einsum("blhd,bhde->blhe", fq.astype(jnp.float32), kv)
    den = 1e-5 + jnp.einsum("blhd,bhd->blh", fq.astype(jnp.float32), ksum)
    return (num / den[..., None]).astype(q.dtype)


# ---------------------------------------------------------------------------
# Top-level dispatch
# ---------------------------------------------------------------------------

def _use_pallas(q, *block_sizes) -> bool:
    """Use the Pallas kernels only on TPU with MXU-compatible geometry;
    tiny test models fall back to the jnp reference path. 64-row blocks are
    supported for parity with reference-trained SLA maps
    (SLA/kernel.py:247-248: BLOCK_N=64)."""
    if jax.default_backend() != "tpu":
        return False
    D = q.shape[-1]
    if D % 64 != 0:
        return False
    return all(b >= 64 for b in block_sizes) if block_sizes else True


def dense_attention(q, k, v, scale: Optional[float] = None,
                    use_reference_impl: bool = False,
                    jvp_mode: bool = False):
    """Dense softmax attention; Pallas flash kernel on TPU, jnp elsewhere.

    jvp_mode routes through the forward-mode-differentiable wrapper whose
    tangent rule is the fused one-pass JVP kernel (sCM distillation;
    reference contract rcm/utils/flash_attention_jvp_triton.py:16-45)."""
    if jvp_mode and not use_reference_impl:
        from turbodiffusion_tpu.ops.flash_jvp_pallas import flash_attention_jvp
        return flash_attention_jvp(q, k, v, scale=scale)
    if not use_reference_impl and _use_pallas(q):
        from turbodiffusion_tpu.ops.flash_pallas import flash_attention
        return flash_attention(q, k, v, scale=scale)
    return dense_attention_ref(q, k, v, scale=scale)


def sla_attention(q, k, v, proj_l, cfg: AttentionConfig,
                  int8_qk: bool = False):
    """Sparse-Linear Attention (SLA/core.py:38-119; Sage variant :122-258).

    proj_l: {'w': (D, D), 'b': (D,)} zero-init learned projection applied to
    the linear branch output (per head-dim, shared across heads).
    int8_qk: SageSLA mode — quantize Q/K per block to INT8 inside the sparse
    kernel (SageAttention-style), matching the reference's SpargeAttn path.

    Wide models (14B: 40 heads) run the whole per-head pipeline (block map,
    sparse kernel, linear branch) through lax.map in 8-head groups: the
    folded per-head planes and their lane-padded (M, 1) scale tensors are
    transient HBM that would otherwise exceed a single chip's budget.
    """
    H = q.shape[2]
    if (H > 16 and not cfg.use_reference_impl and not cfg.jvp_mode
            and _use_pallas(q, cfg.block_q, cfg.block_k)):
        G = 8 if H <= 32 else 4
        while H % G:
            G -= 1

        def body(g, out):
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, g * G, G, 2)
            og = _sla_attention_impl(sl(q), sl(k), sl(v), proj_l, cfg,
                                     int8_qk)
            # in-place head-slab update (no stacked (n, …, G, D) buffer +
            # final transpose copy — that pair alone is ~640 MB at 14B)
            return jax.lax.dynamic_update_slice_in_dim(out, og, g * G, 2)

        return jax.lax.fori_loop(0, H // G, body,
                                 jnp.zeros(q.shape, q.dtype))
    return _sla_attention_impl(q, k, v, proj_l, cfg, int8_qk)


def _sla_attention_impl(q, k, v, proj_l, cfg: AttentionConfig,
                        int8_qk: bool = False):
    _, lut, topk = get_block_map(q, k, cfg.sla_topk, cfg.block_q, cfg.block_k)

    def _sparse_pallas(q, k, v, lut):
        from turbodiffusion_tpu.ops.flash_pallas import flash_attention
        return flash_attention(q, k, v, lut=lut, block_q=cfg.block_q,
                               block_k=cfg.block_k, int8_qk=int8_qk,
                               v_quant=cfg.v_quant)

    if cfg.jvp_mode and not cfg.use_reference_impl:
        # Forward-mode pass (sCM tangents): sparse custom_jvp wrapper (the
        # tangent gathers only LUT-selected blocks) + the jnp linear branch
        # (pure jnp — forward-differentiable as-is). Quantization is off in
        # the tangent pass, matching the reference JVP kernel.
        from turbodiffusion_tpu.ops.flash_jvp_pallas import (
            sparse_attention_jvp)
        o_s = sparse_attention_jvp(q, k, v, lut, cfg.block_q, cfg.block_k)
        if not cfg.linear_branch:
            return o_s
        o_l = linear_attention(q, k, v, cfg.feature_map)
        w = proj_l["w"].astype(q.dtype)
        b = proj_l["b"].astype(q.dtype)
        return (o_s + jnp.matmul(o_l.astype(q.dtype), w) + b).astype(q.dtype)
    if not cfg.use_reference_impl and _use_pallas(q, cfg.block_q, cfg.block_k):
        o_s = _sparse_pallas(q, k, v, lut)
    else:
        o_s = sparse_attention_ref(q, k, v, lut, cfg.block_q, cfg.block_k)

    if not cfg.linear_branch:
        # sparse-only fast path: a zero proj_l contributes exactly zero
        # (acceleration.py:249-380)
        return o_s

    if (_use_pallas(q, cfg.block_q, cfg.block_k)
            and cfg.feature_map == "softmax"):
        from turbodiffusion_tpu.ops.linear_attention_pallas import (
            linear_attention_projected)
        o_l = linear_attention_projected(q, k, v, proj_l["w"], proj_l["b"])
        return (o_s + o_l).astype(q.dtype)

    o_l = linear_attention(q, k, v, cfg.feature_map)
    # proj_l runs in the compute dtype (reference autocasts to bf16,
    # SLA/core.py:112-113); weights stored fp32, zero-init.
    w = proj_l["w"].astype(q.dtype)
    b = proj_l["b"].astype(q.dtype)
    o_l = jnp.matmul(o_l.astype(q.dtype), w) + b
    return (o_s + o_l).astype(q.dtype)


def sla_attention_fused(q_proj, k_proj, v_proj, norm_q_w, norm_k_w, rope_cs,
                        proj_l, cfg: AttentionConfig, *, num_heads: int,
                        eps: float = 1e-6, qkv_fused: bool = False,
                        interpret: bool = False):
    """Fully-fused SageSLA from raw QKV projection outputs (B, L, H*Dh).

    Collapses RMSNorm-QK, RoPE, the fold transpose, block-map pooling,
    smooth-k, and all int8 quantization into head-plane Pallas passes
    (ops/sla_fused.py). Returns (B, H, Lp, Dh) bf16 planes — feed
    `unfold_quant`/`unfold_planes` into the O projection.

    Differentiable: the forward runs the fused inference kernels; the
    backward (custom_vjp) recomputes through the composable training path
    (rmsnorm_rope + sla_attention, both of which carry their own fused
    Pallas VJPs) — remat-style, so training forwards keep inference speed.

    qkv_fused: q_proj is a single (B, L, 3*H*Dh) fused-QKV GEMM output
    (k_proj/v_proj ignored); the Q/K/V splits ride BlockSpec column offsets.
    """
    fn = _sla_fused_diff(cfg, num_heads, eps, qkv_fused, interpret)
    return fn(q_proj, k_proj, v_proj, norm_q_w, norm_k_w, rope_cs, proj_l)


@functools.lru_cache(maxsize=None)
def _sla_fused_diff(cfg: AttentionConfig, num_heads: int, eps: float,
                    qkv_fused: bool, interpret: bool):
    """custom_vjp wrapper: fused-kernel forward, composable-path backward."""
    from turbodiffusion_tpu.ops.fused_norm import rmsnorm_rope

    H = num_heads

    def composable(q_proj, k_proj, v_proj, nq, nk, rope_cs, proj_l, Lp):
        if qkv_fused:
            q_proj, k_proj, v_proj = jnp.split(q_proj, 3, axis=-1)
        cosF, sinF = rope_cs
        q = rmsnorm_rope(q_proj, nq, cosF, sinF, num_heads=H, eps=eps)
        k = rmsnorm_rope(k_proj, nk, cosF, sinF, num_heads=H, eps=eps)
        B, L, HD = q_proj.shape
        v = v_proj.reshape(B, L, H, HD // H)
        o = sla_attention(q, k, v, proj_l if cfg.linear_branch else None,
                          cfg, int8_qk=cfg.backend == "sagesla")
        planes = jnp.swapaxes(o, 1, 2)              # (B, H, L, Dh)
        return jnp.pad(planes, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))

    @jax.custom_vjp
    def f(q_proj, k_proj, v_proj, nq, nk, rope_cs, proj_l):
        return _sla_attention_fused_impl(
            q_proj, k_proj, v_proj, nq, nk, rope_cs, proj_l, cfg,
            num_heads=H, eps=eps, qkv_fused=qkv_fused, interpret=interpret)

    def fwd(q_proj, k_proj, v_proj, nq, nk, rope_cs, proj_l):
        out = f(q_proj, k_proj, v_proj, nq, nk, rope_cs, proj_l)
        return out, (q_proj, k_proj, v_proj, nq, nk, rope_cs, proj_l)

    def bwd(res, g):
        q_proj, k_proj, v_proj, nq, nk, rope_cs, proj_l = res
        Lp = g.shape[2]
        _, vjp = jax.vjp(
            lambda *a: composable(*a, Lp), q_proj, k_proj, v_proj, nq, nk,
            rope_cs, proj_l)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def _sla_attention_fused_impl(q_proj, k_proj, v_proj, norm_q_w, norm_k_w,
                              rope_cs, proj_l, cfg: AttentionConfig, *,
                              num_heads: int, eps: float = 1e-6,
                              qkv_fused: bool = False,
                              interpret: bool = False):
    from turbodiffusion_tpu.ops.flash_pallas import sparse_attention_i8_planes
    from turbodiffusion_tpu.ops.linear_attention_pallas import (
        linear_projected_planes)
    from turbodiffusion_tpu.ops.sla_fused import (
        block_map_from_pooled, head_planes, subquant_planes)

    B, L, Wx = q_proj.shape
    HD = Wx // 3 if qkv_fused else Wx
    H = num_heads
    Dh = HD // H
    pad_to = -(-L // 512) * 512
    assert pad_to % cfg.block_q == 0 and pad_to % cfg.block_k == 0
    cosF, sinF = rope_cs
    cosP = jnp.pad(cosF, ((0, pad_to - cosF.shape[0]), (0, 0)))
    sinP = jnp.pad(sinF, ((0, pad_to - sinF.shape[0]), (0, 0)))
    lin = cfg.linear_branch
    if qkv_fused:
        srcs = ((q_proj, 0), (q_proj, 1), (q_proj, 2))
    else:
        srcs = ((q_proj, 0), (k_proj, 0), (v_proj, 0))

    # wide models (14B: dim 5120) exceed the single head_planes VMEM tile:
    # precompute the full-dim RMS inverse (row_rms_inv) and tile the fused
    # pass over head groups, concatenating planes on the head axis
    wide = HD > 4096
    if wide:
        from turbodiffusion_tpu.ops.sla_fused import row_rms_inv
        G = H
        while G * Dh > 4096 or H % G:
            G -= 1
        n_grp = H // G

    def planes(part, src, weight, rope: bool, pool: int, quant: bool,
               bf16o: bool):
        kw = dict(num_heads=H, eps=eps, pool=pool, quant=quant,
                  bf16_out=bf16o, pad_to=pad_to, interpret=interpret)
        if rope:
            kw.update(cos_full=cosP, sin_full=sinP)
        if not wide:
            return head_planes(src, weight, width=HD, col_block=part, **kw)
        ri = None
        if weight is not None:
            ri = row_rms_inv(src, eps, width=HD, col_block=part,
                             interpret=interpret)
            ri = jnp.pad(ri, ((0, 0), (0, pad_to - ri.shape[1]), (0, 0)))
        kw["num_heads"] = G
        outs = []
        for g in range(n_grp):
            wslice = None if weight is None else \
                jax.lax.slice_in_dim(weight.reshape(-1), g * G * Dh,
                                     (g + 1) * G * Dh, axis=0)
            outs.append(head_planes(
                src, wslice, width=G * Dh, col_block=part * n_grp + g,
                rms_inv=ri, **kw))
        return {k: jnp.concatenate([o[k] for o in outs], axis=1)
                for k in outs[0]}

    # the single-pass VT kernel (and, with the linear branch on, the fused
    # linear-apply epilogue) is chosen whenever the whole topk panel fits
    # the resident-tile budget; sel is known before the planes run
    v_chan_early = cfg.v_quant == "channel"
    nK_map = _cdiv(L, cfg.block_k)
    sel_early = max(1, min(nK_map, int(cfg.sla_topk * nK_map)))
    import os as _os
    use_vt = (v_chan_early and sel_early * cfg.block_k <= 8192
              and _os.environ.get("TDX_SPARSE_VT", "1") != "0")
    # fuse the linear branch into the pack producer + sparse epilogue (its
    # standalone accumulate/apply passes re-walk ~400MB of planes per layer
    # and the o + o_l add another 300MB); TDX_LIN_FUSED=0 reverts
    fuse_lin = (lin and use_vt and proj_l is not None
                and _os.environ.get("TDX_LIN_FUSED", "1") != "0")

    # head_planes' heavy Q pass runs 256-row tiles, so in-kernel pooling is
    # capped at 256; wider Q gather blocks (block_q=512 halves the sparse
    # kernel's gather bytes — it is HBM-bound at long L) merge adjacent
    # pooled rows count-weighted afterwards, which is exactly the wider
    # block mean.
    q_pool = min(cfg.block_q, 256)
    # with the fused linear epilogue, phi(q) is recovered in-kernel from the
    # int8 q — the bf16 Q plane has no consumer left
    Q = planes(srcs[0][1], srcs[0][0], norm_q_w, True, q_pool, True,
               lin and not fuse_lin)
    K = planes(srcs[1][1], srcs[1][0], norm_k_w, True, cfg.block_k, False,
               True)
    v_chan = cfg.v_quant == "channel"
    V = planes(srcs[2][1], srcs[2][0], None, False, 0, not v_chan,
               lin or v_chan)

    pooled_q = Q["pooled"]
    if cfg.block_q > q_pool:
        f = cfg.block_q // q_pool
        nP = pooled_q.shape[2]
        nPp = _cdiv(nP, f) * f
        cnt = jnp.clip(L - jnp.arange(nPp) * q_pool, 0, q_pool
                       ).astype(jnp.float32)
        pq = jnp.pad(pooled_q, ((0, 0), (0, 0), (0, nPp - nP), (0, 0)))
        pq = pq * cnt[None, None, :, None]
        pq = pq.reshape(*pq.shape[:2], nPp // f, f, pq.shape[-1]).sum(3)
        csum = jnp.maximum(cnt.reshape(nPp // f, f).sum(1), 1.0)
        pooled_q = pq / csum[None, None, :, None]

    lut, _, k_mean = block_map_from_pooled(
        pooled_q, K["pooled"], L, cfg.block_k, cfg.sla_topk)
    from turbodiffusion_tpu.ops.sla_fused import subquant_pack_kv
    if v_chan:
        from turbodiffusion_tpu.ops.flash_pallas import quantize_v_per_channel
        vi, vcs = quantize_v_per_channel(V["bf16"], L)
        sel = lut.shape[-1]
        assert use_vt == (sel * cfg.block_k <= 8192
                          and _os.environ.get("TDX_SPARSE_VT", "1") != "0"), \
            (sel, sel_early)
        if use_vt:
            # single-pass VT kernel: K panel + per-block transposed V panel
            # (fast-form P@V contraction, no online softmax) — see
            # flash_pallas._sparse_attn_kernel_i8b_vt
            from turbodiffusion_tpu.ops.flash_pallas import (
                sparse_attention_i8_vt)
            from turbodiffusion_tpu.ops.sla_fused import subquant_pack_kvt
            packed = subquant_pack_kvt(K["bf16"], k_mean, vi, cfg.block_k,
                                       kv_len=L, linear_kv=fuse_lin,
                                       interpret=interpret)
            kp, vtp, ksb = packed[:3]
            lin_kvw = lin_ksb = None
            if fuse_lin:
                kv_raw, ksum = packed[3], packed[4]
                # fold V's per-channel int8 scale into kv's columns (exact:
                # kv[d,e] = vcs[e] * sum_l phi(k)[l,d] vi[l,e]), then proj_l
                kv = kv_raw * vcs.astype(jnp.float32)       # (B,H,D,D)*(B,H,1,D)
                lin_kvw = jnp.einsum(
                    "bhde,ef->bhdf", kv, proj_l["w"].astype(jnp.float32))
                bias = jnp.broadcast_to(
                    proj_l["b"].astype(jnp.float32)[None, None, None],
                    ksum.shape)
                lin_ksb = jnp.concatenate([ksum, bias], axis=2)  # (B,H,2,D)
            o = sparse_attention_i8_vt(
                Q["i8"], Q["scale"], kp, vtp, ksb, vcs, lut,
                block_q=cfg.block_q, block_k=cfg.block_k, kv_len=L,
                lin_kvw=lin_kvw, lin_ks_bias=lin_ksb,
                interpret=interpret)
        else:
            # descriptor-minimal grouped path: per-block K scales (SMEM
            # table) + per-channel V — one DMA per gathered block
            kvi, ksb = subquant_pack_kv(K["bf16"], k_mean, vi, cfg.block_k,
                                        block_scales=True, kv_len=L,
                                        interpret=interpret)
            zb = jnp.zeros((*vi.shape[:3], 1), jnp.float32)
            o = sparse_attention_i8_planes(
                Q["i8"], Q["scale"], None, zb, None, zb, lut,
                block_q=cfg.block_q, block_k=cfg.block_k, kv_len=L,
                v_channel_scale=vcs, kvi_packed=kvi, k_block_scale=ksb,
                interpret=interpret)
    else:
        vi, vs = V["i8"], V["scale"]
        kvi, ks = subquant_pack_kv(K["bf16"], k_mean, vi, cfg.block_k,
                                   interpret=interpret)
        o = sparse_attention_i8_planes(
            Q["i8"], Q["scale"], None, ks, None, vs, lut,
            block_q=cfg.block_q, block_k=cfg.block_k, kv_len=L,
            kvi_packed=kvi, interpret=interpret)
    if lin and not fuse_lin:
        o = o + linear_projected_planes(
            Q["bf16"], K["bf16"], V["bf16"],
            proj_l["w"], proj_l["b"], true_len=L, interpret=interpret)
    return o


def attention(q, k, v, cfg: AttentionConfig, proj_l=None):
    """Backend dispatch mirroring --attention_type (wan2.1_t2v_infer.py:51)."""
    if cfg.backend == "dense":
        return dense_attention(q, k, v,
                               use_reference_impl=cfg.use_reference_impl,
                               jvp_mode=cfg.jvp_mode)
    if cfg.backend == "sla":
        return sla_attention(q, k, v, proj_l, cfg, int8_qk=False)
    if cfg.backend == "sagesla":
        return sla_attention(q, k, v, proj_l, cfg, int8_qk=True)
    raise ValueError(f"Unknown attention backend: {cfg.backend}")
