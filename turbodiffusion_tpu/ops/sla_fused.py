"""Fused SLA attention front-end for TPU.

The unfused SageSLA data path costs ~11 full HBM passes per layer around the
sparse kernel itself: RMSNorm+RoPE on Q/K, (B,L,H,D)->(BH,L,D) fold
transposes, block-map mean-pools over full Q/K, the smooth-k mean+subtract,
and three per-row int8 quantizations. This module collapses them:

  * `head_planes`    — one pass over a QKV projection output producing any of:
                       bf16 head-planes (B,H,L,Dh) (the sparse kernel's native
                       layout — no fold transpose), per-(head,token) int8 +
                       scales, and per-block pooled means for the block map.
                       Optionally fused full-dim RMSNorm and rotate-half RoPE.
  * `block_map_from_pooled` — top-k LUT from the pooled side-outputs; the
                       smooth-k mean (SLA/utils.py:55-67) is recovered from
                       the pooled blocks instead of re-reading K.
  * `subquant_planes`— (K - mean) int8 quantization in one pass.
  * `unfold_quant`   — head-planes -> (B,L,H*Dh) int8 + per-token scales,
                       feeding the O projection's W8A8 GEMM directly.

Behavioral reference for the math: SLA/core.py:38-258 and SLA/utils.py;
layout/fusion strategy is TPU-specific.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT8_MAX = 127.0


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# row RMS inverse (wide-model two-pass norm: dim 5120 exceeds the VMEM tile)
# ---------------------------------------------------------------------------

def _row_rms_kernel(x_ref, o_ref, *, eps: float):
    xf = x_ref[0].astype(jnp.float32)
    o_ref[0] = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=("eps", "width", "col_block",
                                              "interpret"))
def row_rms_inv(x, eps: float = 1e-6, width: Optional[int] = None,
                col_block: int = 0, interpret: bool = False):
    """(B, L, W) -> (B, L, 1) fp32 rsqrt(mean(x^2)+eps) over columns
    [col_block*width, (col_block+1)*width). Feeds head_planes' external-RMS
    mode so wide models (14B: dim 5120) can tile the fused front-end over
    head groups while keeping the full-dim WanRMSNorm statistic."""
    B, L, Wx = x.shape
    W = width or Wx
    TL = max(8, min(512, (1_500_000 // W) // 8 * 8))
    grid = (B, _cdiv(L, TL))
    return pl.pallas_call(
        functools.partial(_row_rms_kernel, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((1, TL, W), lambda b, i, c=col_block: (b, i, c))],
        out_specs=pl.BlockSpec((1, TL, 1), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, 1), jnp.float32),
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# head_planes kernel
# ---------------------------------------------------------------------------

def _head_planes_kernel(refs, *, H: int, Dh: int, eps: float, L: int,
                        TL: int, pool: int, do_norm: bool, do_rope: bool,
                        do_quant: bool, do_bf16: bool, ext_rms: bool):
    it = iter(refs)
    x_ref = next(it)                         # (1, TL, H*Dh)
    w_ref = next(it) if do_norm else None    # (1, H*Dh)
    ri_ref = next(it) if ext_rms else None   # (1, TL, 1) precomputed rms inv
    cos_ref = next(it) if do_rope else None  # (TL, Dh)
    sin_ref = next(it) if do_rope else None
    bf_ref = next(it) if do_bf16 else None   # (1, H, TL, Dh)
    i8_ref = next(it) if do_quant else None  # (1, H, TL, Dh)
    sc_ref = next(it) if do_quant else None  # (1, H, TL, 1)
    pool_ref = next(it) if pool else None    # (1, H, TL//pool, Dh)

    i = pl.program_id(1)
    if do_norm:
        xf = x_ref[0].astype(jnp.float32)    # (TL, H*Dh)
        if ext_rms:
            rms = ri_ref[0]
        else:
            rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                                + eps)
    if pool:
        offs = i * TL + jax.lax.broadcasted_iota(jnp.int32, (TL, 1), 0)
        valid = (offs < L).astype(jnp.float32)               # (TL, 1)
        counts = jnp.maximum(
            jnp.sum(valid.reshape(TL // pool, pool, 1), axis=1), 1.0)

    cosF = cos_ref[...] if do_rope else None
    sinF = sin_ref[...] if do_rope else None

    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        if do_norm:
            y16 = (xf[:, sl] * rms).astype(bf_ref.dtype if do_bf16
                                           else jnp.bfloat16) * w_ref[0, sl]
        else:
            y16 = x_ref[0, :, sl]
        if do_rope:
            yf = y16.astype(jnp.float32)
            yf = yf * cosF + pltpu.roll(yf, Dh // 2, axis=1) * sinF
            y16 = yf.astype(y16.dtype)
        else:
            yf = y16.astype(jnp.float32)
        if do_bf16:
            bf_ref[0, h] = y16
        if do_quant:
            amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
            scale = jnp.maximum(amax, 1e-8) * (1.0 / INT8_MAX)
            i8_ref[0, h] = jnp.round(yf * (1.0 / scale)).astype(jnp.int8)
            # row-major scale layout (B, H, Lp): a (…, Lp, 1) f32 output
            # lane-pads 128x in HBM — 320 MB of pure padding per output at
            # the 14B head count (the r5 honest-config OOM); the (TL,1) ->
            # (TL,) relayout here is 512 values on-register
            sc_ref[0, h] = scale.reshape(TL)
        if pool:
            # where, not multiply: out-of-range rows may read NaN garbage
            seg = jnp.where(valid > 0, yf, 0.0).reshape(TL // pool, pool, Dh)
            # pooled layout is (B, nP, H, Dh): the (H, Dh) minor dims match
            # the array dims exactly, satisfying Mosaic's tiling rule for
            # the small TL//pool sublane count
            pool_ref[0, :, h] = jnp.sum(seg, axis=1) / counts


@functools.partial(
    jax.jit, static_argnames=("num_heads", "eps", "pool", "quant", "bf16_out",
                              "pad_to", "width", "col_block", "interpret"))
def head_planes(x, weight=None, cos_full=None, sin_full=None, *,
                num_heads: int, eps: float = 1e-6, pool: int = 0,
                quant: bool = False, bf16_out: bool = True,
                pad_to: Optional[int] = None, width: Optional[int] = None,
                col_block: int = 0, rms_inv=None, interpret: bool = False):
    """One-pass head-plane transform of a (B, L, H*Dh) projection output.

    Returns a dict with keys among:
      bf16   (B, H, Lp, Dh)  x.dtype
      i8     (B, H, Lp, Dh)  int8, per-(head,token) symmetric
      scale  (B, H, Lp)      fp32 row-major (no (…,1) lane padding)
      pooled (B, H, ceil(L/pool), Dh) fp32 masked block means

    Rows in [L, Lp) are unwritten garbage — consumers mask them (the sparse
    kernel's poison bias; the unfold's length slice). weight => fused
    full-dim RMSNorm; cos/sin (Lp, Dh) => fused rotate-half RoPE.

    width/col_block: read columns [col_block*width, (col_block+1)*width) of a
    wider input (e.g. a fused QKV GEMM output) — the slice happens in the
    BlockSpec index map, i.e. for free in the DMA.
    """
    B, L, Wx = x.shape
    HD = width or Wx
    H = num_heads
    Dh = HD // H
    Lp = pad_to or L
    # TL=256 keeps the worst case (bf16+i8+pool outputs, fp32 temps, double
    # buffering) under the 16MB scoped-vmem limit at HD=1536; calls that
    # emit fewer outputs (the K/V passes: no int8+scale, or no pool) take
    # 512-row tiles — half the grid steps at ~9.5MB modeled liveness
    # (TDX_HP_TL512=0 reverts; bench.py's retry flips it off)
    import os as _os
    heavy = quant and bf16_out
    tl512 = _os.environ.get("TDX_HP_TL512", "1") == "1"
    TL = min(512 if (tl512 and not heavy and HD <= 2048) else 256, Lp)
    assert Lp % TL == 0, (Lp, TL)
    if pool:
        assert TL % pool == 0, (TL, pool)
    do_norm = weight is not None
    do_rope = cos_full is not None
    ext_rms = rms_inv is not None
    grid = (B, Lp // TL)

    in_specs = [pl.BlockSpec((1, TL, HD),
                             lambda b, i, c=col_block: (b, i, c))]
    args = [x]
    if do_norm:
        in_specs.append(pl.BlockSpec((1, HD), lambda b, i: (0, 0)))
        args.append(weight.reshape(1, HD).astype(x.dtype))
    if ext_rms:
        # precomputed full-dim RMS inverse (row_rms_inv): head-group tiling
        # for wide models where H*Dh exceeds the VMEM tile but the norm
        # statistic must span the whole model dim
        in_specs.append(pl.BlockSpec((1, TL, 1), lambda b, i: (b, i, 0)))
        args.append(rms_inv)
    if do_rope:
        in_specs += [pl.BlockSpec((TL, Dh), lambda b, i: (i, 0))] * 2
        args += [cos_full, sin_full]

    out_specs, out_shapes, keys = [], [], []
    if bf16_out:
        out_specs.append(pl.BlockSpec((1, H, TL, Dh), lambda b, i: (b, 0, i, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((B, H, Lp, Dh), x.dtype))
        keys.append("bf16")
    if quant:
        out_specs.append(pl.BlockSpec((1, H, TL, Dh), lambda b, i: (b, 0, i, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((B, H, Lp, Dh), jnp.int8))
        keys.append("i8")
        out_specs.append(pl.BlockSpec((1, H, TL), lambda b, i: (b, 0, i)))
        out_shapes.append(jax.ShapeDtypeStruct((B, H, Lp), jnp.float32))
        keys.append("scale")
    if pool:
        # allocate to the padded block count — a tail block straddling nP
        # would otherwise be dropped at the write; sliced to nP below
        out_specs.append(pl.BlockSpec((1, TL // pool, H, Dh),
                                      lambda b, i: (b, i, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((B, Lp // pool, H, Dh),
                                               jnp.float32))
        keys.append("pooled")

    kernel = functools.partial(
        _head_planes_kernel, H=H, Dh=Dh, eps=eps, L=L, TL=TL, pool=pool,
        do_norm=do_norm, do_rope=do_rope, do_quant=quant, do_bf16=bf16_out,
        ext_rms=ext_rms)

    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(*args)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    result = dict(zip(keys, outs))
    if pool:
        # expose pooled in (B, H, nP, Dh); the transpose is tiny (nP ~ L/256)
        nP = _cdiv(L, pool)
        result["pooled"] = jnp.swapaxes(result["pooled"][:, :nP], 1, 2)
    return result


def head_planes_ref(x, weight=None, cos_full=None, sin_full=None, *,
                    num_heads: int, eps: float = 1e-6, pool: int = 0):
    """jnp reference of head_planes (unpadded): returns the same dict."""
    from turbodiffusion_tpu.models.layers import rms_norm
    from turbodiffusion_tpu.ops.fused_norm import rmsnorm_rope_ref
    B, L, HD = x.shape
    H, Dh = num_heads, HD // num_heads
    if weight is not None and cos_full is not None:
        y = rmsnorm_rope_ref(x, weight, cos_full[:L], sin_full[:L], eps)
    elif weight is not None:
        y = rms_norm(x, weight, eps=eps).reshape(B, L, H, Dh)
    else:
        y = x.reshape(B, L, H, Dh)
    planes = jnp.swapaxes(y, 1, 2)                       # (B, H, L, Dh)
    out = {"bf16": planes}
    yf = planes.astype(jnp.float32)
    amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / INT8_MAX
    out["i8"] = jnp.round(yf / scale).astype(jnp.int8)
    out["scale"] = scale[..., 0]
    if pool:
        nP = _cdiv(L, pool)
        pad = nP * pool - L
        yp = jnp.pad(yf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        counts = jnp.minimum(pool, L - jnp.arange(nP) * pool
                             ).astype(jnp.float32)
        out["pooled"] = (jnp.sum(yp.reshape(B, H, nP, pool, Dh), axis=3)
                         / counts[None, None, :, None])
    return out


# ---------------------------------------------------------------------------
# smooth-k block map from pooled means
# ---------------------------------------------------------------------------

def block_map_from_pooled(pooled_q, pooled_k, L: int, pool: int,
                          topk_ratio: float):
    """Top-k K-block LUT from pooled means (≡ ops/attention.get_block_map on
    the full tensors — pooling is linear, so smooth-k before pooling equals
    mean-subtraction after pooling).

    `pool` is the K-side pooling block; pooled_q may use a different one.
    Returns (lut (B,H,nQ,topk) int32, topk, k_mean (B,H,1,Dh) fp32)."""
    nK = pooled_k.shape[2]
    counts = jnp.minimum(pool, L - jnp.arange(nK) * pool).astype(jnp.float32)
    k_mean = jnp.sum(pooled_k * counts[None, None, :, None], axis=2,
                     keepdims=True) / float(L)
    pkc = pooled_k - k_mean
    score = jnp.einsum("bhqd,bhkd->bhqk", pooled_q, pkc,
                       preferred_element_type=jnp.float32)
    topk = max(1, min(nK, int(topk_ratio * nK)))
    _, lut = jax.lax.top_k(score, topk)
    return lut.astype(jnp.int32), topk, k_mean


# ---------------------------------------------------------------------------
# smooth-k subtract + quantize (K path)
# ---------------------------------------------------------------------------

def _subquant_kernel(x_ref, mu_ref, i8_ref, sc_ref):
    xf = x_ref[0].astype(jnp.float32) - mu_ref[0]
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / INT8_MAX)
    i8_ref[0] = jnp.round(xf * (1.0 / scale)).astype(jnp.int8)
    sc_ref[0] = scale


def _subquant_pack_kernel(k_ref, mu_ref, v_ref, kv_ref, sc_ref, *,
                          block_k: int, kv_len: int):
    xf = k_ref[0].astype(jnp.float32) - mu_ref[0]
    D = xf.shape[-1]
    if block_k:
        # per-BLOCK scale (the SageAttention granularity): one scalar per
        # block_k rows, broadcast back over the rows for the quantization.
        # Rows past kv_len are unwritten garbage (possibly NaN) — exclude
        # them from the block statistic or they poison the whole block.
        TL = xf.shape[0]
        nb = TL // block_k
        offs = pl.program_id(1) * TL + \
            jax.lax.broadcasted_iota(jnp.int32, (TL, 1), 0)
        rowmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)   # (TL, 1)
        rowmax = jnp.where(offs < kv_len, rowmax, 0.0)
        # per-block scalar max via static slices (a (TL,1)->(nb,block_k)
        # reshape is an unsupported Mosaic shape cast)
        segs = []
        for bi in range(nb):
            m = jnp.max(rowmax[bi * block_k:(bi + 1) * block_k])
            segs.append(jnp.full((block_k, 1),
                                 jnp.maximum(m, 1e-8) * (1.0 / INT8_MAX),
                                 jnp.float32))
        rows = jnp.concatenate(segs, axis=0)                    # (TL, 1)
        kv_ref[0, :, :D] = jnp.round(xf * (1.0 / rows)).astype(jnp.int8)
        # row-major (TL//128, 128) scale write: a (BH, Lp, 1) f32 out_shape
        # gets its unit lane dim padded to 128 by the custom-call layout —
        # 640 MB of pure padding at the 14B geometry (the r4 HBM-OOM
        # culprit); this relayout keeps the buffer at true size
        sc_ref[0] = rows.reshape(rows.shape[0] // 128, 128)
    else:
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) * (1.0 / INT8_MAX)
        kv_ref[0, :, :D] = jnp.round(xf * (1.0 / scale)).astype(jnp.int8)
        sc_ref[0] = scale.reshape(scale.shape[0] // 128, 128)
    kv_ref[0, :, D:] = v_ref[0]


def _subquant_pack_kvt_kernel(k_ref, mu_ref, v_ref, kp_ref, vt_ref, sc_ref,
                              *acc, block_k: int, kv_len: int):
    """Smooth-k subtract + per-BLOCK int8 quant of K, plus a per-block
    TRANSPOSED copy of the (already per-channel-quantized) V — the panel
    pair consumed by the single-pass VT sparse kernel
    (flash_pallas._sparse_attn_kernel_i8b_vt). One pass over K and V.

    With `acc` (linear_kv=True): also accumulates the SLA linear branch's
    KV statistics over the same K/V walk — kv += phi(k)^T v_i8 and
    ksum += sum phi(k) (phi = softmax over head dim of the RAW roped/normed
    k, reference SLA/core.py:94-114) — deleting the separate
    linear-attention accumulation pass over K and V (one full HBM re-read
    of both). V's per-channel int8 scale folds exactly into the kv columns
    outside the kernel."""
    kf = k_ref[0].astype(jnp.float32)
    xf = kf - mu_ref[0]
    TL = xf.shape[0]
    nb = TL // block_k
    offs = pl.program_id(1) * TL + \
        jax.lax.broadcasted_iota(jnp.int32, (TL, 1), 0)
    rowmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    rowmax = jnp.where(offs < kv_len, rowmax, 0.0)
    segs = []
    for bi in range(nb):
        m = jnp.max(rowmax[bi * block_k:(bi + 1) * block_k])
        segs.append(jnp.full((block_k, 1),
                             jnp.maximum(m, 1e-8) * (1.0 / INT8_MAX),
                             jnp.float32))
    rows = jnp.concatenate(segs, axis=0)                    # (TL, 1)
    kp_ref[0] = jnp.round(xf * (1.0 / rows)).astype(jnp.int8)
    sc_ref[0] = rows.reshape(rows.shape[0] // 128, 128)
    for bi in range(nb):
        vt_ref[0, bi] = v_ref[0, bi * block_k:(bi + 1) * block_k, :].T

    if acc:
        kv_ref, ksum_ref, kv_acc, ks_acc = acc
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            kv_acc[...] = jnp.zeros_like(kv_acc)
            ks_acc[...] = jnp.zeros_like(ks_acc)

        mx = jnp.max(kf, axis=-1, keepdims=True)
        e = jnp.exp(kf - mx)
        pk = e / jnp.sum(e, axis=-1, keepdims=True)
        # rows past kv_len are unwritten garbage (possibly NaN -> NaN pk
        # row); the where() replaces them with 0 after the softmax
        pk = jnp.where(offs < kv_len, pk, 0.0)
        vf = v_ref[0].astype(jnp.float32)       # int8 -> always finite
        kv_acc[...] += jax.lax.dot_general(
            pk, vf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ks_acc[...] += jnp.sum(pk, axis=0, keepdims=True)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            kv_ref[0] = kv_acc[...]
            ksum_ref[0] = ks_acc[...]


@functools.partial(jax.jit, static_argnames=("block_k", "kv_len",
                                              "linear_kv", "interpret"))
def subquant_pack_kvt(k_planes, mu, v_i8, block_k: int, kv_len=None,
                      linear_kv: bool = False, interpret: bool = False):
    """Producer for the single-pass VT sparse kernel: K panel (per-block
    int8, smooth-k subtracted), per-block transposed V panel, per-block K
    scales — one fused pass.

    k_planes: (B, H, Lp, D) bf16; mu: (B, H, 1, D); v_i8: (B, H, Lp, D) int8
    (per-channel quantized). Returns (kp (B,H,Lp,D) int8,
    vtp (B,H,nK,D,block_k) int8, ks (B,H,nK) fp32).

    linear_kv=True: additionally returns (kv (B,H,D,D) f32, ksum (B,H,1,D)
    f32) — the SLA linear branch's phi(k)^T v / sum phi(k) statistics
    accumulated in the same K/V walk (v still int8: fold its per-channel
    scale into kv's columns before use)."""
    B, H, Lp, D = k_planes.shape
    BH = B * H
    k2 = k_planes.reshape(BH, Lp, D)
    v2 = v_i8.reshape(BH, Lp, D)
    m = mu.reshape(BH, 1, D).astype(jnp.float32)
    TL = 1024 if Lp % 1024 == 0 else 512    # Lp is a 512 multiple
    TL = min(TL, Lp)
    assert Lp % TL == 0 and TL % block_k == 0, (Lp, TL, block_k)
    nK = Lp // block_k
    nb = TL // block_k
    grid = (BH, Lp // TL)
    out_specs = [pl.BlockSpec((1, TL, D), lambda bh, i: (bh, i, 0)),
                 pl.BlockSpec((1, nb, D, block_k),
                              lambda bh, i: (bh, i, 0, 0)),
                 pl.BlockSpec((1, TL // 128, 128),
                              lambda bh, i: (bh, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((BH, Lp, D), jnp.int8),
                 jax.ShapeDtypeStruct((BH, nK, D, block_k), jnp.int8),
                 jax.ShapeDtypeStruct((BH, Lp // 128, 128), jnp.float32)]
    scratch = []
    if linear_kv:
        out_specs += [pl.BlockSpec((1, D, D), lambda bh, i: (bh, 0, 0)),
                      pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0))]
        out_shape += [jax.ShapeDtypeStruct((BH, D, D), jnp.float32),
                      jax.ShapeDtypeStruct((BH, 1, D), jnp.float32)]
        scratch = [pltpu.VMEM((D, D), jnp.float32),
                   pltpu.VMEM((1, D), jnp.float32)]
    outs = pl.pallas_call(
        functools.partial(_subquant_pack_kvt_kernel, block_k=block_k,
                          kv_len=kv_len if kv_len is not None else Lp),
        grid=grid,
        in_specs=[pl.BlockSpec((1, TL, D), lambda bh, i: (bh, i, 0)),
                  pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0)),
                  pl.BlockSpec((1, TL, D), lambda bh, i: (bh, i, 0))],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
    )(k2, m, v2)
    kp, vtp, sc = outs[:3]
    ks = sc.reshape(BH, nK, block_k)[:, :, 0]
    res = (kp.reshape(B, H, Lp, D),
           vtp.reshape(B, H, nK, D, block_k),
           ks.reshape(B, H, nK))
    if linear_kv:
        res += (outs[3].reshape(B, H, D, D), outs[4].reshape(B, H, 1, D))
    return res


@functools.partial(jax.jit, static_argnames=("block_k", "block_scales",
                                              "kv_len", "interpret"))
def subquant_pack_kv(k_planes, mu, v_i8, block_k: int,
                     block_scales: bool = False, kv_len=None,
                     interpret: bool = False):
    """Smooth-k subtract + INT8 quantize of K, written directly into the
    packed (BH, Lkp + block_k, 2D) K|V layout the sparse kernel DMA-gathers —
    replaces the separate subquant + concatenate + poison-pad chain (three
    full passes over K|V) with one. The trailing poison block's contents are
    never read through a live score, so its rows are left unwritten.

    k_planes: (B, H, Lp, D) bf16; mu: (B, H, 1, D); v_i8: (B, H, Lp, D) int8.
    block_scales=False: per-row scales, returns (kvi, ks (B, H, Lp, 1)).
    block_scales=True: per-BLOCK scales for the descriptor-minimal kernel,
    returns (kvi, ks (B, H, Lp // block_k))."""
    B, H, Lp, D = k_planes.shape
    BH = B * H
    k2 = k_planes.reshape(BH, Lp, D)
    v2 = v_i8.reshape(BH, Lp, D)
    m = mu.reshape(BH, 1, D).astype(jnp.float32)
    TL = 1024 if Lp % 1024 == 0 else 512    # Lp is a 512 multiple
    TL = min(TL, Lp)
    assert Lp % TL == 0, (Lp, TL)
    grid = (BH, Lp // TL)
    kvi, sc = pl.pallas_call(
        functools.partial(_subquant_pack_kernel,
                          block_k=block_k if block_scales else 0,
                          kv_len=kv_len if kv_len is not None else Lp),
        grid=grid,
        in_specs=[pl.BlockSpec((1, TL, D), lambda bh, i: (bh, i, 0)),
                  pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0)),
                  pl.BlockSpec((1, TL, D), lambda bh, i: (bh, i, 0))],
        out_specs=(pl.BlockSpec((1, TL, 2 * D), lambda bh, i: (bh, i, 0)),
                   pl.BlockSpec((1, TL // 128, 128), lambda bh, i: (bh, i, 0))),
        out_shape=(jax.ShapeDtypeStruct((BH, Lp + block_k, 2 * D), jnp.int8),
                   jax.ShapeDtypeStruct((BH, Lp // 128, 128), jnp.float32)),
        interpret=interpret,
    )(k2, m, v2)
    if block_scales:
        # one scalar per block (rows within a block share it)
        ks = sc.reshape(BH, Lp // block_k, block_k)[:, :, 0]
        return kvi, ks.reshape(B, H, Lp // block_k)
    return kvi, sc.reshape(B, H, Lp, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def subquant_planes(planes, mu, interpret: bool = False):
    """(B,H,L,Dh) bf16 planes minus per-(B,H) mean -> int8 + (B,H,L,1)
    scales, one pass (the SageSLA smooth-k quantization,
    SLA/core.py:195-199)."""
    B, H, Lp, Dh = planes.shape
    x = planes.reshape(B * H, Lp, Dh)
    m = mu.reshape(B * H, 1, Dh).astype(jnp.float32)
    TL = min(1024, Lp)
    assert Lp % TL == 0
    grid = (B * H, Lp // TL)
    i8, sc = pl.pallas_call(
        _subquant_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, TL, Dh), lambda bh, i: (bh, i, 0)),
                  pl.BlockSpec((1, 1, Dh), lambda bh, i: (bh, 0, 0))],
        out_specs=(pl.BlockSpec((1, TL, Dh), lambda bh, i: (bh, i, 0)),
                   pl.BlockSpec((1, TL, 1), lambda bh, i: (bh, i, 0))),
        out_shape=(jax.ShapeDtypeStruct((B * H, Lp, Dh), jnp.int8),
                   jax.ShapeDtypeStruct((B * H, Lp, 1), jnp.float32)),
        interpret=interpret,
    )(x, m)
    return i8.reshape(B, H, Lp, Dh), sc.reshape(B, H, Lp, 1)


# ---------------------------------------------------------------------------
# unfold + per-token quantize (O-projection feed)
# ---------------------------------------------------------------------------

def _unfold_quant_kernel(x_ref, i8_ref, sc_ref, *, H: int, Dh: int):
    m = jnp.zeros((x_ref.shape[2], 1), jnp.float32)
    for h in range(H):
        yf = x_ref[0, h].astype(jnp.float32)
        m = jnp.maximum(m, jnp.max(jnp.abs(yf), axis=-1, keepdims=True))
    scale = jnp.maximum(m, 1e-8) * (1.0 / INT8_MAX)
    inv = 1.0 / scale
    for h in range(H):
        yf = x_ref[0, h].astype(jnp.float32)
        i8_ref[0, :, h * Dh:(h + 1) * Dh] = jnp.round(yf * inv
                                                      ).astype(jnp.int8)
    sc_ref[0] = scale


def _unfold_scale_kernel(x_ref, sc_ref, *, H: int):
    """Per-token amax over heads, one head per grid step. The out block
    index is constant in h, so the (TL,1) accumulator stays VMEM-resident
    across the inner h loop; the scale is finalized at the last head.

    Why not one unrolled loop over H (the narrow-path kernel's shape): at
    H=40 Mosaic allocates the f32 cast of every head on the kernel stack —
    an 18.6M scoped-vmem frame vs the 16M limit (the r3 14B bench crash)."""
    h = pl.program_id(2)
    yf = x_ref[0, 0].astype(jnp.float32)
    m = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)

    @pl.when(h == 0)
    def _init():
        sc_ref[0] = m

    @pl.when(h > 0)
    def _acc():
        sc_ref[0] = jnp.maximum(sc_ref[0], m)

    @pl.when(h == H - 1)
    def _finalize():
        sc_ref[0] = jnp.maximum(sc_ref[0], 1e-8) * (1.0 / INT8_MAX)


def _unfold_write_kernel(x_ref, sc_ref, i8_ref):
    yf = x_ref[0, 0].astype(jnp.float32)
    i8_ref[0] = jnp.round(yf / sc_ref[0]).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("out_len", "interpret"))
def unfold_quant(planes, out_len: int, interpret: bool = False):
    """(B,H,Lp,Dh) head-planes -> ((B,L,H*Dh) int8, (B,L,1) fp32) per-token
    quantized, ready for the W8A8 O-projection."""
    B, H, Lp, Dh = planes.shape
    if H * Dh > 4096:
        # wide models (14B: H*Dh=5120): the one-pass kernel's column-sliced
        # int8 writes blow the Mosaic VMEM stack (measured 23.6M > 16M at
        # H=40). Two passes instead: per-token amax over heads, then a
        # per-(tile, head) int8 write into a (B, Lp, H, Dh) view of the
        # row-major output — no lane-offset writes, tiny tiles.
        TL = min(512, Lp)
        assert Lp % TL == 0
        sc = pl.pallas_call(
            functools.partial(_unfold_scale_kernel, H=H),
            grid=(B, Lp // TL, H),
            in_specs=[pl.BlockSpec((1, 1, TL, Dh),
                                   lambda b, i, h: (b, h, i, 0))],
            out_specs=pl.BlockSpec((1, TL, 1), lambda b, i, h: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Lp, 1), jnp.float32),
            interpret=interpret,
        )(planes)
        # per-(tile, head) int8 writes land at lane offset h*Dh of the
        # row-major output — each program writes one clean (TL, 128) block
        i8 = pl.pallas_call(
            _unfold_write_kernel,
            grid=(B, Lp // TL, H),
            in_specs=[pl.BlockSpec((1, 1, TL, Dh),
                                   lambda b, i, h: (b, h, i, 0)),
                      pl.BlockSpec((1, TL, 1), lambda b, i, h: (b, i, 0))],
            out_specs=pl.BlockSpec((1, TL, Dh), lambda b, i, h: (b, i, h)),
            out_shape=jax.ShapeDtypeStruct((B, Lp, H * Dh), jnp.int8),
            interpret=interpret,
        )(planes, sc)
        return i8[:, :out_len], sc[:, :out_len]
    TL = min(512, Lp)
    assert Lp % TL == 0
    grid = (B, Lp // TL)
    i8, sc = pl.pallas_call(
        functools.partial(_unfold_quant_kernel, H=H, Dh=Dh),
        grid=grid,
        in_specs=[pl.BlockSpec((1, H, TL, Dh), lambda b, i: (b, 0, i, 0))],
        out_specs=(pl.BlockSpec((1, TL, H * Dh), lambda b, i: (b, i, 0)),
                   pl.BlockSpec((1, TL, 1), lambda b, i: (b, i, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, Lp, H * Dh), jnp.int8),
                   jax.ShapeDtypeStruct((B, Lp, 1), jnp.float32)),
        interpret=interpret,
    )(planes)
    return i8[:, :out_len], sc[:, :out_len]


def unfold_planes(planes, out_len: int):
    """Plain bf16 unfold for the unquantized O projection."""
    B, H, Lp, Dh = planes.shape
    return jnp.swapaxes(planes, 1, 2).reshape(B, Lp, H * Dh)[:, :out_len]
