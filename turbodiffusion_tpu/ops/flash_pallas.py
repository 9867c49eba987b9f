"""Pallas TPU flash attention with optional block-sparse LUT and INT8 QK.

One kernel family covers the reference's three attention paths
(inference/wan2.1_t2v_infer.py:51 --attention_type):

  * dense     — classic flash attention (online softmax over all K blocks)
  * sla       — block-sparse: each Q-block visits only the K blocks in its
                LUT row (SLA/kernel.py:22-82 is the behavioral spec). On TPU
                the LUT rides the scalar-prefetch path, so the sparse gather
                becomes BlockSpec index_map arithmetic: the grid's innermost
                dimension enumerates the top-k selected blocks and the DMA
                engine fetches exactly those — dense MXU compute, sparse HBM
                traffic (the SpargeAttn trick, natively).
  * sagesla   — same traversal with Q/K quantized to INT8 per row inside the
                kernel (SageAttention-style). The wrapper subtracts the
                per-head key mean ("smooth-k") first; softmax is invariant to
                that shift, so results match dense numerics up to quant noise
                (SLA/core.py:195-241 is the behavioral spec).

Differentiation: a custom VJP. For the sparse path a fused Pallas backward
(semantics: SLA/kernel.py:86-237) runs two kernels — a dq pass that mirrors
the forward's LUT gather (emitting each row's log-sum-exp and delta as
byproducts, so no extra residuals are saved), and a dk/dv pass driven by an
INVERSE LUT (for each K block: which Q blocks selected it), which turns the
scatter-add the reference needs into plain blocked writes. A jnp gather/
scatter fallback covers non-TPU backends; the dense path recomputes in jnp.

Layout: (B, L, H, D) in/out. The wrapper folds (B, H) into one grid axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # fold into scales so kernels run exp2, not exp


def _row_scales(qs, BH, Lp):
    """Per-row scales in row-major (BH, 1, Lp) f32 for (1, 1, BQ) kernel
    blocks. Accepts head_planes' native (B, H, Lp) layout or the legacy
    (B, H, Lp, 1) column layout (whose unit lane dim tile-pads 128x in
    HBM — the reason row-major is the wire format)."""
    if qs.ndim == 4:
        qs = qs[..., 0]
    return qs.reshape(BH, 1, Lp).astype(jnp.float32)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------

def _attn_kernel(lut_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                 *, scale: float, block_k: int, kv_len: int, int8_qk: bool):
    """Grid: (BH, nQ, S). Innermost S walks selected (or all) K blocks."""
    j = pl.program_id(2)
    num_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]            # (BQ, D)
    k = k_ref[0]            # (BK, D)
    v = v_ref[0]            # (BK, D)

    if int8_qk:
        # Per-row symmetric INT8 quantization of Q and K; MXU runs the
        # s8 x s8 -> s32 product; scales re-applied as a rank-1 outer product.
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q_amax = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-6)
        k_amax = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1, keepdims=True), 1e-6)
        qi = jnp.round(qf * (127.0 / q_amax)).astype(jnp.int8)
        ki = jnp.round(kf * (127.0 / k_amax)).astype(jnp.int8)
        s32 = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * (q_amax / 127.0) * (k_amax.T / 127.0) * scale
    else:
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale

    # Mask out-of-range KV columns (sequence padded to a block multiple).
    if lut_ref is not None:
        bh, i = pl.program_id(0), pl.program_id(1)
        kb = lut_ref[bh, i, j]
    else:
        kb = j
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:, :1]                                   # (BQ, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                                  # (BQ, BK)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(j == num_j - 1)
    def _finalize():
        l = jnp.maximum(l_scr[:, :1], 1e-20)
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

def _attn_kernel_onepass(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         kv_len: int):
    """Single-KV-block attention (cross-attention: 512 text tokens fit one
    tile). No online-softmax scratch, no finalize branch — the flash m/l
    ring and its (BQ, 128) broadcasts cost ~3x the roofline at tiny K."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-20)
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _cross_attn_qout_kernel(q_ref, *rest, scale: float, kv_len: int,
                            H: int, Dh: int, eps: float = 0.0,
                            fused_norm: bool = False):
    """All-heads single-KV-tile attention with per-token INT8 output.

    q_ref (H, BQ, Dh) head planes — or, with fused_norm, the RAW
    (1, BQ, H*Dh) q-projection rows plus a (1, H*Dh) norm weight: the
    full-dim RMSNorm runs in-kernel and heads are read via static lane
    slices, deleting the standalone norm pass AND the (B, L, H, Dh) ->
    planes transpose (each a full (L, D) HBM read+write per layer).
    k, v stay (H, Lkp, Dh); emits the O-projection feed directly:
    (BQ, H*Dh) int8 rows + per-token fp32 scales — the unfold transpose
    AND the standalone quantize_rows HBM round trip both disappear."""
    if fused_norm:
        nw_ref, k_ref, v_ref, i8_ref, sc_ref, o_scr = rest
        xf = q_ref[0].astype(jnp.float32)            # (BQ, H*Dh)
        rms = jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        # match rmsnorm_rope_ref: fp32 stats, cast, weight mul in x.dtype
        xn = ((xf * rms).astype(q_ref.dtype)
              * nw_ref[0].astype(q_ref.dtype))
    else:
        k_ref, v_ref, i8_ref, sc_ref, o_scr = rest
    for h in range(H):
        q = xn[:, h * Dh:(h + 1) * Dh] if fused_norm else q_ref[h]
        k = k_ref[h]
        v = v_ref[h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-20)
        o = jax.lax.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
        o_scr[h] = o / l
    amax = jnp.zeros((o_scr.shape[1], 1), jnp.float32)
    for h in range(H):
        amax = jnp.maximum(amax, jnp.max(jnp.abs(o_scr[h]), axis=-1,
                                         keepdims=True))
    sc = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    inv = 1.0 / sc
    for h in range(H):
        i8_ref[0, :, h * Dh:(h + 1) * Dh] = jnp.round(o_scr[h] * inv
                                                      ).astype(jnp.int8)
    sc_ref[0] = sc


def _cross_attn_qout_wide_kernel(q_ref, *rest, scale: float, kv_len: int,
                                 G: int, Dh: int, fused_norm: bool):
    """Head-GROUPED all-heads cross-attention qout (wide models; 14B: H=40).

    The narrow kernel unrolls every head in one program — at H=40 the
    per-head fp32 temps exceed the 16 MB Mosaic kernel stack (the same
    failure as unfold_quant's, sla_fused.py:565-573). Here the grid gains an
    innermost head-group dim: each program runs G heads against its own
    (G, Lkp, Dh) K/V block; per-group outputs collect in a VMEM scratch
    indexed by group id (leading-dim dynamic store — lane-dim dynamic
    slicing is unsupported), and the LAST group program computes the
    cross-ALL-heads per-token scale and emits the int8 O-feed, so the
    numerics are identical to the narrow kernel's. The full-dim RMS
    statistic arrives precomputed (sla_fused.row_rms_inv) because a program
    only sees its group's q columns.

    fused_norm=False (the LTX planes mode): q_ref is a (G, BQ, Dh)
    head-plane block, already normed/roped — no nw/ri inputs."""
    if fused_norm:
        nw_ref, ri_ref, k_ref, v_ref, i8_ref, sc_ref, o_scr, amax_scr = rest
    else:
        k_ref, v_ref, i8_ref, sc_ref, o_scr, amax_scr = rest
    h = pl.program_id(2)
    n_hg = pl.num_programs(2)

    @pl.when(h == 0)
    def _():
        amax_scr[...] = jnp.zeros_like(amax_scr)

    if fused_norm:
        xf = q_ref[0].astype(jnp.float32)               # (BQ, G*Dh)
        xn = ((xf * ri_ref[0]).astype(q_ref.dtype)
              * nw_ref[0].astype(q_ref.dtype))
    outs = []
    for g in range(G):
        qg = xn[:, g * Dh:(g + 1) * Dh] if fused_norm else q_ref[g]
        s = jax.lax.dot_general(qg, k_ref[g], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-20)
        o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[g],
                        preferred_element_type=jnp.float32)
        outs.append(o / l)
    oG = jnp.concatenate(outs, axis=1)                  # (BQ, G*Dh) f32
    o_scr[h] = oG
    amax_scr[...] = jnp.maximum(
        amax_scr[...], jnp.max(jnp.abs(oG), axis=-1, keepdims=True))

    @pl.when(h == n_hg - 1)
    def _finalize():
        sc = jnp.maximum(amax_scr[...], 1e-8) * (1.0 / 127.0)
        inv = 1.0 / sc
        GD = G * Dh
        for g2 in range(n_hg):
            i8_ref[0, :, g2 * GD:(g2 + 1) * GD] = jnp.round(
                o_scr[g2] * inv).astype(jnp.int8)
        sc_ref[0] = sc


def _cross_qout_group(H: int, Dh: int) -> int:
    """Largest head-group size G with H % G == 0 and G*Dh <= 2048 (the
    narrow kernel's proven per-program head budget)."""
    G = max(1, 2048 // Dh)
    while H % G:
        G -= 1
    return G


def _cross_attention_qout_wide(q, k, v, norm_w, scale: float,
                               eps: float, interpret: bool):
    """Wide-model entry. q: (B, Lq, H*Dh) RAW projection output with norm_w
    (the Wan mode: full-dim RMS precomputed via row_rms_inv), or
    (B, Lq, H, Dh) pre-normed planes with norm_w=None (the LTX mode)."""
    fused_norm = norm_w is not None
    H, Dh = k.shape[2], k.shape[3]
    HD = H * Dh
    if fused_norm:
        B, Lq, _ = q.shape
    else:
        B, Lq = q.shape[0], q.shape[1]
    Lk = k.shape[1]
    Lkp = _cdiv(Lk, 128) * 128
    BQ = min(256, _cdiv(Lq, 128) * 128)
    nQ = _cdiv(Lq, BQ)
    G = _cross_qout_group(H, Dh)
    n_hg = H // G

    def fold(x, lp):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], Dh)
        return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))

    kf, vf = fold(k, Lkp), fold(v, Lkp)
    kv_specs = [
        pl.BlockSpec((G, Lkp, Dh), lambda b, i, h, n=n_hg: (b * n + h, 0, 0)),
        pl.BlockSpec((G, Lkp, Dh), lambda b, i, h, n=n_hg: (b * n + h, 0, 0)),
    ]
    if fused_norm:
        from turbodiffusion_tpu.ops.sla_fused import row_rms_inv
        ri = row_rms_inv(q, eps, interpret=interpret)       # (B, Lq, 1)
        in_specs = [
            pl.BlockSpec((1, BQ, G * Dh), lambda b, i, h: (b, i, h)),
            pl.BlockSpec((1, G * Dh), lambda b, i, h: (0, h)),
            pl.BlockSpec((1, BQ, 1), lambda b, i, h: (b, i, 0)),
        ] + kv_specs
        args = (q, norm_w.reshape(1, HD).astype(q.dtype), ri, kf, vf)
    else:
        qf = fold(q, Lq)                                    # (B*H, Lq, Dh)
        in_specs = [
            pl.BlockSpec((G, BQ, Dh), lambda b, i, h, n=n_hg: (b * n + h, i, 0)),
        ] + kv_specs
        args = (qf, kf, vf)
    i8, sc = pl.pallas_call(
        functools.partial(_cross_attn_qout_wide_kernel, scale=scale,
                          kv_len=Lk, G=G, Dh=Dh, fused_norm=fused_norm),
        grid=(B, nQ, n_hg),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, BQ, HD), lambda b, i, h: (b, i, 0)),
                   pl.BlockSpec((1, BQ, 1), lambda b, i, h: (b, i, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, Lq, HD), jnp.int8),
                   jax.ShapeDtypeStruct((B, Lq, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((n_hg, BQ, G * Dh), jnp.float32),
                        pltpu.VMEM((BQ, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return i8, sc


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "eps"))
def cross_attention_qout(q, k, v, scale: Optional[float] = None,
                         interpret: bool = False, norm_w=None,
                         eps: float = 1e-6):
    """Dense cross-attention (one K/V tile: 512 text tokens) fused with the
    per-token INT8 quantization of the O-projection input.

    q: (B, Lq, H, Dh) pre-normed planes — or, with norm_w (H*Dh,) given,
    the RAW (B, Lq, H*Dh) q-projection output: the full-dim RMSNorm and
    the head unfold then run inside the kernel (no standalone norm pass,
    no planes transpose — ~400 MB of HBM traffic per layer-call at the
    1.3B headline geometry). k, v: (B, Lk, H, Dh). Returns
    (int8 (B, Lq, H*Dh), fp32 scales (B, Lq, 1)) for int8_linear_prequant.
    Scales are per token across ALL heads — identical numerics to
    quantize_rows_int8 on the unfolded output."""
    fused_norm = norm_w is not None
    if fused_norm:
        B, Lq, HD = q.shape
        H, Dh = k.shape[2], k.shape[3]
        assert H * Dh == HD, (q.shape, k.shape)
    else:
        B, Lq, H, Dh = q.shape
    Lk = k.shape[1]
    scale = Dh ** -0.5 if scale is None else float(scale)
    if H * Dh > 2048:
        # wide models (Wan 14B: 5120; LTX-2: 4096): head-grouped grid
        # variant — the narrow kernel's H-unrolled temps exceed the Mosaic
        # kernel stack (raw-rows + in-kernel norm, or pre-normed planes)
        return _cross_attention_qout_wide(q, k, v, norm_w, scale, eps,
                                          interpret)
    Lkp = _cdiv(Lk, 128) * 128
    BQ = min(256, _cdiv(Lq, 128) * 128)
    nQ = _cdiv(Lq, BQ)
    Lp = nQ * BQ

    def fold(x, lp):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], Dh)
        return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))

    kf, vf = fold(k, Lkp), fold(v, Lkp)
    if fused_norm:
        # no host-side pad: Pallas masks the partial last tile, and padding
        # 32760 -> 32768 rows would copy the full 100 MB q plane (the r5
        # profile's 19 ms of `pad`). Garbage tail rows produce garbage
        # output rows that the (B, Lq, ·) out_shape never materializes.
        qf = q
        Lo = Lq
        q_spec = pl.BlockSpec((1, BQ, H * Dh), lambda b, i: (b, i, 0))
        extra_in = [norm_w.reshape(1, H * Dh).astype(q.dtype)]
        extra_specs = [pl.BlockSpec((1, H * Dh), lambda b, i: (0, 0))]
    else:
        qf = fold(q, Lp)
        Lo = Lp
        q_spec = pl.BlockSpec((H, BQ, Dh), lambda b, i: (b, i, 0))
        extra_in, extra_specs = [], []
    i8, sc = pl.pallas_call(
        functools.partial(_cross_attn_qout_kernel, scale=scale, kv_len=Lk,
                          H=H, Dh=Dh, eps=eps, fused_norm=fused_norm),
        grid=(B, nQ),
        in_specs=[q_spec] + extra_specs + [
            pl.BlockSpec((H, Lkp, Dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((H, Lkp, Dh), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, BQ, H * Dh), lambda b, i: (b, i, 0)),
                   pl.BlockSpec((1, BQ, 1), lambda b, i: (b, i, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, Lo, H * Dh), jnp.int8),
                   jax.ShapeDtypeStruct((B, Lo, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((H, BQ, Dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(qf, *extra_in, kf, vf)
    return i8[:, :Lq], sc[:, :Lq]


def _lut_ring(lut3):
    """Ring-DMA layout for per-row LUT fetches. lut3: (BH, R, W) int32, W a
    multiple of 128. Mosaic only accepts a (1, 1, W) slice of a tiled memref
    when W fits one (8, 128) lane tile — at W > 128 the dim-1 slice of 1 row
    trips 'must be aligned to tiling (8)' (hit at the 81f training geometry,
    where the dk/dv inverse LUT is 1+nQ = 129 -> 256 lanes). Wider rows are
    reshaped to (BH, R, W/128, 128) so the per-row DMA slices leading dims
    only. Returns (array, smem_row_shape); scratch is SMEM((2, *row_shape))
    and entries are read back via _row_get."""
    BH, R, W = lut3.shape
    if W <= 128:
        return lut3, (W,)
    assert W % 128 == 0, W
    return lut3.reshape(BH, R, W // 128, 128), (W // 128, 128)


def _row_get(ref, idx):
    """Entry idx of one LUT row staged by _lut_ring: (W,) or (W/128, 128)."""
    if len(ref.shape) == 1:
        return ref[idx]
    if isinstance(idx, int):
        return ref[idx // 128, idx % 128]
    return ref[idx // 128, jax.lax.rem(idx, 128)]


def _sparse_attn_kernel(lut_hbm, q_ref, k_hbm, v_hbm, o_ref,
                        kbuf, vbuf, sems, lut2_ref, lut_sem, acc_scr,
                        *, scale: float, block_k: int, kv_len: int,
                        int8_qk: bool, sel: int):
    """Block-sparse flash attention with a grouped, pipelined K/V gather.

    Grid: (BH, nQ). K/V and the LUT stay in HBM; only this Q-block's LUT row
    (a few dozen ints) is DMA'd into SMEM — prefetching the full LUT overflows
    the 1MB SMEM at real model scale.

    Selection granularity stays at block_k (128) for parity with the
    reference's block map, but each inner iteration gathers GROUP selected
    blocks into one contiguous VMEM tile and runs a single
    (block_q x GROUP*block_k) MXU pass — small per-block tiles were
    MXU-pipeline/loop-overhead bound. Tiles stream through an NBUF-slot ring.
    """
    NBUF, tile_k, _ = kbuf.shape
    group = tile_k // block_k
    n_groups = _cdiv(sel, group)
    bh, i = pl.program_id(0), pl.program_id(1)

    # LUT row double-buffering across grid steps: slot (bh*nQ+i) % 2 holds
    # this step's row. The first grid step fetches its own row; every step
    # prefetches the next step's row, taking the ~1-2us LUT DMA off the
    # critical path of the remaining ~3000 grid steps.
    nQ = pl.num_programs(1)
    step = bh * nQ + i
    slot_now = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _first_lut():
        pltpu.make_async_copy(lut_hbm.at[0, 0], lut2_ref.at[0],
                              lut_sem.at[0]).start()

    @pl.when(step + 1 < pl.num_programs(0) * nQ)
    def _next_lut():
        nxt = step + 1
        pltpu.make_async_copy(lut_hbm.at[nxt // nQ, jax.lax.rem(nxt, nQ)],
                              lut2_ref.at[1 - slot_now],
                              lut_sem.at[1 - slot_now]).start()

    pltpu.make_async_copy(lut_hbm.at[bh, i], lut2_ref.at[slot_now],
                          lut_sem.at[slot_now]).wait()
    lut_ref = lut2_ref.at[slot_now]

    def kv_dmas(slot, g):
        """G copies per tensor, one per selected block in group g. Padded
        LUT entries re-fetch a valid block; their scores are masked out."""
        ds = []
        for t in range(group):
            kb = _row_get(lut_ref, g * group + t)
            start = pl.multiple_of(kb * block_k, block_k)
            ds.append(pltpu.make_async_copy(
                k_hbm.at[bh, pl.ds(start, block_k)],
                kbuf.at[slot, pl.ds(t * block_k, block_k)],
                sems.at[0, slot]))
            ds.append(pltpu.make_async_copy(
                v_hbm.at[bh, pl.ds(start, block_k)],
                vbuf.at[slot, pl.ds(t * block_k, block_k)],
                sems.at[1, slot]))
        return ds

    for gg in range(NBUF - 1):
        @pl.when(gg < n_groups)
        def _start(gg=gg):
            for d in kv_dmas(gg, gg):
                d.start()

    m = jnp.full((q_ref.shape[1], 1), NEG_INF, jnp.float32)
    l = jnp.zeros((q_ref.shape[1], 1), jnp.float32)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    q = q_ref[0]

    if int8_qk:
        qf = q.astype(jnp.float32)
        q_amax = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-6)
        qq = jnp.round(qf * (127.0 / q_amax)).astype(jnp.int8)
    else:
        qq, q_amax = q, None

    def body(g, carry):
        m, l = carry
        slot = jax.lax.rem(g, NBUF)

        @pl.when(g + NBUF - 1 < n_groups)
        def _prefetch():
            for d in kv_dmas(jax.lax.rem(g + NBUF - 1, NBUF), g + NBUF - 1):
                d.start()

        for d in kv_dmas(slot, g):
            d.wait()
        k = kbuf[slot]                                   # (tile_k, D)
        v = vbuf[slot]

        if int8_qk:
            kf = k.astype(jnp.float32)
            k_amax = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1, keepdims=True),
                                 1e-6)
            kq = jnp.round(kf * (127.0 / k_amax)).astype(jnp.int8)
            s32 = jax.lax.dot_general(qq, kq, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            s = s32.astype(jnp.float32) * (q_amax / 127.0) * \
                (k_amax.T / 127.0) * scale
        else:
            s = jax.lax.dot_general(qq, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale

        # Mask: real KV range AND real (non-padded) LUT entries.
        within = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        t_idx = within // block_k                        # sub-block index
        col_parts = [_row_get(lut_ref, g * group + t) * block_k
                     for t in range(group)]
        kb_row = jnp.concatenate(
            [jnp.full((1, block_k), cp, jnp.int32) for cp in col_parts],
            axis=1)                                      # (1, tile_k)
        col = kb_row + (within % block_k)
        entry = g * group + t_idx
        s = jnp.where((col < kv_len) & (entry < sel), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new

    m, l = jax.lax.fori_loop(0, n_groups, body, (m, l))
    o_ref[0] = (acc_scr[...] / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def _sparse_attn_kernel_i8(lut_hbm, q_ref, qs_ref, kv_hbm, scb_hbm, vch_ref,
                           o_ref, kvbuf, scbuf, sems, lut2_ref, lut_sem,
                           acc_scr, *, block_k: int, sel: int,
                           v_per_channel: bool = False):
    """SageSLA-style INT8 block-sparse attention — VPU-minimal edition.

    Q/K/V are pre-quantized per row OUTSIDE the kernel (the reference
    quantizes K once per call too, SLA/core.py:211-229). K and V are PACKED
    along the feature dim into one (BH, L, 2D) int8 array so each selected
    block is one DMA descriptor. All per-row metadata — K scale, additive
    mask bias, V scale — lives in a (BH, nK+1, 8, block_k) array whose block
    rows are DMA-gathered alongside K/V into a lane-contiguous buffer, so the
    inner loop does NO lane-dynamic slicing and NO iota/compare masking:

      s = (s32 * qscale) * kscale + bias;  p = exp(s - m);  pv = p * vscale

    Sequence-tail rows and LUT padding are handled by a POISON BLOCK
    (index nK) whose kscale/vscale are 0 and bias is -1e30 — padded LUT
    entries point at it and their columns softmax to exactly zero. The
    softmax scale is pre-folded into the Q scales.
    """
    NBUF, tile_k, twoD = kvbuf.shape
    D = twoD // 2
    group = tile_k // block_k
    n_groups = _cdiv(sel, group)
    bh, i = pl.program_id(0), pl.program_id(1)

    # LUT row double-buffering across grid steps: slot (bh*nQ+i) % 2 holds
    # this step's row. The first grid step fetches its own row; every step
    # prefetches the next step's row, taking the ~1-2us LUT DMA off the
    # critical path of the remaining ~3000 grid steps.
    nQ = pl.num_programs(1)
    step = bh * nQ + i
    slot_now = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _first_lut():
        pltpu.make_async_copy(lut_hbm.at[0, 0], lut2_ref.at[0],
                              lut_sem.at[0]).start()

    @pl.when(step + 1 < pl.num_programs(0) * nQ)
    def _next_lut():
        nxt = step + 1
        pltpu.make_async_copy(lut_hbm.at[nxt // nQ, jax.lax.rem(nxt, nQ)],
                              lut2_ref.at[1 - slot_now],
                              lut_sem.at[1 - slot_now]).start()

    pltpu.make_async_copy(lut_hbm.at[bh, i], lut2_ref.at[slot_now],
                          lut_sem.at[slot_now]).wait()
    lut_ref = lut2_ref.at[slot_now]

    def kv_dmas(slot, g):
        ds = []
        for t in range(group):
            kb = _row_get(lut_ref, g * group + t)
            start = pl.multiple_of(kb * block_k, block_k)
            ds.append(pltpu.make_async_copy(
                kv_hbm.at[bh, pl.ds(start, block_k)],
                kvbuf.at[slot, pl.ds(t * block_k, block_k)],
                sems.at[0, slot]))
            # block kb's (8, block_k) scale/bias rows -> lane slot t
            ds.append(pltpu.make_async_copy(
                scb_hbm.at[bh, kb],
                scbuf.at[slot, :, pl.ds(t * block_k, block_k)],
                sems.at[1, slot]))
        return ds

    for gg in range(NBUF - 1):
        @pl.when(gg < n_groups)
        def _start(gg=gg):
            for d in kv_dmas(gg, gg):
                d.start()

    m = jnp.full((q_ref.shape[1], 1), NEG_INF, jnp.float32)
    l = jnp.zeros((q_ref.shape[1], 1), jnp.float32)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    qq = q_ref[0]                     # (BQ, D) int8
    qsc = qs_ref[0]                   # (BQ, 1) fp32 row scales (x softmax)

    def body(g, carry):
        m, l = carry
        slot = jax.lax.rem(g, NBUF)

        @pl.when(g + NBUF - 1 < n_groups)
        def _prefetch():
            for d in kv_dmas(jax.lax.rem(g + NBUF - 1, NBUF), g + NBUF - 1):
                d.start()

        for d in kv_dmas(slot, g):
            d.wait()
        k = kvbuf[slot, :, :D]        # (tile_k, D) int8
        v = kvbuf[slot, :, D:]        # (tile_k, D) int8
        ksc = scbuf[slot, 0:1, :]     # (1, tile_k) fp32
        bias = scbuf[slot, 1:2, :]    # (1, tile_k): 0 or -1e30
        vsc = scbuf[slot, 2:3, :]

        s32 = jax.lax.dot_general(qq, k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        s = (s32.astype(jnp.float32) * qsc) * ksc + bias

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        if v_per_channel:
            # per-channel V scales are K-row-invariant: fold once at the
            # finalize instead of into p (the FP8-V analog — reference sm90
            # quantizes V per channel, SLA/core.py:218-229)
            pv = p.astype(jnp.bfloat16)
        else:
            # fold V's per-row scale into p, then bf16 x bf16 MXU pass
            pv = (p * vsc).astype(jnp.bfloat16)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            pv, v.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return m_new, l_new

    m, l = jax.lax.fori_loop(0, n_groups, body, (m, l))
    o = acc_scr[...] / jnp.maximum(l, 1e-20)
    if v_per_channel:
        o = o * vch_ref[0]
    o_ref[0] = o.astype(o_ref.dtype)


def _sparse_attn_kernel_i8b(lut_hbm, q_ref, qs_ref, kv_hbm, ksc_ref,
                            vch_ref, o_ref, kvbuf, sems, lut2_ref, lut_sem,
                            acc_scr, *, block_k: int, sel: int, kv_len: int):
    """Block-scale INT8 sparse attention — the DMA-descriptor-minimal
    edition. vs _sparse_attn_kernel_i8: K is quantized per BLOCK (the
    SageAttention granularity, SLA/core.py:185-241) with its scales in an
    SMEM table read by block id, V per CHANNEL (the FP8-V analog) folded at
    the finalize — so the only gathered stream is the packed K|V int8
    itself: one DMA per selected block instead of two, and no (8, block_k)
    fp32 metadata buffers. Sequence-tail and padded-LUT masking is an
    iota/compare like the bf16 kernel (VPU-cheap next to the halved
    descriptor pressure)."""
    NBUF, tile_k, twoD = kvbuf.shape
    D = twoD // 2
    group = tile_k // block_k
    n_groups = _cdiv(sel, group)
    bh, i = pl.program_id(0), pl.program_id(1)

    nQ = pl.num_programs(1)
    step = bh * nQ + i
    slot_now = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _first_lut():
        pltpu.make_async_copy(lut_hbm.at[0, 0], lut2_ref.at[0],
                              lut_sem.at[0]).start()

    @pl.when(step + 1 < pl.num_programs(0) * nQ)
    def _next_lut():
        nxt = step + 1
        pltpu.make_async_copy(lut_hbm.at[nxt // nQ, jax.lax.rem(nxt, nQ)],
                              lut2_ref.at[1 - slot_now],
                              lut_sem.at[1 - slot_now]).start()

    pltpu.make_async_copy(lut_hbm.at[bh, i], lut2_ref.at[slot_now],
                          lut_sem.at[slot_now]).wait()
    lut_ref = lut2_ref.at[slot_now]

    def kv_dmas(slot, g):
        ds = []
        for t in range(group):
            kb = _row_get(lut_ref, g * group + t)
            start = pl.multiple_of(kb * block_k, block_k)
            ds.append(pltpu.make_async_copy(
                kv_hbm.at[bh, pl.ds(start, block_k)],
                kvbuf.at[slot, pl.ds(t * block_k, block_k)],
                sems.at[0, slot]))
        return ds

    for gg in range(NBUF - 1):
        @pl.when(gg < n_groups)
        def _start(gg=gg):
            for d in kv_dmas(gg, gg):
                d.start()

    m = jnp.full((q_ref.shape[1], 1), NEG_INF, jnp.float32)
    l = jnp.zeros((q_ref.shape[1], 1), jnp.float32)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    qq = q_ref[0]                     # (BQ, D) int8
    # row-major (1, 1, BQ) scale stripe -> (BQ, 1) broadcast shape
    # (softmax scale + log2e ride the K block-scale table, see the wrapper)
    qsc = qs_ref[0].reshape(qs_ref.shape[-1], 1)
    # (1, bk) within-block column iota, reused by every group's tail mask
    iota_bk = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)

    def body(g, carry):
        m, l = carry
        slot = jax.lax.rem(g, NBUF)

        @pl.when(g + NBUF - 1 < n_groups)
        def _prefetch():
            for d in kv_dmas(jax.lax.rem(g + NBUF - 1, NBUF), g + NBUF - 1):
                d.start()

        for d in kv_dmas(slot, g):
            d.wait()
        k = kvbuf[slot, :, :D]        # (tile_k, D) int8
        v = kvbuf[slot, :, D:]        # (tile_k, D) int8

        s32 = jax.lax.dot_general(qq, k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)

        # Per-sub-block K scale + 0/1 validity, both (1, tile_k) ROWS: the
        # masking is hoisted out of the (bq, tile_k) plane (this loop is
        # VPU-bound, ~12 full-plane ops/element; the old iota/rem/compare
        # select chain was 7 of them). Masked entries (padded LUT slots,
        # sequence tail — the tail rows of the last K block are
        # UNINITIALIZED int8 in the packed panel, so their scores can sit
        # arbitrarily far above the live maximum) are pushed to -1e9 in s
        # BEFORE the row max: a masked score that wins the max by >~126
        # log2 units would underflow every live probability and collapse
        # the row to ~0 (the 1e-20 clamp stops the NaN, not the collapse).
        # The -1e9 shift is exact — exp2(-1e9 - m) flushes to +0 — so the
        # old post-exp multiplicative zeroing is subsumed. Cost: one extra
        # full-plane FMA per group.
        sc_parts, mk_parts = [], []
        for t in range(group):
            kb = _row_get(lut_ref, g * group + t)
            sc_parts.append(jnp.full((1, block_k), ksc_ref[0, 0, kb],
                                     jnp.float32))
            live = jnp.logical_and(g * group + t < sel,
                                   iota_bk + kb * block_k < kv_len)
            mk_parts.append(live.astype(jnp.float32))
        krow = jnp.concatenate(sc_parts, axis=1)          # (1, tile_k)
        mrow = jnp.concatenate(mk_parts, axis=1)          # (1, tile_k) 0/1

        s = s32.astype(jnp.float32) * qsc * krow          # log2 domain
        s = s * mrow + (mrow - 1.0) * 1e9     # masked -> -1e9 (|s| << 1e9)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s - m_new)               # masked: exp2(~-1e9) == +0
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        # P stays bf16: int8 P (the sm90 trick) was A/B'd on-chip and LOSES
        # here — contracting over v's sublane dim at int8 pays a repack that
        # outweighs the 2x MXU rate (7.14 vs 6.52 ms/call at the headline
        # geometry, scripts_dev/probe_sparse_bottleneck.py).
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        return m_new, l_new

    m, l = jax.lax.fori_loop(0, n_groups, body, (m, l))
    o_ref[0] = ((acc_scr[...] / jnp.maximum(l, 1e-20)) * vch_ref[0]
                ).astype(o_ref.dtype)


def _sparse_attn_kernel_i8b_vt(lut_hbm, q_ref, qs_ref, k_hbm, vt_hbm,
                               ksc_ref, vch_ref, *rest,
                               block_k: int, sel: int, kv_len: int,
                               lin_inv=None):
    """Single-pass block-scale INT8 sparse attention over a TRANSPOSED V
    panel. vs _sparse_attn_kernel_i8b (the grouped online-softmax kernel):

    * the whole topk set (sel*block_k rows) is resident at once, so the
      softmax is one max/exp2/sum — no online rescale, no fori_loop carry;
    * V is gathered from a per-block (D, block_k) TRANSPOSED panel, so the
      P@V product contracts the LANE dim of both operands — the fast Mosaic
      MXU form. The (1,),(0,) sublane-contraction form was measured 1.4x
      slower at the headline geometry, and int8 P (the sm90 SageAttention2
      trick) loses to bf16 P in either form because the f32->int8 pack of
      the (bq, tile) P plane outweighs the 2x MXU rate
      (scripts_dev/probe_sparse_v2.py: 6.80 vs 7.30 ms/call);
    * the NEXT program's K/VT panels are issued right after this program's
      panels arrive (cross-program double buffer), hiding the gather under
      the current program's MXU/VPU work.

    Grid: (BH, nQ), iterated flat as step = bh*nQ + i; both dims must be
    "arbitrary" (the prefetch chain assumes strict order).

    lin_inv (static float): when set, the SLA linear branch's apply pass is
    fused into this kernel's epilogue — two extra inputs precede o_ref:
    kvw (1, D, D) f32 (proj_l-folded phi(k)^T v) and lsb (1, 2, D) f32
    (row 0: sum phi(k); row 1: proj_l bias). phi(q) is recovered from the
    int8 q via its row scale (qs carries scale*log2e — lin_inv undoes it);
    the resulting o += phi(q) kvw / (1e-5 + phi(q).ksum) + b deletes the
    standalone linear-apply pass AND the separate o + o_l add (a full
    read-read-write of both o planes).
    """
    if lin_inv is not None:
        kvw_ref, lsb_ref, o_ref, kbuf, vtbuf, sems, lut2_ref, lut_sem = rest
    else:
        o_ref, kbuf, vtbuf, sems, lut2_ref, lut_sem = rest
    D = kbuf.shape[-1]
    bh, i = pl.program_id(0), pl.program_id(1)
    nQ = pl.num_programs(1)
    total = pl.num_programs(0) * nQ
    step = bh * nQ + i
    slot = jax.lax.rem(step, 2)

    def kv_dmas(dst_slot, lut_slot, tgt_bh):
        # tgt_bh is the TARGET program's head index — issuing for step+1
        # across a bh boundary must read the next head's panels
        ds = []
        for t in range(sel):
            kb = _row_get(lut2_ref.at[lut_slot], t)
            start = pl.multiple_of(kb * block_k, block_k)
            ds.append(pltpu.make_async_copy(
                k_hbm.at[tgt_bh, pl.ds(start, block_k)],
                kbuf.at[dst_slot, pl.ds(t * block_k, block_k)],
                sems.at[0, dst_slot]))
            ds.append(pltpu.make_async_copy(
                vt_hbm.at[tgt_bh, kb],
                vtbuf.at[dst_slot, :, pl.ds(t * block_k, block_k)],
                sems.at[1, dst_slot]))
        return ds

    @pl.when(step == 0)
    def _boot():
        pltpu.make_async_copy(lut_hbm.at[0, 0], lut2_ref.at[0],
                              lut_sem.at[0]).start()
        if total > 1:
            pltpu.make_async_copy(lut_hbm.at[(1 // nQ), (1 % nQ)],
                                  lut2_ref.at[1], lut_sem.at[1]).start()
        pltpu.make_async_copy(lut_hbm.at[0, 0], lut2_ref.at[0],
                              lut_sem.at[0]).wait()
        for d in kv_dmas(0, 0, 0):
            d.start()

    # this program's panels (issued by the previous program, or by _boot)
    for t in range(sel):
        pltpu.make_async_copy(
            k_hbm.at[bh, pl.ds(0, block_k)],
            kbuf.at[slot, pl.ds(t * block_k, block_k)],
            sems.at[0, slot]).wait()
        pltpu.make_async_copy(
            vt_hbm.at[bh, 0],
            vtbuf.at[slot, :, pl.ds(0, block_k)],
            sems.at[1, slot]).wait()

    # scale/mask rows from this LUT slot, extracted BEFORE the step+2 LUT
    # prefetch can overwrite it (scalar core executes in program order)
    iota_bk = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    sc_parts, mk_parts = [], []
    for t in range(sel):
        kb = _row_get(lut2_ref.at[slot], t)
        sc_parts.append(jnp.full((1, block_k), ksc_ref[0, 0, kb],
                                 jnp.float32))
        mk_parts.append((iota_bk + kb * block_k < kv_len
                         ).astype(jnp.float32))
    krow = jnp.concatenate(sc_parts, axis=1)          # (1, sel*bk)
    mrow = jnp.concatenate(mk_parts, axis=1)          # (1, sel*bk) 0/1

    @pl.when(step + 1 < total)
    def _issue_next():
        nxt = step + 1
        pltpu.make_async_copy(lut_hbm.at[nxt // nQ, jax.lax.rem(nxt, nQ)],
                              lut2_ref.at[1 - slot],
                              lut_sem.at[1 - slot]).wait()
        for d in kv_dmas(1 - slot, 1 - slot, nxt // nQ):
            d.start()

    @pl.when(step + 2 < total)
    def _start_lut2():
        nx2 = step + 2
        pltpu.make_async_copy(lut_hbm.at[nx2 // nQ, jax.lax.rem(nx2, nQ)],
                              lut2_ref.at[slot], lut_sem.at[slot]).start()

    qq = q_ref[0]                    # (BQ, D) int8
    # qs block is a row-major (1, 1, BQ) stripe — transpose the 512 values
    # to the (BQ, 1) broadcast shape on-register (softmax scale + log2e
    # ride the K block-scale table, see the wrapper)
    qsc = qs_ref[0].reshape(qs_ref.shape[-1], 1)
    s32 = jax.lax.dot_general(qq, kbuf[slot], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * qsc * krow          # log2 domain
    # Sequence-tail rows of the last K block are uninitialized int8 in the
    # packed panel — push them to -1e9 BEFORE the max so a garbage score
    # can never win it and underflow the live rows (see the grouped
    # kernel's comment); exp2(-1e9 - m) == +0 subsumes the old post-exp
    # multiplicative zeroing.
    s = s * mrow + (mrow - 1.0) * 1e9
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(jnp.bfloat16),
                             vtbuf[slot].astype(jnp.bfloat16),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    out = (pv / jnp.maximum(l, 1e-20)) * vch_ref[0]
    if lin_inv is not None:
        qd = qq.astype(jnp.float32) * (qsc * lin_inv)    # raw roped/normed q
        mq = jnp.max(qd, axis=-1, keepdims=True)
        eq = jnp.exp(qd - mq)
        pq = eq / jnp.sum(eq, axis=-1, keepdims=True)    # phi(q), (BQ, D)
        num = jax.lax.dot(pq, kvw_ref[0],
                          preferred_element_type=jnp.float32)
        den = 1e-5 + jnp.sum(pq * lsb_ref[0, 0:1], axis=-1, keepdims=True)
        out = out + num / den + lsb_ref[0, 1:2]
    o_ref[0] = out.astype(o_ref.dtype)


def sparse_attention_i8_vt(qi, qs, k_panel, vt_panel, k_block_scale,
                           v_channel_scale, lut, *,
                           scale: Optional[float] = None,
                           block_q: int = 256, block_k: int = 256,
                           kv_len: Optional[int] = None,
                           lin_kvw=None, lin_ks_bias=None,
                           interpret: bool = False):
    """Block-sparse SageSLA attention — single-pass VT edition.

    qi: (B, H, Lp, D) int8; qs: (B, H, Lp, 1) fp32 row scales;
    k_panel: (B, H, Lkp, D) int8, per-BLOCK quantized (smooth-k applied);
    vt_panel: (B, H, nK, D, block_k) int8 per-block TRANSPOSED V, per-channel
    quantized; k_block_scale: (B, H, nK) fp32; v_channel_scale: (B, H, 1, D).
    lut: (B, H, nQr, sel) int32. Returns (B, H, Lp, D) bf16 planes.

    lin_kvw (B, H, D, D) f32 + lin_ks_bias (B, H, 2, D) f32 (row 0 ksum,
    row 1 proj_l bias): fuse the SLA linear-branch apply into the output
    epilogue (see the kernel docstring).

    See _sparse_attn_kernel_i8b_vt for the design; falls back on the caller
    to choose the grouped kernel when sel*block_k exceeds the resident-tile
    budget (ops/attention.py keeps that dispatch).
    """
    B, H, Lp, D = qi.shape
    Lkp = k_panel.shape[2]
    BH = B * H
    kv_len = Lkp if kv_len is None else kv_len
    scale = float(D ** -0.5) if scale is None else float(scale)
    nQ, nK = Lp // block_q, Lkp // block_k
    sel = lut.shape[-1]

    qi = qi.reshape(BH, Lp, D)
    # qs stays RAW: a host-side qs * const materializes a (BH, Lp, 1) f32
    # plane whose unit lane dim is tile-padded 128x — ~200 MB of HBM
    # traffic per step at the headline geometry (18 ms/step measured, the
    # r5 profile's multiply_bitcast_fusion). The softmax scale and log2e
    # ride the (BH, 1, nK) K block-scale SMEM table instead — 512 bytes.
    # Row-major (B, H, Lp) [head_planes' native layout] is used as-is;
    # legacy (B, H, Lp, 1) callers are squeezed.
    qs = _row_scales(qs, BH, Lp)
    kp = k_panel.reshape(BH, Lkp, D)
    vtp = vt_panel.reshape(BH, nK, D, block_k)
    ksc = (k_block_scale.reshape(BH, 1, nK).astype(jnp.float32)
           * (scale * LOG2E))
    vch = v_channel_scale.reshape(BH, 1, D).astype(jnp.float32)

    lut_flat = lut.reshape(BH, lut.shape[-2], sel).astype(jnp.int32)
    if lut_flat.shape[1] < nQ:
        lut_flat = jnp.pad(lut_flat,
                           ((0, 0), (0, nQ - lut_flat.shape[1]), (0, 0)))
    sel_pad = _cdiv(sel, 128) * 128
    lut_flat = jnp.pad(lut_flat, ((0, 0), (0, 0), (0, sel_pad - sel)))
    lut_flat, lut_row = _lut_ring(lut_flat)

    lin = lin_kvw is not None
    # qs is raw (see above), so phi(q) recovery in the epilogue needs no
    # un-scaling; lin_inv stays as the epilogue-enable flag
    lin_inv = 1.0 if lin else None
    kernel = functools.partial(_sparse_attn_kernel_i8b_vt,
                               block_k=block_k, sel=sel, kv_len=kv_len,
                               lin_inv=lin_inv)
    q_spec = pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),              # LUT
        q_spec,
        pl.BlockSpec((1, 1, block_q), lambda bh, i: (bh, 0, i)),
        pl.BlockSpec(memory_space=pl.ANY),              # K panel (HBM)
        pl.BlockSpec(memory_space=pl.ANY),              # VT panel (HBM)
        pl.BlockSpec((1, 1, nK), lambda bh, i: (bh, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0)),
    ]
    ins = [lut_flat, qi, qs, kp, vtp, ksc, vch]
    if lin:
        in_specs += [pl.BlockSpec((1, D, D), lambda bh, i: (bh, 0, 0)),
                     pl.BlockSpec((1, 2, D), lambda bh, i: (bh, 0, 0))]
        ins += [lin_kvw.reshape(BH, D, D).astype(jnp.float32),
                lin_ks_bias.reshape(BH, 2, D).astype(jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=(BH, nQ),
        in_specs=in_specs,
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Lp, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, sel * block_k, D), jnp.int8),    # K slots
            pltpu.VMEM((2, D, sel * block_k), jnp.int8),    # VT slots
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SMEM((2, *lut_row), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the resident (block_q, sel*block_k) f32 score plane at
            # block_q=512 / 720p sel=29 is ~15 MB — above the 16 MB default
            # scoped-vmem limit once temps are added; v5e has 128 MB VMEM
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    return out.reshape(B, H, Lp, D)


def _rowquant_i8(x, eps=1e-6):
    """Per-row symmetric int8 quant: (N, L, D) -> int8 values + fp32 scales
    (N, L, 1). The absmax and scaling stay in the input dtype (bf16) so no
    full-size fp32 copy is materialized; only the (N, L, 1) scales are f32."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    scale = jnp.maximum(amax, eps) / 127.0
    inv = (1.0 / scale).astype(x.dtype)
    xi = jnp.clip(jnp.round((x * inv).astype(jnp.float32)), -127, 127
                  ).astype(jnp.int8)
    return xi, scale


def quantize_v_per_channel(v_planes, kv_len: int, eps: float = 1e-8):
    """Per-(head, channel) symmetric INT8 quantization of V planes — the TPU
    analog of the reference's FP8 per-channel V on sm90 (transpose + pad +
    per-channel scale quant, SLA/core.py:218-229). Channel absmax is taken
    over the valid rows only; rows >= kv_len may be garbage (their scores
    are poison-masked in the kernel, so their int8 values never matter).

    v_planes: (B, H, Lp, D) -> (int8 (B, H, Lp, D), fp32 scales (B, H, 1, D)).
    """
    vf = v_planes.astype(jnp.float32)
    valid = (jnp.arange(v_planes.shape[2]) < kv_len)[None, None, :, None]
    amax = jnp.max(jnp.where(valid, jnp.abs(vf), 0.0), axis=2, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    vi = jnp.clip(jnp.round(vf / scale), -127, 127).astype(jnp.int8)
    return vi, scale


def _flash_fwd_impl(q, k, v, lut, *, scale, block_q, block_k, int8_qk,
                    interpret, v_quant="row"):
    B, L, H, D = q.shape
    Lk = k.shape[1]
    # Dense traversal uses large tiles to amortize per-grid-step overhead
    # (clamped to the actual padded lengths — e.g. 512-token cross-attention
    # must not pad K to a 1024 tile); sparse tiles must match the block-map
    # granularity.
    if lut is None:
        block_q = min(max(block_q, 512), _cdiv(L, 128) * 128)
        block_k = min(max(block_k, 1024), _cdiv(Lk, 128) * 128)
    nQ = _cdiv(L, block_q)
    nK = _cdiv(Lk, block_k)
    Lp, Lkp = nQ * block_q, nK * block_k
    # The sparse kernels' manual DMA slices must be 128-lane aligned; pad the
    # head dim with zeros (no-op at D=128; LTX audio heads are D=64). Zero
    # features don't change q·k or the value rows picked up by softmax.
    Dp = _cdiv(D, 128) * 128 if lut is not None else D

    def fold(x, lp):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, Dp - D)))

    qf, kf, vf = fold(q, Lp), fold(k, Lkp), fold(v, Lkp)
    out_shape = jax.ShapeDtypeStruct((B * H, Lp, D), q.dtype)

    if lut is None and nK == 1 and not int8_qk:
        # cross-attention shape: all K/V in one tile. Large Q blocks
        # amortize per-grid-step overhead (measured 1.78 -> ~0.6 ms/layer
        # at 480p vs the generic flash kernel).
        block_q = min(2048, Lp)
        while Lp % block_q:
            block_q //= 2
        nQ = Lp // block_q
        q_spec1 = pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0))
        kv_spec1 = pl.BlockSpec((1, block_k, D), lambda bh, i: (bh, 0, 0))
        out = pl.pallas_call(
            functools.partial(_attn_kernel_onepass, scale=scale, kv_len=Lk),
            grid=(B * H, nQ),
            in_specs=[q_spec1, kv_spec1, kv_spec1],
            out_specs=q_spec1,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(qf, kf, vf)
    elif lut is None:
        def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
            _attn_kernel(None, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr,
                         acc_scr, scale=scale, block_k=block_k, kv_len=Lk,
                         int8_qk=int8_qk)

        q_spec = pl.BlockSpec((1, block_q, D), lambda bh, i, j: (bh, i, 0))
        kv_spec = pl.BlockSpec((1, block_k, D), lambda bh, i, j: (bh, j, 0))
        out = pl.pallas_call(
            kernel,
            grid=(B * H, nQ, nK),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),  # m
                pltpu.VMEM((block_q, 128), jnp.float32),  # l
                pltpu.VMEM((block_q, D), jnp.float32),    # acc
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(qf, kf, vf)
    else:
        sel = lut.shape[-1]
        NBUF = _nbuf()       # K/V tile ring depth
        GROUP = _pick_group(sel)
        n_groups = _cdiv(sel, GROUP)
        # Pad LUT entries to a full last group. In the int8 path padded
        # entries point at the POISON block (index nK, zero K/V, -inf bias);
        # the bf16 path masks them by entry index and re-fetches a real
        # block. Then pad the lane dim to the 128 tiling so HBM row slices
        # are aligned.
        lut_flat = lut.reshape(B * H, nQ, sel).astype(jnp.int32)
        entry_pad = n_groups * GROUP - sel
        pad_block = nK if int8_qk else max(nK - 1, 0)
        if entry_pad:
            lut_flat = jnp.pad(lut_flat, ((0, 0), (0, 0), (0, entry_pad)),
                               constant_values=pad_block)
        sel_pad = _cdiv(n_groups * GROUP, 128) * 128
        lut_flat = jnp.pad(
            lut_flat, ((0, 0), (0, 0), (0, sel_pad - n_groups * GROUP)))
        lut_flat, lut_row = _lut_ring(lut_flat)

        out_shape = jax.ShapeDtypeStruct((B * H, Lp, Dp), q.dtype)
        common_scratch = [
            pltpu.SemaphoreType.DMA((2, NBUF)),
            pltpu.SMEM((2, *lut_row), jnp.int32),      # LUT row ring
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((block_q, Dp), jnp.float32),    # acc
        ]
        cp = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
        q_spec2 = pl.BlockSpec((1, block_q, Dp), lambda bh, i: (bh, i, 0))
        any_spec = pl.BlockSpec(memory_space=pl.ANY)

        if int8_qk and min(block_q, block_k) < 128:
            # parity-granularity mode (reference SLA kernels select at
            # 64-row K-blocks, SLA/kernel.py:247-248; sm90 Sage Q64/K128,
            # core.py:185-189): the packed-metadata kernel needs 128-lane
            # block slices, so sub-128 blocks run the gather kernel with
            # in-kernel per-block INT8 quantization instead.
            def kernel(lut_hbm, q_ref, k_hbm, v_hbm, o_ref,
                       kbuf, vbuf, sems, lut_ref, lut_sem, acc_scr):
                _sparse_attn_kernel(lut_hbm, q_ref, k_hbm, v_hbm, o_ref,
                                    kbuf, vbuf, sems, lut_ref, lut_sem,
                                    acc_scr, scale=scale, block_k=block_k,
                                    kv_len=Lk, int8_qk=True, sel=sel)

            out = pl.pallas_call(
                kernel,
                grid=(B * H, nQ),
                in_specs=[any_spec, q_spec2, any_spec, any_spec],
                out_specs=q_spec2,
                out_shape=out_shape,
                scratch_shapes=[
                    pltpu.VMEM((NBUF, GROUP * block_k, Dp), k.dtype),
                    pltpu.VMEM((NBUF, GROUP * block_k, Dp), v.dtype),
                ] + common_scratch,
                compiler_params=cp,
                interpret=interpret,
            )(lut_flat, qf, kf, vf)
        elif int8_qk:
            if interpret or jax.default_backend() != "tpu":
                qi, qs = _rowquant_i8(qf)              # (BH, Lp, D), (BH, Lp, 1)
                ki, ks = _rowquant_i8(kf)
            else:
                from turbodiffusion_tpu.ops.quant import (
                    quantize_rows_int8_pallas)
                def rq(x):
                    xq, xs = quantize_rows_int8_pallas(
                        x.reshape(-1, x.shape[-1]))
                    return (xq.reshape(x.shape),
                            xs.reshape(*x.shape[:-1], 1))
                qi, qs = rq(qf)
                ki, ks = rq(kf)
            if v_quant == "channel":
                vi, vch = quantize_v_per_channel(
                    vf.reshape(B, H, Lkp, Dp), Lk)
                vi = vi.reshape(B * H, Lkp, Dp)
                vs, vcs = None, vch
            else:
                vi, vs = (_rowquant_i8(vf)
                          if interpret or jax.default_backend() != "tpu"
                          else rq(vf))
                vcs = None
            out = sparse_attention_i8_planes(
                qi.reshape(B, H, Lp, Dp), qs.reshape(B, H, Lp, 1),
                ki.reshape(B, H, Lkp, Dp), ks.reshape(B, H, Lkp, 1),
                vi.reshape(B, H, Lkp, Dp),
                (jnp.zeros((B, H, Lkp, 1), jnp.float32) if vs is None
                 else vs.reshape(B, H, Lkp, 1)),
                lut, scale=scale, block_q=block_q, block_k=block_k,
                kv_len=Lk, v_channel_scale=vcs, interpret=interpret)
            out = out.reshape(B * H, Lp, Dp)
        else:
            def kernel(lut_hbm, q_ref, k_hbm, v_hbm, o_ref,
                       kbuf, vbuf, sems, lut_ref, lut_sem, acc_scr):
                _sparse_attn_kernel(lut_hbm, q_ref, k_hbm, v_hbm, o_ref,
                                    kbuf, vbuf, sems, lut_ref, lut_sem,
                                    acc_scr, scale=scale, block_k=block_k,
                                    kv_len=Lk, int8_qk=False, sel=sel)

            out = pl.pallas_call(
                kernel,
                grid=(B * H, nQ),
                in_specs=[any_spec, q_spec2, any_spec, any_spec],
                out_specs=q_spec2,
                out_shape=out_shape,
                scratch_shapes=[
                    pltpu.VMEM((NBUF, GROUP * block_k, Dp), k.dtype),
                    pltpu.VMEM((NBUF, GROUP * block_k, Dp), v.dtype),
                ] + common_scratch,
                compiler_params=cp,
                interpret=interpret,
            )(lut_flat, qf, kf, vf)

    out = out[:, :L, :D].reshape(B, H, L, D)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                              "kv_len", "interpret"))
def sparse_attention_i8_planes(qi, qs, ki, ks, vi, vs, lut, *,
                               scale: Optional[float] = None,
                               block_q: int = 256, block_k: int = 256,
                               kv_len: Optional[int] = None,
                               v_channel_scale=None, kvi_packed=None,
                               k_block_scale=None,
                               interpret: bool = False):
    """Block-sparse SageSLA attention over pre-quantized head planes.

    qi/ki/vi: (B, H, Lp, D) int8 (Lp a block multiple); qs/ks/vs: (B, H, Lp, 1)
    fp32 row scales; lut: (B, H, nQ, sel) int32 selected K-block ids.
    Rows in [kv_len, Lp) may be garbage — they are masked by the poison-block
    bias. Returns (B, H, Lp, D) planes in bf16.

    v_channel_scale: optional (B, H, 1, D) fp32 — vi is per-CHANNEL
    quantized (vs ignored); the scale folds once into the finalize. This is
    the TPU analog of the reference's FP8 per-channel V on sm90
    (SLA/core.py:218-229): per-channel error is sequence-global, beating
    per-row at aggressive topk.

    k_block_scale: optional (B, H, nK) fp32 — ki/kvi_packed is per-BLOCK
    quantized (ks ignored; requires kvi_packed + v_channel_scale). Runs the
    descriptor-minimal kernel: scales ride an SMEM table instead of gathered
    metadata rows — one DMA per selected block instead of two.
    """
    B, H, Lp, D = qi.shape
    Lkp = (ki.shape[2] if kvi_packed is None
           else kvi_packed.shape[1] - block_k)
    BH = B * H
    kv_len = Lkp if kv_len is None else kv_len
    scale = float(D ** -0.5) if scale is None else float(scale)
    nQ, nK = Lp // block_q, Lkp // block_k
    sel = lut.shape[-1]
    NBUF = _nbuf()
    GROUP = _pick_group(sel)
    n_groups = _cdiv(sel, GROUP)

    qi = qi.reshape(BH, Lp, D)
    if k_block_scale is None:
        # fallback path: legacy (BH, Lp, 1) column scales, softmax scale
        # folded here; the blockscale path keeps qs row-major and folds
        # scale*log2e into the SMEM K table instead (see
        # sparse_attention_i8_vt's comment on the 128x lane-padding cost)
        if qs.ndim == 3:
            qs = qs[..., None]
        qs = qs.reshape(BH, Lp, 1) * scale
    else:
        qs = _row_scales(qs, BH, Lp)

    blockscale = k_block_scale is not None
    if blockscale:
        assert kvi_packed is not None and v_channel_scale is not None
    # LUT: pad Q-block rows out to the padded grid (all-poison rows produce
    # zero output rows, which are dropped), pad entries to full groups with
    # the POISON block id (nK; the blockscale kernel masks padded entries by
    # index and uses id 0 to avoid reading past the array), and pad the lane
    # dim to the 128 tiling for aligned SMEM row DMAs.
    pad_id = 0 if blockscale else nK
    lut_flat = lut.reshape(BH, lut.shape[-2], sel).astype(jnp.int32)
    if lut_flat.shape[1] < nQ:
        lut_flat = jnp.pad(lut_flat,
                           ((0, 0), (0, nQ - lut_flat.shape[1]), (0, 0)),
                           constant_values=pad_id)
    entry_pad = n_groups * GROUP - sel
    if entry_pad:
        lut_flat = jnp.pad(lut_flat, ((0, 0), (0, 0), (0, entry_pad)),
                           constant_values=pad_id)
    sel_pad = _cdiv(n_groups * GROUP, 128) * 128
    lut_flat = jnp.pad(lut_flat,
                       ((0, 0), (0, 0), (0, sel_pad - n_groups * GROUP)))
    lut_flat, lut_row = _lut_ring(lut_flat)

    if blockscale:
        kvi = kvi_packed
        vch = v_channel_scale.reshape(BH, 1, D).astype(jnp.float32)
        # (BH, 1, nKb): SMEM blocks obey the same last-two-dims tiling rule
        # (block dim == array dim), so keep a unit middle axis. softmax
        # scale + log2e (the kernel runs exp2) fold here, not into qs.
        ksc = (k_block_scale.reshape(BH, 1, -1).astype(jnp.float32)
               * (scale * LOG2E))

        def kernel(lut_hbm, q_ref, qs_ref, kv_hbm, ksc_ref, vch_ref, o_ref,
                   kvbuf, sems, lut_ref, lut_sem, acc_scr):
            _sparse_attn_kernel_i8b(
                lut_hbm, q_ref, qs_ref, kv_hbm, ksc_ref, vch_ref, o_ref,
                kvbuf, sems, lut_ref, lut_sem, acc_scr,
                block_k=block_k, sel=sel, kv_len=kv_len)

        q_spec = pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0))
        out = pl.pallas_call(
            kernel,
            grid=(BH, nQ),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),              # LUT
                q_spec,
                pl.BlockSpec((1, 1, block_q), lambda bh, i: (bh, 0, i)),
                pl.BlockSpec(memory_space=pl.ANY),              # K|V (HBM)
                pl.BlockSpec((1, 1, ksc.shape[2]),
                             lambda bh, i: (bh, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0)),
            ],
            out_specs=q_spec,
            out_shape=jax.ShapeDtypeStruct((BH, Lp, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((NBUF, GROUP * block_k, 2 * D), jnp.int8),
                pltpu.SemaphoreType.DMA((2, NBUF)),
                pltpu.SMEM((2, *lut_row), jnp.int32),           # LUT ring
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((block_q, D), jnp.float32),          # acc
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(lut_flat, qi, qs, kvi, ksc, vch)
        return out.reshape(B, H, Lp, D)

    # pack K|V along features (one DMA descriptor per gathered block) and
    # append the poison block. Its K/V contents never reach a live score
    # (bias -1e30 -> p = 0), so a producer kernel may emit the packed
    # layout directly with the poison rows unwritten (subquant_pack_kv).
    if kvi_packed is not None:
        kvi = kvi_packed
    else:
        ki = ki.reshape(BH, Lkp, D)
        vi = vi.reshape(BH, Lkp, D)
        kvi = jnp.concatenate([ki, vi], axis=-1)    # (BH, Lkp, 2D) int8
        kvi = jnp.pad(kvi, ((0, 0), (0, block_k), (0, 0)))
    # per-block metadata rows (8, block_k): 0=K scale, 1=additive bias
    # (0 real / -1e30 pad), 2=V scale, 3-7 zero padding for the fp32 tile
    nKp = nK + 1
    valid = jnp.arange(nKp * block_k) < kv_len
    def blockify(s):                                # (B, H, Lkp, 1) scales
        s = jnp.pad(s.reshape(BH, Lkp), ((0, 0), (0, block_k)))
        return jnp.where(valid[None], s, 0.0).reshape(BH, nKp, block_k)
    bias_rows = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32
                                                      ).reshape(1, nKp, block_k)
    v_per_channel = v_channel_scale is not None
    scb = jnp.stack([
        blockify(ks),
        jnp.broadcast_to(bias_rows, (BH, nKp, block_k)),
        (jnp.zeros((BH, nKp, block_k), jnp.float32) if v_per_channel
         else blockify(vs)),
    ], axis=2)                                      # (BH, nKp, 3, bk)
    scb = jnp.pad(scb, ((0, 0), (0, 0), (0, 5), (0, 0)))
    vch = (v_channel_scale.reshape(BH, 1, D).astype(jnp.float32)
           if v_per_channel
           else jnp.zeros((BH, 1, D), jnp.float32))

    def kernel(lut_hbm, q_ref, qs_ref, kv_hbm, scb_hbm, vch_ref, o_ref,
               kvbuf, scbuf, sems, lut_ref, lut_sem, acc_scr):
        _sparse_attn_kernel_i8(
            lut_hbm, q_ref, qs_ref, kv_hbm, scb_hbm, vch_ref, o_ref,
            kvbuf, scbuf, sems, lut_ref, lut_sem, acc_scr,
            block_k=block_k, sel=sel, v_per_channel=v_per_channel)

    q_spec = pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out = pl.pallas_call(
        kernel,
        grid=(BH, nQ),
        in_specs=[
            any_spec,                                       # LUT
            q_spec,                                         # q int8
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0)),
            any_spec,                                       # K|V int8 (HBM)
            any_spec,                                       # scale/bias blocks
            pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Lp, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((NBUF, GROUP * block_k, 2 * D), jnp.int8),
            pltpu.VMEM((NBUF, 8, GROUP * block_k), jnp.float32),
            pltpu.SemaphoreType.DMA((2, NBUF)),
            pltpu.SMEM((2, *lut_row), jnp.int32),           # LUT row ring
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((block_q, D), jnp.float32),          # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(lut_flat, qi, qs, kvi, scb, vch)
    return out.reshape(B, H, Lp, D)


# ---------------------------------------------------------------------------
# Fused Pallas backward (sparse)
# ---------------------------------------------------------------------------

def _nbuf(default: int = 4) -> int:
    """K/V gather ring depth; TDX_SPARSE_NBUF overrides for on-chip sweeps."""
    import os
    return int(os.environ.get("TDX_SPARSE_NBUF", default))


def _pick_group(sel: int, lo: int = 4, hi: int = 8) -> int:
    """Gather GROUP blocks per MXU pass. Padded entries re-fetch real blocks
    (masked but not free), so pick the GROUP in [lo, hi] that minimizes
    ceil(sel/G)*G - sel, preferring larger tiles on ties."""
    import os
    lo = int(os.environ.get("TDX_SPARSE_GROUP_LO", lo))
    hi = int(os.environ.get("TDX_SPARSE_GROUP_HI", hi))
    group = min(hi, sel)
    best_waste = _cdiv(sel, group) * group - sel
    for g in range(hi, lo - 1, -1):
        if g > sel:
            continue
        waste = _cdiv(sel, g) * g - sel
        if waste < best_waste:
            group, best_waste = g, waste
    return group


def _sparse_bwd_dq_kernel(lut_hbm, q_ref, do_ref, kv_hbm,
                          dq_ref, ld_ref,
                          kvbuf, sems, lut2_ref, lut_sem,
                          acc1_scr, acc2_scr,
                          *, scale: float, block_k: int, kv_len: int,
                          sel: int):
    """dq pass of the block-sparse backward. Grid: (BH, nQ).

    Walks exactly the forward's gather (same LUT rows, same K/V tiles) and
    maintains three online-softmax accumulators:
        acc1 = sum_j exp(s - m) * dp @ k_j        (bq, D)
        acc2 = sum_j exp(s - m) @ k_j             (bq, D)
        acc3 = rowsum(exp(s - m) * dp)            (bq, 1)
    With delta = acc3 / l (the per-row sum P*dp), the chain rule
    dq = scale * sum_j P * (dp - delta) @ k_j factors into
    dq = scale * (acc1 - delta * acc2) / l — so delta never needs the saved
    forward output. Emits (lse, delta) per row for the dk/dv pass.

    K and V ride PACKED along features in one (BH, Lkp, 2D) array so each
    gathered block is ONE DMA descriptor (the gather is descriptor-issue
    bound, like the int8 forward).
    """
    NBUF, tile_k, two_d = kvbuf.shape
    D = two_d // 2
    group = tile_k // block_k
    n_groups = _cdiv(sel, group)
    bh, i = pl.program_id(0), pl.program_id(1)

    nQ = pl.num_programs(1)
    step = bh * nQ + i
    slot_now = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _first_lut():
        pltpu.make_async_copy(lut_hbm.at[0, 0], lut2_ref.at[0],
                              lut_sem.at[0]).start()

    @pl.when(step + 1 < pl.num_programs(0) * nQ)
    def _next_lut():
        nxt = step + 1
        pltpu.make_async_copy(lut_hbm.at[nxt // nQ, jax.lax.rem(nxt, nQ)],
                              lut2_ref.at[1 - slot_now],
                              lut_sem.at[1 - slot_now]).start()

    pltpu.make_async_copy(lut_hbm.at[bh, i], lut2_ref.at[slot_now],
                          lut_sem.at[slot_now]).wait()
    lut_ref = lut2_ref.at[slot_now]

    def kv_dmas(slot, g):
        ds = []
        for t in range(group):
            kb = _row_get(lut_ref, g * group + t)
            start = pl.multiple_of(kb * block_k, block_k)
            ds.append(pltpu.make_async_copy(
                kv_hbm.at[bh, pl.ds(start, block_k)],
                kvbuf.at[slot, pl.ds(t * block_k, block_k)],
                sems.at[0, slot]))
        return ds

    for gg in range(NBUF - 1):
        @pl.when(gg < n_groups)
        def _start(gg=gg):
            for d in kv_dmas(gg, gg):
                d.start()

    bq = q_ref.shape[1]
    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    a3 = jnp.zeros((bq, 1), jnp.float32)
    acc1_scr[...] = jnp.zeros_like(acc1_scr)
    acc2_scr[...] = jnp.zeros_like(acc2_scr)
    q = q_ref[0]
    do = do_ref[0]

    def body(g, carry):
        m, l, a3 = carry
        slot = jax.lax.rem(g, NBUF)

        @pl.when(g + NBUF - 1 < n_groups)
        def _prefetch():
            for d in kv_dmas(jax.lax.rem(g + NBUF - 1, NBUF), g + NBUF - 1):
                d.start()

        for d in kv_dmas(slot, g):
            d.wait()
        k = kvbuf[slot, :, :D]                           # (tile_k, D)
        v = kvbuf[slot, :, D:]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        within = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        col_parts = [_row_get(lut_ref, g * group + t) * block_k
                     for t in range(group)]
        kb_row = jnp.concatenate(
            [jnp.full((1, block_k), cp, jnp.int32) for cp in col_parts],
            axis=1)
        col = kb_row + (within % block_k)
        entry = g * group + within // block_k
        s = jnp.where((col < kv_len) & (entry < sel), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)                            # (bq, tile_k)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        pdp = p * dp
        a3_new = alpha * a3 + jnp.sum(pdp, axis=-1, keepdims=True)
        acc1_scr[...] = acc1_scr[...] * alpha + jax.lax.dot(
            pdp.astype(k.dtype), k, preferred_element_type=jnp.float32)
        acc2_scr[...] = acc2_scr[...] * alpha + jax.lax.dot(
            p.astype(k.dtype), k, preferred_element_type=jnp.float32)
        return m_new, l_new, a3_new

    m, l, a3 = jax.lax.fori_loop(0, n_groups, body, (m, l, a3))
    l = jnp.maximum(l, 1e-20)
    delta = a3 / l
    dq_ref[0] = (scale * (acc1_scr[...] - delta * acc2_scr[...]) / l
                 ).astype(dq_ref.dtype)
    ld_ref[0] = jnp.concatenate([m + jnp.log(l), delta], axis=-1)


def _sparse_bwd_dkv_kernel(inv_hbm, k_ref, v_ref, qdo_hbm, ld_ref,
                           dk_ref, dv_ref,
                           qdobuf, sems, row2_ref, row_sem,
                           dk_scr, dv_scr,
                           *, scale: float, block_q: int, q_len: int,
                           group: int):
    """dk/dv pass of the block-sparse backward. Grid: (BH, nK).

    Role-swapped mirror of the dq pass: each K block gathers the Q blocks
    that selected it (inverse LUT; row layout [count, q_ids..., pad]) along
    with their do rows and the (lse, delta) emitted by the dq pass, then
    accumulates
        dk_j = sum_i (P * (dp - delta))^T @ q_i * scale
        dv_j = sum_i P^T @ do_i
    as plain blocked writes — the inverse LUT removes the scatter-add the
    reference's Triton backward needs (SLA/kernel.py:142-176). P is exact
    (not online): exp(s - lse) with the saved row-wise lse. Q and dO ride
    packed in one (BH, Lp, 2D) array: one DMA descriptor per gathered block.
    """
    NBUF, tile_q, two_d = qdobuf.shape
    D = two_d // 2
    bh, j = pl.program_id(0), pl.program_id(1)

    nK = pl.num_programs(1)
    step = bh * nK + j
    slot_now = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _first_row():
        pltpu.make_async_copy(inv_hbm.at[0, 0], row2_ref.at[0],
                              row_sem.at[0]).start()

    @pl.when(step + 1 < pl.num_programs(0) * nK)
    def _next_row():
        nxt = step + 1
        pltpu.make_async_copy(inv_hbm.at[nxt // nK, jax.lax.rem(nxt, nK)],
                              row2_ref.at[1 - slot_now],
                              row_sem.at[1 - slot_now]).start()

    pltpu.make_async_copy(inv_hbm.at[bh, j], row2_ref.at[slot_now],
                          row_sem.at[slot_now]).wait()
    row_ref = row2_ref.at[slot_now]

    count = _row_get(row_ref, 0)
    n_groups = jax.lax.div(count + (group - 1), group)

    def q_dmas(slot, g):
        ds = []
        for t in range(group):
            qb = _row_get(row_ref, 1 + g * group + t)
            start = pl.multiple_of(qb * block_q, block_q)
            ds.append(pltpu.make_async_copy(
                qdo_hbm.at[bh, pl.ds(start, block_q)],
                qdobuf.at[slot, pl.ds(t * block_q, block_q)],
                sems.at[0, slot]))
        return ds

    for gg in range(NBUF - 1):
        @pl.when(gg < n_groups)
        def _start(gg=gg):
            for d in q_dmas(gg, gg):
                d.start()

    dk_scr[...] = jnp.zeros_like(dk_scr)
    dv_scr[...] = jnp.zeros_like(dv_scr)
    k = k_ref[0]                                          # (bk, D)
    v = v_ref[0]

    def body(g, carry):
        slot = jax.lax.rem(g, NBUF)

        @pl.when(g + NBUF - 1 < n_groups)
        def _prefetch():
            for d in q_dmas(jax.lax.rem(g + NBUF - 1, NBUF), g + NBUF - 1):
                d.start()

        for d in q_dmas(slot, g):
            d.wait()
        qt = qdobuf[slot, :, :D]                          # (tile_q, D)
        dot = qdobuf[slot, :, D:]

        sT = jax.lax.dot_general(k, qt, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale

        lse_parts, dl_parts, col_parts = [], [], []
        for t in range(group):
            qb = _row_get(row_ref, 1 + g * group + t)
            start = pl.multiple_of(qb * block_q, block_q)
            lse_parts.append(ld_ref[0, 0:1, pl.ds(start, block_q)])
            dl_parts.append(ld_ref[0, 1:2, pl.ds(start, block_q)])
            col_parts.append(jnp.full((1, block_q), qb * block_q, jnp.int32))
        lse_row = jnp.concatenate(lse_parts, axis=1)      # (1, tile_q)
        delta_row = jnp.concatenate(dl_parts, axis=1)
        qb_row = jnp.concatenate(col_parts, axis=1)

        within = jax.lax.broadcasted_iota(jnp.int32, sT.shape, 1)
        col = qb_row + (within % block_q)
        entry = g * group + within // block_q
        valid = (col < q_len) & (entry < count)
        pT = jnp.where(valid, jnp.exp(sT - lse_row), 0.0)  # (bk, tile_q)

        dpT = jax.lax.dot_general(v, dot, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dsT = pT * (dpT - delta_row) * scale
        dk_scr[...] += jax.lax.dot(dsT.astype(qt.dtype), qt,
                                   preferred_element_type=jnp.float32)
        dv_scr[...] += jax.lax.dot(pT.astype(dot.dtype), dot,
                                   preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, n_groups, body, 0)
    dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _inverse_lut(lut_f, nK: int):
    """Invert a (BH, nQ, sel) block LUT: for each K block, the list of Q
    blocks that selected it. Returns (BH, nK, 1 + nQ) int32 rows shaped
    [count, q_ids..., 0-pad] (width nQ = worst case: every Q block selects
    this K block; LUT entries are unique per row, so counts <= nQ)."""
    BH, nQ, sel = lut_f.shape
    N = nQ * sel
    fk = lut_f.reshape(BH, N).astype(jnp.int32)
    qid = jnp.broadcast_to((jnp.arange(N, dtype=jnp.int32) // sel)[None],
                           (BH, N))
    order = jnp.argsort(fk, axis=1, stable=True)
    sk = jnp.take_along_axis(fk, order, 1)
    sq = jnp.take_along_axis(qid, order, 1)
    seg_start = jax.vmap(
        lambda a: jnp.searchsorted(a, a, side="left"))(sk)
    pos = jnp.arange(N, dtype=jnp.int32)[None] - seg_start
    b_idx = jnp.arange(BH)[:, None]
    counts = jnp.zeros((BH, nK), jnp.int32).at[b_idx, fk].add(1)
    inv = jnp.zeros((BH, nK, nQ), jnp.int32).at[b_idx, sk, pos].set(
        sq, mode="drop")
    return jnp.concatenate([counts[:, :, None], inv], axis=-1)


def _flash_bwd_fused(q, k, v, lut, g, *, scale, block_q, block_k, interpret):
    """Fused Pallas backward for the block-sparse path: dq kernel (forward-
    shaped gather, emits lse/delta), then dk/dv kernel (inverse-LUT gather,
    blocked writes)."""
    B, L, H, D = q.shape
    Lk = k.shape[1]
    nQ = _cdiv(L, block_q)
    nK = _cdiv(Lk, block_k)
    Lp, Lkp = nQ * block_q, nK * block_k
    sel = lut.shape[-1]
    Dp = _cdiv(D, 128) * 128      # manual DMA slices need 128-lane alignment

    def fold(x, lp):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, Dp - D)))

    qf, kf, vf, gf = fold(q, Lp), fold(k, Lkp), fold(v, Lkp), fold(g, Lp)
    BH = B * H
    NBUF = _nbuf()

    # --- dq pass (same LUT padding as the forward) ---
    GROUP = _pick_group(sel)
    n_groups = _cdiv(sel, GROUP)
    lut_f = lut.reshape(BH, nQ, sel).astype(jnp.int32)
    entry_pad = n_groups * GROUP - sel
    lut_pad = lut_f
    if entry_pad:
        lut_pad = jnp.pad(lut_pad, ((0, 0), (0, 0), (0, entry_pad)),
                          constant_values=max(nK - 1, 0))
    sel_pad = _cdiv(n_groups * GROUP, 128) * 128
    lut_pad = jnp.pad(
        lut_pad, ((0, 0), (0, 0), (0, sel_pad - n_groups * GROUP)))
    lut_pad, lut_row = _lut_ring(lut_pad)

    q_spec = pl.BlockSpec((1, block_q, Dp), lambda bh, i: (bh, i, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    cp = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))

    kvf = jnp.concatenate([kf, vf], axis=-1)       # (BH, Lkp, 2Dp)

    def dq_kernel(lut_hbm, q_ref, do_ref, kv_hbm, dq_ref, ld_ref,
                  kvbuf, sems, lut2_ref, lut_sem, a1, a2):
        _sparse_bwd_dq_kernel(lut_hbm, q_ref, do_ref, kv_hbm,
                              dq_ref, ld_ref, kvbuf, sems, lut2_ref,
                              lut_sem, a1, a2, scale=scale, block_k=block_k,
                              kv_len=Lk, sel=sel)

    dq, ld = pl.pallas_call(
        dq_kernel,
        grid=(BH, nQ),
        in_specs=[any_spec, q_spec, q_spec, any_spec],
        out_specs=[q_spec,
                   pl.BlockSpec((1, block_q, 2), lambda bh, i: (bh, i, 0))],
        out_shape=[jax.ShapeDtypeStruct((BH, Lp, Dp), q.dtype),
                   jax.ShapeDtypeStruct((BH, Lp, 2), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((NBUF, GROUP * block_k, 2 * Dp), k.dtype),
            pltpu.SemaphoreType.DMA((2, NBUF)),
            pltpu.SMEM((2, *lut_row), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((block_q, Dp), jnp.float32),
            pltpu.VMEM((block_q, Dp), jnp.float32),
        ],
        compiler_params=cp,
        interpret=interpret,
    )(lut_pad, qf, gf, kvf)

    # --- dk/dv pass ---
    GROUPQ = _pick_group(max(sel * nQ // max(nK, 1), 1))  # ~avg row count
    inv = _inverse_lut(lut_f, nK)                          # (BH, nK, 1+nQ)
    Wp = _cdiv(inv.shape[-1], 128) * 128
    inv = jnp.pad(inv, ((0, 0), (0, 0), (0, Wp - inv.shape[-1])))
    inv, inv_row = _lut_ring(inv)
    ld_t = jnp.swapaxes(ld, 1, 2)                          # (BH, 2, Lp)

    k_spec = pl.BlockSpec((1, block_k, Dp), lambda bh, j: (bh, j, 0))

    qdof = jnp.concatenate([qf, gf], axis=-1)      # (BH, Lp, 2Dp)

    def dkv_kernel(inv_hbm, k_ref, v_ref, qdo_hbm, ld_ref,
                   dk_ref, dv_ref, qdobuf, sems, row2_ref, row_sem,
                   dk_scr, dv_scr):
        _sparse_bwd_dkv_kernel(inv_hbm, k_ref, v_ref, qdo_hbm, ld_ref,
                               dk_ref, dv_ref, qdobuf, sems, row2_ref,
                               row_sem, dk_scr, dv_scr, scale=scale,
                               block_q=block_q, q_len=L, group=GROUPQ)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(BH, nK),
        in_specs=[any_spec, k_spec, k_spec, any_spec,
                  pl.BlockSpec((1, 2, Lp), lambda bh, j: (bh, 0, 0))],
        out_specs=[k_spec, k_spec],
        out_shape=[jax.ShapeDtypeStruct((BH, Lkp, Dp), k.dtype),
                   jax.ShapeDtypeStruct((BH, Lkp, Dp), v.dtype)],
        scratch_shapes=[
            pltpu.VMEM((NBUF, GROUPQ * block_q, 2 * Dp), q.dtype),
            pltpu.SemaphoreType.DMA((2, NBUF)),
            pltpu.SMEM((2, *inv_row), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((block_k, Dp), jnp.float32),
            pltpu.VMEM((block_k, Dp), jnp.float32),
        ],
        compiler_params=cp,
        interpret=interpret,
    )(inv, kf, vf, qdof, ld_t)

    unfold = lambda x, ln: jnp.swapaxes(
        x[:, :, :D].reshape(B, H, -1, D)[:, :, :ln], 1, 2)
    return unfold(dq, L), unfold(dk, Lk), unfold(dv, Lk)


# ---------------------------------------------------------------------------
# Backward (gather/scatter jnp fallback + dense recompute reference)
# ---------------------------------------------------------------------------

def _attention_bwd_sparse(q, k, v, lut, g, scale, block_q, block_k):
    """Block-sparse attention VJP with O(L * topk * block_k) memory.

    Gathers each Q-block's selected K/V blocks (like the forward kernel),
    computes the local softmax backward, and scatter-adds dk/dv back through
    the LUT — never materializing the (L, Lk) score matrix, so SLA training
    fits at 32k-token sequences (semantics: SLA/kernel.py:86-237).
    Heads are processed under lax.map to bound the transient footprint.
    """
    B, L, H, D = q.shape
    Lk = k.shape[1]
    nQ = _cdiv(L, block_q)
    nK = _cdiv(Lk, block_k)
    Lp, Lkp = nQ * block_q, nK * block_k
    sel = lut.shape[-1]

    def fold(x, lp):
        # keep the storage dtype through the (large) gathers; compute
        # upcasts to f32 via preferred_element_type
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))

    qf, kf, vf, gf = fold(q, Lp), fold(k, Lkp), fold(v, Lkp), fold(g, Lp)
    lut_f = lut.reshape(B * H, nQ, sel)

    # masks, shared across heads
    colpad = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, sel * block_k), 2)
              % block_k)

    def per_head(args):
        qh, kh, vh, gh, luth = args            # (Lp,D),(Lkp,D),(Lkp,D),(Lp,D),(nQ,sel)
        qg = qh.reshape(nQ, block_q, D)
        dog = gh.reshape(nQ, block_q, D)
        kg = kh.reshape(nK, block_k, D)[luth]  # (nQ, sel, bk, D)
        vg = vh.reshape(nK, block_k, D)[luth]
        kg = kg.reshape(nQ, sel * block_k, D)
        vg = vg.reshape(nQ, sel * block_k, D)

        f32 = jnp.float32
        s = jnp.einsum("qbd,qkd->qbk", qg, kg,
                       preferred_element_type=f32) * scale
        col = (luth[:, :, None] * block_k +
               jnp.arange(block_k)[None, None, :]).reshape(nQ, 1, -1)
        s = jnp.where(col < Lk, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        dp = jnp.einsum("qbd,qkd->qbk", dog, vg, preferred_element_type=f32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(qg.dtype)
        pc = p.astype(qg.dtype)

        dq = jnp.einsum("qbk,qkd->qbd", ds, kg,
                        preferred_element_type=f32).reshape(Lp, D)
        dk_parts = jnp.einsum("qbk,qbd->qkd", ds, qg,
                              preferred_element_type=f32)  # (nQ, sel*bk, D)
        dv_parts = jnp.einsum("qbk,qbd->qkd", pc, dog,
                              preferred_element_type=f32)
        idx = col.reshape(-1)                           # (nQ*sel*bk,)
        dk = jnp.zeros((Lkp, D), jnp.float32).at[idx].add(
            dk_parts.reshape(-1, D), mode="drop")
        dv = jnp.zeros((Lkp, D), jnp.float32).at[idx].add(
            dv_parts.reshape(-1, D), mode="drop")
        return dq, dk, dv

    dq, dk, dv = jax.lax.map(per_head, (qf, kf, vf, gf, lut_f))
    unfold = lambda x, ln: jnp.swapaxes(
        x.reshape(B, H, -1, D)[:, :, :ln], 1, 2)
    return (unfold(dq, L).astype(q.dtype), unfold(dk, Lk).astype(k.dtype),
            unfold(dv, Lk).astype(v.dtype))


def _attention_bwd_ref(q, k, v, lut, g, scale, block_q, block_k):
    """Masked softmax-attention VJP computed from saved q/k/v.

    Matches the semantics of SLA/kernel.py:86-237 (dq/dk/dv over the selected
    blocks only). Dense when lut is None. fp32 throughout.
    """
    B, L, H, D = q.shape
    Lk = k.shape[1]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    s = jnp.einsum("blhd,bmhd->bhlm", qf, kf) * scale
    if lut is not None:
        nK = _cdiv(Lk, block_k)
        allowed = jnp.max(jax.nn.one_hot(lut, nK, dtype=jnp.bool_), axis=-2)
        qb = jnp.arange(L) // block_q
        kb = jnp.arange(Lk) // block_k
        mask = allowed[:, :, qb][:, :, :, kb]
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)                      # (B,H,L,Lk)

    dv = jnp.einsum("bhlm,blhd->bmhd", p, gf)
    dp = jnp.einsum("blhd,bmhd->bhlm", gf, vf)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq = jnp.einsum("bhlm,bmhd->blhd", ds, kf)
    dk = jnp.einsum("bhlm,blhd->bmhd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _fused_bwd_enabled(interpret: bool) -> bool:
    """Fused Pallas backward runs on TPU (and under interpret mode, so the
    CPU test suite exercises it). TDX_FUSED_BWD=0 falls back to the jnp
    gather/scatter backward."""
    import os
    flag = os.environ.get("TDX_FUSED_BWD", "1")
    if flag == "0":
        return False
    return interpret or jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def _make_flash_fn(scale, block_q, block_k, int8_qk, interpret,
                   v_quant="row"):
    @jax.custom_vjp
    def f(q, k, v, lut):
        return _flash_fwd_impl(q, k, v, lut, scale=scale, block_q=block_q,
                               block_k=block_k, int8_qk=int8_qk,
                               interpret=interpret, v_quant=v_quant)

    def fwd(q, k, v, lut):
        return f(q, k, v, lut), (q, k, v, lut)

    def bwd(res, g):
        q, k, v, lut = res
        if lut is not None:
            if _fused_bwd_enabled(interpret):
                dq, dk, dv = _flash_bwd_fused(q, k, v, lut, g, scale=scale,
                                              block_q=block_q,
                                              block_k=block_k,
                                              interpret=interpret)
            else:
                dq, dk, dv = _attention_bwd_sparse(q, k, v, lut, g, scale,
                                                   block_q, block_k)
        else:
            dq, dk, dv = _attention_bwd_ref(q, k, v, lut, g, scale,
                                            block_q, block_k)
        dlut = None if lut is None else np.zeros(lut.shape, jax.dtypes.float0)
        return dq, dk, dv, dlut

    f.defvjp(fwd, bwd)
    return f


def flash_attention(q, k, v, lut=None, scale: Optional[float] = None,
                    block_q: int = 128, block_k: int = 128,
                    int8_qk: bool = False, interpret: bool = False,
                    v_quant: str = "row"):
    """Flash attention over (B, L, H, D) tensors.

    lut: optional (B, H, nQ, topk) int32 table of K-block ids per Q-block.
         None => dense.
    v_quant: int8 V quantization granularity on the sparse int8 path:
         "row" (per-token, default) or "channel" (per-(head, channel) — the
         FP8-V analog, SLA/core.py:218-229).
    """
    D = q.shape[-1]
    scale = float(D ** -0.5) if scale is None else float(scale)
    if int8_qk:
        # smooth-k: softmax(q·k) == softmax(q·(k - km)); centering shrinks the
        # INT8 quantization range (SLA/core.py:195-199, SageAttention).
        k = k - jnp.mean(k, axis=1, keepdims=True)
    fn = _make_flash_fn(scale, block_q, block_k, bool(int8_qk),
                        bool(interpret), v_quant)
    return fn(q, k, v, lut)
