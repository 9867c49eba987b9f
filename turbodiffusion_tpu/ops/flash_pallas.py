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

Differentiation: a custom VJP recomputes the (masked) attention in jnp on the
backward pass — correct for SLA white-box finetuning (reference trains through
its Triton sparse kernel the same way, SLA/kernel.py:86-237). A fused Pallas
backward is a planned optimization.

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

def _sparse_attn_kernel(lut_hbm, q_ref, k_hbm, v_hbm, o_ref,
                        kbuf, vbuf, sems, lut_ref, lut_sem, acc_scr,
                        *, scale: float, block_k: int, kv_len: int,
                        int8_qk: bool, sel: int):
    """Block-sparse flash attention with manual double-buffered K/V gather.

    Grid: (BH, nQ). K/V and the LUT stay in HBM; only this Q-block's LUT row
    (a few dozen ints) is DMA'd into SMEM — prefetching the full LUT overflows
    the 1MB SMEM at real model scale. Each selected K block is DMA'd into a
    2-slot VMEM ring, overlapping the gather with the MXU work of the previous
    block.
    """
    bh, i = pl.program_id(0), pl.program_id(1)

    lut_dma = pltpu.make_async_copy(lut_hbm.at[bh, i], lut_ref, lut_sem)
    lut_dma.start()
    lut_dma.wait()

    def kv_dma(slot, j):
        kb = lut_ref[j]
        start = pl.multiple_of(kb * block_k, block_k)
        return (
            pltpu.make_async_copy(k_hbm.at[bh, pl.ds(start, block_k)],
                                  kbuf.at[slot], sems.at[0, slot]),
            pltpu.make_async_copy(v_hbm.at[bh, pl.ds(start, block_k)],
                                  vbuf.at[slot], sems.at[1, slot]),
        )

    for d in kv_dma(0, 0):
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

    def body(j, carry):
        m, l = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < sel)
        def _prefetch():
            for d in kv_dma(1 - slot, j + 1):
                d.start()

        for d in kv_dma(slot, j):
            d.wait()
        k = kbuf[slot]
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

        kb = lut_ref[j]
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new

    m, l = jax.lax.fori_loop(0, sel, body, (m, l))
    o_ref[0] = (acc_scr[...] / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, lut, *, scale, block_q, block_k, int8_qk,
                    interpret):
    B, L, H, D = q.shape
    Lk = k.shape[1]
    # Dense traversal uses large tiles to amortize per-grid-step overhead;
    # sparse tiles must match the block-map granularity.
    if lut is None:
        block_q = max(block_q, 512)
        block_k = max(block_k, 1024)
    nQ = _cdiv(L, block_q)
    nK = _cdiv(Lk, block_k)
    Lp, Lkp = nQ * block_q, nK * block_k

    def fold(x, lp):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))

    qf, kf, vf = fold(q, Lp), fold(k, Lkp), fold(v, Lkp)
    out_shape = jax.ShapeDtypeStruct((B * H, Lp, D), q.dtype)

    if lut is None:
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
        # Pad the LUT lane dim to the 128 tiling so HBM row slices are
        # aligned; the kernel's fori_loop only reads the first `sel` entries.
        sel_pad = _cdiv(sel, 128) * 128
        lut_flat = jnp.pad(lut.reshape(B * H, nQ, sel).astype(jnp.int32),
                           ((0, 0), (0, 0), (0, sel_pad - sel)))

        def kernel(lut_hbm, q_ref, k_hbm, v_hbm, o_ref,
                   kbuf, vbuf, sems, lut_ref, lut_sem, acc_scr):
            _sparse_attn_kernel(lut_hbm, q_ref, k_hbm, v_hbm, o_ref,
                                kbuf, vbuf, sems, lut_ref, lut_sem, acc_scr,
                                scale=scale, block_k=block_k, kv_len=Lk,
                                int8_qk=int8_qk, sel=sel)

        out = pl.pallas_call(
            kernel,
            grid=(B * H, nQ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # LUT stays in HBM
                pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),  # K stays in HBM
                pl.BlockSpec(memory_space=pltpu.ANY),  # V stays in HBM
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0)),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, block_k, D), k.dtype),   # K ring
                pltpu.VMEM((2, block_k, D), v.dtype),   # V ring
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SMEM((sel_pad,), jnp.int32),      # this row's LUT
                pltpu.SemaphoreType.DMA(()),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(lut_flat, qf, kf, vf)

    out = out[:, :L].reshape(B, H, L, D)
    return jnp.swapaxes(out, 1, 2)


# ---------------------------------------------------------------------------
# Backward (recompute-based reference; fused Pallas bwd is future work)
# ---------------------------------------------------------------------------

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


@functools.lru_cache(maxsize=None)
def _make_flash_fn(scale, block_q, block_k, int8_qk, interpret):
    @jax.custom_vjp
    def f(q, k, v, lut):
        return _flash_fwd_impl(q, k, v, lut, scale=scale, block_q=block_q,
                               block_k=block_k, int8_qk=int8_qk,
                               interpret=interpret)

    def fwd(q, k, v, lut):
        return f(q, k, v, lut), (q, k, v, lut)

    def bwd(res, g):
        q, k, v, lut = res
        dq, dk, dv = _attention_bwd_ref(q, k, v, lut, g, scale,
                                        block_q, block_k)
        dlut = None if lut is None else np.zeros(lut.shape, jax.dtypes.float0)
        return dq, dk, dv, dlut

    f.defvjp(fwd, bwd)
    return f


def flash_attention(q, k, v, lut=None, scale: Optional[float] = None,
                    block_q: int = 128, block_k: int = 128,
                    int8_qk: bool = False, interpret: bool = False):
    """Flash attention over (B, L, H, D) tensors.

    lut: optional (B, H, nQ, topk) int32 table of K-block ids per Q-block.
         None => dense.
    """
    D = q.shape[-1]
    scale = float(D ** -0.5) if scale is None else float(scale)
    if int8_qk:
        # smooth-k: softmax(q·k) == softmax(q·(k - km)); centering shrinks the
        # INT8 quantization range (SLA/core.py:195-199, SageAttention).
        k = k - jnp.mean(k, axis=1, keepdims=True)
    fn = _make_flash_fn(scale, block_q, block_k, bool(int8_qk), bool(interpret))
    return fn(q, k, v, lut)
