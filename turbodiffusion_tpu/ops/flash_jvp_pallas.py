"""Forward-mode (JVP) flash attention for sCM distillation.

The reference needed a 618-line Triton kernel
(rcm/utils/flash_attention_jvp_triton.py:16-45) because consistency
distillation pushes a tangent through the student's flash attention:
`F, t_F = jvp(student)` every step. Reverse-mode kernels (custom_vjp) are
opaque to `jax.jvp`, so without this module the tangent pass would fall
back to dense jnp attention — quadratic and unfused (the round-1 state).

Here the tangent math rides the same online-softmax streaming pass as the
forward:

    S  = scale * q k^T                 dS = scale * (dq k^T + q dk^T)
    P  = softmax(S)
    o  = P v
    mu = rowsum(P * dS)
    do = (P * (dS - mu)) v + P dv

carried per K-block with the usual (m, l) running max/denominator plus two
extra accumulators (tangent numerator, tangent rowsum). One kernel emits
both o and do — exactly the one-pass structure of the reference kernel,
built MXU-first: 6 matmuls per tile (vs the forward's 2), all f32-accum.

The sparse (SLA) variant uses the same LUT-gather scheme as the fused
backward (`flash_pallas._attention_bwd_sparse`): gather each Q-block's
selected K/V (+ tangent) blocks per head under `lax.map`, so tangent memory
stays O(L * topk * block_k) at 32k tokens.

Tangent-pass quantization is intentionally OFF (the reference JVP kernel is
also plain fp16/bf16 — quantized tangents are meaningless).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbodiffusion_tpu.ops.flash_pallas import _lut_ring, _row_get

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# jnp reference (CPU path + equivalence tests)
# ---------------------------------------------------------------------------

def flash_jvp_ref(q, k, v, dq, dk, dv, scale: float, lut=None,
                  block_q: int = 128, block_k: int = 128):
    """(o, do) of softmax attention under input tangents. (B, L, H, D)."""
    f32 = jnp.float32
    s = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=f32) * scale
    ds = (jnp.einsum("blhd,bmhd->bhlm", dq, k, preferred_element_type=f32)
          + jnp.einsum("blhd,bmhd->bhlm", q, dk,
                       preferred_element_type=f32)) * scale
    if lut is not None:
        Lk = k.shape[1]
        nK = _cdiv(Lk, block_k)
        allowed = jnp.max(jax.nn.one_hot(lut, nK, dtype=jnp.bool_), axis=-2)
        qb = jnp.arange(q.shape[1]) // block_q
        kb = jnp.arange(Lk) // block_k
        mask = allowed[:, :, qb][:, :, :, kb]
        s = jnp.where(mask, s, NEG_INF)
        ds = jnp.where(mask, ds, 0.0)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhlm,bmhd->blhd", p, v.astype(f32))
    mu = jnp.sum(p * ds, axis=-1, keepdims=True)
    do = (jnp.einsum("bhlm,bmhd->blhd", p * (ds - mu), v.astype(f32))
          + jnp.einsum("bhlm,bmhd->blhd", p, dv.astype(f32)))
    return o.astype(q.dtype), do.astype(q.dtype)


# ---------------------------------------------------------------------------
# Dense Pallas kernel: one streaming pass emitting (o, do)
# ---------------------------------------------------------------------------

def _jvp_kernel(q_ref, k_ref, v_ref, dq_ref, dk_ref, dv_ref, o_ref, do_ref,
                m_scr, l_scr, mu_scr, acco_scr, acct_scr,
                *, scale: float, block_k: int, kv_len: int):
    j = pl.program_id(2)
    num_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        mu_scr[...] = jnp.zeros_like(mu_scr)
        acco_scr[...] = jnp.zeros_like(acco_scr)
        acct_scr[...] = jnp.zeros_like(acct_scr)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    dq, dk, dv = dq_ref[0], dk_ref[0], dv_ref[0]

    dims = (((1,), (1,)), ((), ()))
    s = jax.lax.dot_general(q, k, dims,
                            preferred_element_type=jnp.float32) * scale
    ds = (jax.lax.dot_general(dq, k, dims, preferred_element_type=jnp.float32)
          + jax.lax.dot_general(q, dk, dims,
                                preferred_element_type=jnp.float32)) * scale

    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, NEG_INF)
    ds = jnp.where(col < kv_len, ds, 0.0)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                               # (BQ, BK) f32

    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(
        alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape)
    mu_scr[...] = (mu_scr[...] * alpha
                   + jnp.broadcast_to(
                       jnp.sum(p * ds, axis=-1, keepdims=True), mu_scr.shape))

    pb = p.astype(v.dtype)
    pdsb = (p * ds).astype(v.dtype)
    acco_scr[...] = acco_scr[...] * alpha + jax.lax.dot(
        pb, v, preferred_element_type=jnp.float32)
    acct_scr[...] = (acct_scr[...] * alpha
                     + jax.lax.dot(pdsb, v,
                                   preferred_element_type=jnp.float32)
                     + jax.lax.dot(pb, dv,
                                   preferred_element_type=jnp.float32))

    @pl.when(j == num_j - 1)
    def _finalize():
        l = jnp.maximum(l_scr[:, :1], 1e-20)
        o = acco_scr[...] / l
        mu = mu_scr[:, :1] / l
        o_ref[0] = o.astype(o_ref.dtype)
        do_ref[0] = (acct_scr[...] / l - mu * o).astype(do_ref.dtype)


def _flash_jvp_dense_pallas(q, k, v, dq, dk, dv, *, scale, interpret):
    B, L, H, D = q.shape
    Lk = k.shape[1]
    # Large dense tiles (like the forward), but block_k capped at 512: the
    # JVP keeps two f32 (BQ, BK) planes (p, ds) live -> ~2x the forward's
    # transient VMEM.
    block_q = min(512, _cdiv(L, 128) * 128)
    block_k = min(512, _cdiv(Lk, 128) * 128)
    nQ, nK = _cdiv(L, block_q), _cdiv(Lk, block_k)
    Lp, Lkp = nQ * block_q, nK * block_k

    def fold(x, lp):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))

    qf, dqf = fold(q, Lp), fold(dq, Lp)
    kf, vf = fold(k, Lkp), fold(v, Lkp)
    dkf, dvf = fold(dk, Lkp), fold(dv, Lkp)

    q_spec = pl.BlockSpec((1, block_q, D), lambda bh, i, j: (bh, i, 0))
    kv_spec = pl.BlockSpec((1, block_k, D), lambda bh, i, j: (bh, j, 0))
    out_shape = [jax.ShapeDtypeStruct((B * H, Lp, D), q.dtype)] * 2

    kern = functools.partial(_jvp_kernel, scale=scale, block_k=block_k,
                             kv_len=Lk)
    o, do = pl.pallas_call(
        kern,
        grid=(B * H, nQ, nK),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, kv_spec, kv_spec],
        out_specs=[q_spec, q_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # m
            pltpu.VMEM((block_q, 128), jnp.float32),   # l
            pltpu.VMEM((block_q, 128), jnp.float32),   # mu
            pltpu.VMEM((block_q, D), jnp.float32),     # acc o
            pltpu.VMEM((block_q, D), jnp.float32),     # acc tangent
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, kf, vf, dqf, dkf, dvf)

    unfold = lambda x: jnp.swapaxes(
        x.reshape(B, H, Lp, D)[:, :, :L], 1, 2)
    return unfold(o), unfold(do)


# ---------------------------------------------------------------------------
# Sparse (SLA) JVP — Pallas kernel: grouped LUT-gather of packed
# K|V|dK|dV, one streaming pass emitting (o, do)
# ---------------------------------------------------------------------------

def _sparse_jvp_kernel(lut_hbm, q_ref, dq_ref, kv4_hbm, o_ref, do_ref,
                       kv4buf, sems, lut2_ref, lut_sem, acco_scr, acct_scr,
                       *, scale: float, block_k: int, sel: int, kv_len: int):
    """Grid (BH, nQ). The four gathered streams ride ONE packed
    (BH, Lkp, 4D) bf16 array — one DMA descriptor per selected block, the
    `_sparse_attn_kernel_i8b` economy applied to the tangent pass. Online
    softmax carries (m, l, mu) plus two fp32 accumulators (o numerator,
    tangent numerator), exactly the dense `_jvp_kernel` recurrence."""
    NBUF, tile_k, fourD = kv4buf.shape
    D = fourD // 4
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
                kv4_hbm.at[bh, pl.ds(start, block_k)],
                kv4buf.at[slot, pl.ds(t * block_k, block_k)],
                sems.at[slot]))
        return ds

    for gg in range(NBUF - 1):
        @pl.when(gg < n_groups)
        def _start(gg=gg):
            for d in kv_dmas(gg, gg):
                d.start()

    BQ = q_ref.shape[1]
    q, dq = q_ref[0], dq_ref[0]
    acco_scr[...] = jnp.zeros_like(acco_scr)
    acct_scr[...] = jnp.zeros_like(acct_scr)
    m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    mu0 = jnp.zeros((BQ, 1), jnp.float32)

    dims = (((1,), (1,)), ((), ()))

    def body(g, carry):
        m, l, mu = carry
        slot = jax.lax.rem(g, NBUF)

        @pl.when(g + NBUF - 1 < n_groups)
        def _prefetch():
            for d in kv_dmas(jax.lax.rem(g + NBUF - 1, NBUF), g + NBUF - 1):
                d.start()

        for d in kv_dmas(slot, g):
            d.wait()
        k = kv4buf[slot, :, :D]
        v = kv4buf[slot, :, D:2 * D]
        dk = kv4buf[slot, :, 2 * D:3 * D]
        dv = kv4buf[slot, :, 3 * D:]

        s = jax.lax.dot_general(q, k, dims,
                                preferred_element_type=jnp.float32) * scale
        ds = (jax.lax.dot_general(dq, k, dims,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(q, dk,
                                    preferred_element_type=jnp.float32,
                                    dimension_numbers=dims)) * scale

        # mask: real KV columns AND real (non-padded) LUT entries
        within = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        t_idx = within // block_k
        col_parts = [_row_get(lut_ref, g * group + t) * block_k
                     for t in range(group)]
        kb_row = jnp.concatenate(
            [jnp.full((1, block_k), cp, jnp.int32) for cp in col_parts],
            axis=1)
        col = kb_row + jax.lax.rem(within, block_k)
        entry = g * group + t_idx
        live = (col < kv_len) & (entry < sel)
        s = jnp.where(live, s, NEG_INF)
        ds = jnp.where(live, ds, 0.0)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        mu_new = alpha * mu + jnp.sum(p * ds, axis=-1, keepdims=True)
        pb = p.astype(v.dtype)
        pdsb = (p * ds).astype(v.dtype)
        acco_scr[...] = acco_scr[...] * alpha + jax.lax.dot(
            pb, v, preferred_element_type=jnp.float32)
        acct_scr[...] = (acct_scr[...] * alpha
                         + jax.lax.dot(pdsb, v,
                                       preferred_element_type=jnp.float32)
                         + jax.lax.dot(pb, dv,
                                       preferred_element_type=jnp.float32))
        return m_new, l_new, mu_new

    m, l, mu = jax.lax.fori_loop(0, n_groups, body, (m0, l0, mu0))
    l = jnp.maximum(l, 1e-20)
    o = acco_scr[...] / l
    o_ref[0] = o.astype(o_ref.dtype)
    do_ref[0] = (acct_scr[...] / l - (mu / l) * o).astype(do_ref.dtype)


def _pick_group_jvp(sel: int) -> int:
    """Like flash_pallas._pick_group but capped at 4: the packed 4D stream
    quadruples tile bytes, so smaller gather groups keep the NBUF ring
    under the VMEM budget."""
    best, best_waste = min(4, sel), None
    for g in range(min(4, sel), 1, -1):
        waste = _cdiv(sel, g) * g - sel
        if best_waste is None or waste < best_waste:
            best, best_waste = g, waste
    return best


def _flash_jvp_sparse_pallas(q, k, v, dq, dk, dv, lut, *, scale,
                             block_q, block_k, interpret):
    B, L, H, D = q.shape
    Lk = k.shape[1]
    nQ, nK = _cdiv(L, block_q), _cdiv(Lk, block_k)
    Lp, Lkp = nQ * block_q, nK * block_k
    sel = lut.shape[-1]
    BH = B * H
    NBUF = 2
    GROUP = _pick_group_jvp(sel)
    n_groups = _cdiv(sel, GROUP)

    def fold(x, lp):
        x = jnp.swapaxes(x, 1, 2).reshape(BH, x.shape[1], D)
        return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))

    qf, dqf = fold(q, Lp), fold(dq, Lp)
    kv4 = jnp.concatenate([fold(k, Lkp), fold(v, Lkp), fold(dk, Lkp),
                           fold(dv, Lkp)], axis=-1)      # (BH, Lkp, 4D)

    # LUT rows padded to the Q grid, entries to full groups (id 0, masked
    # by entry index), lanes to the 128 tiling for aligned SMEM DMAs
    lut_flat = lut.reshape(BH, lut.shape[-2], sel).astype(jnp.int32)
    if lut_flat.shape[1] < nQ:
        lut_flat = jnp.pad(lut_flat,
                           ((0, 0), (0, nQ - lut_flat.shape[1]), (0, 0)))
    entry_pad = n_groups * GROUP - sel
    if entry_pad:
        lut_flat = jnp.pad(lut_flat, ((0, 0), (0, 0), (0, entry_pad)))
    sel_pad = _cdiv(n_groups * GROUP, 128) * 128
    lut_flat = jnp.pad(lut_flat,
                       ((0, 0), (0, 0), (0, sel_pad - n_groups * GROUP)))
    lut_flat, lut_row = _lut_ring(lut_flat)

    q_spec = pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0))
    o, do = pl.pallas_call(
        functools.partial(_sparse_jvp_kernel, scale=scale, block_k=block_k,
                          sel=sel, kv_len=Lk),
        grid=(BH, nQ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # LUT
            q_spec,
            q_spec,
            pl.BlockSpec(memory_space=pl.ANY),           # packed K|V|dK|dV
        ],
        out_specs=[q_spec, q_spec],
        out_shape=[jax.ShapeDtypeStruct((BH, Lp, D), q.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((NBUF, GROUP * block_k, 4 * D), kv4.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SMEM((2, *lut_row), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((block_q, D), jnp.float32),       # acc o
            pltpu.VMEM((block_q, D), jnp.float32),       # acc tangent
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(lut_flat, qf, dqf, kv4)
    unfold = lambda x: jnp.swapaxes(
        x.reshape(B, H, Lp, D)[:, :, :L], 1, 2).astype(q.dtype)
    return unfold(o), unfold(do)


# ---------------------------------------------------------------------------
# Sparse (SLA) JVP: jnp LUT-gather fallback (non-TPU)
# ---------------------------------------------------------------------------

def _sparse_jvp_gather(q, k, v, dq, dk, dv, lut, *, scale, block_q, block_k):
    B, L, H, D = q.shape
    Lk = k.shape[1]
    nQ, nK = _cdiv(L, block_q), _cdiv(Lk, block_k)
    Lp, Lkp = nQ * block_q, nK * block_k
    sel = lut.shape[-1]
    f32 = jnp.float32

    def fold(x, lp):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))

    qf, dqf = fold(q, Lp), fold(dq, Lp)
    kf, vf = fold(k, Lkp), fold(v, Lkp)
    dkf, dvf = fold(dk, Lkp), fold(dv, Lkp)
    lut_f = lut.reshape(B * H, nQ, sel)

    def per_head(args):
        qh, dqh, kh, vh, dkh, dvh, luth = args
        qg = qh.reshape(nQ, block_q, D)
        dqg = dqh.reshape(nQ, block_q, D)
        gather = lambda x: x.reshape(nK, block_k, D)[luth].reshape(
            nQ, sel * block_k, D)
        kg, vg, dkg, dvg = gather(kh), gather(vh), gather(dkh), gather(dvh)

        s = jnp.einsum("qbd,qkd->qbk", qg, kg,
                       preferred_element_type=f32) * scale
        ds = (jnp.einsum("qbd,qkd->qbk", dqg, kg, preferred_element_type=f32)
              + jnp.einsum("qbd,qkd->qbk", qg, dkg,
                           preferred_element_type=f32)) * scale
        col = (luth[:, :, None] * block_k +
               jnp.arange(block_k)[None, None, :]).reshape(nQ, 1, -1)
        s = jnp.where(col < Lk, s, NEG_INF)
        ds = jnp.where(col < Lk, ds, 0.0)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.einsum("qbk,qkd->qbd", p.astype(vg.dtype), vg,
                       preferred_element_type=f32)
        mu = jnp.sum(p * ds, axis=-1, keepdims=True)
        pds = (p * (ds - mu)).astype(vg.dtype)
        do = (jnp.einsum("qbk,qkd->qbd", pds, vg, preferred_element_type=f32)
              + jnp.einsum("qbk,qkd->qbd", p.astype(dvg.dtype), dvg,
                           preferred_element_type=f32))
        return o.reshape(Lp, D), do.reshape(Lp, D)

    o, do = jax.lax.map(per_head, (qf, dqf, kf, vf, dkf, dvf, lut_f))
    unfold = lambda x: jnp.swapaxes(
        x.reshape(B, H, Lp, D)[:, :, :L], 1, 2).astype(q.dtype)
    return unfold(o), unfold(do)


# ---------------------------------------------------------------------------
# custom_jvp wrappers
# ---------------------------------------------------------------------------

def _use_pallas_jvp(q) -> bool:
    return (jax.default_backend() == "tpu" and q.shape[-1] % 64 == 0)


@functools.lru_cache(maxsize=None)
def _make_dense_jvp_fn(scale: float, interpret: bool):
    @jax.custom_jvp
    def f(q, k, v):
        from turbodiffusion_tpu.ops.flash_pallas import flash_attention
        if _use_pallas_jvp(q) or interpret:
            return flash_attention(q, k, v, scale=scale, interpret=interpret)
        from turbodiffusion_tpu.ops.attention import dense_attention_ref
        return dense_attention_ref(q, k, v, scale=scale)

    @f.defjvp
    def f_jvp(primals, tangents):
        q, k, v = primals
        dq, dk, dv = tangents
        if _use_pallas_jvp(q) or interpret:
            o, do = _flash_jvp_dense_pallas(q, k, v, dq, dk, dv, scale=scale,
                                            interpret=interpret)
        else:
            o, do = flash_jvp_ref(q, k, v, dq, dk, dv, scale)
        return o, do

    return f


@functools.lru_cache(maxsize=None)
def _make_sparse_jvp_fn(scale: float, block_q: int, block_k: int,
                        interpret: bool):
    @jax.custom_jvp
    def f(q, k, v, lut):
        from turbodiffusion_tpu.ops.flash_pallas import flash_attention
        from turbodiffusion_tpu.ops.attention import sparse_attention_ref
        if _use_pallas_jvp(q) or interpret:
            return flash_attention(q, k, v, lut=lut, scale=scale,
                                   block_q=block_q, block_k=block_k,
                                   interpret=interpret)
        return sparse_attention_ref(q, k, v, lut, block_q, block_k,
                                    scale=scale)

    @f.defjvp
    def f_jvp(primals, tangents):
        q, k, v, lut = primals
        dq, dk, dv, _ = tangents
        # TDX_JVP_PALLAS_SPARSE=0: kill switch back to the lax.map gather
        # tangent (the pre-round-3 path) until the packed-gather kernel is
        # validated on-chip at the 32.7k-token training geometry
        import os as _os
        use_kernel = _os.environ.get("TDX_JVP_PALLAS_SPARSE", "1") == "1"
        if (_use_pallas_jvp(q) and use_kernel) or interpret:
            return _flash_jvp_sparse_pallas(
                q, k, v, dq, dk, dv, lut, scale=scale, block_q=block_q,
                block_k=block_k, interpret=interpret)
        return _sparse_jvp_gather(q, k, v, dq, dk, dv, lut, scale=scale,
                                  block_q=block_q, block_k=block_k)

    return f


def flash_attention_jvp(q, k, v, scale: Optional[float] = None,
                        interpret: bool = False):
    """Dense flash attention, forward-mode differentiable.

    Primal-only calls ride the normal flash kernel; under `jax.jvp` the
    fused one-pass (o, do) Pallas kernel runs instead of the round-1 jnp
    dense fallback (rcm/utils/flash_attention_jvp_triton.py is the
    reference contract)."""
    D = q.shape[-1]
    scale = float(D ** -0.5) if scale is None else float(scale)
    return _make_dense_jvp_fn(scale, bool(interpret))(q, k, v)


def sparse_attention_jvp(q, k, v, lut, block_q: int, block_k: int,
                         scale: Optional[float] = None,
                         interpret: bool = False):
    """Block-sparse (SLA) attention, forward-mode differentiable.

    The tangent pass gathers only the LUT-selected K/V blocks — the same
    memory bound as the fused backward — so rCM distillation of an SLA
    student runs sparse, not dense."""
    D = q.shape[-1]
    scale = float(D ** -0.5) if scale is None else float(scale)
    fn = _make_sparse_jvp_fn(scale, int(block_q), int(block_k),
                             bool(interpret))
    return fn(q, k, v, lut)
