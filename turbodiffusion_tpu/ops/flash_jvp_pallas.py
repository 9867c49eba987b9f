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
# Sparse (SLA) JVP: LUT-gather per head, memory O(L * topk * block_k)
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
