"""Fused Pallas linear-attention branch (SLA compensation path).

Reference semantics (SLA/core.py:94-114):
    phi = softmax over head_dim
    o_l = (phi(q) @ (phi(k)^T v)) / (1e-5 + phi(q) . sum(phi(k)))
    out = o_l @ W_proj + b_proj              (proj_l, fp32 zero-init)

The branch is tiny in FLOPs but was ~5ms/layer as jnp: the feature-map
softmaxes and einsums each re-walk 100MB activations. Fused here into two
bandwidth-bound Pallas passes:

  pass 1: accumulate  kv[h] += phi(k_blk)^T v_blk  and  ksum[h] += sum phi(k)
  pass 2: out = phi(q_blk) @ (kv @ W) / (1e-5 + phi(q_blk) @ ksum) + b

proj_l is folded into kv between the passes (division is per-row scalar, so
(phi q @ kv / den) @ W == phi q @ (kv @ W) / den).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _phi(x, valid_rows=None):
    """softmax over the last (head) dim, fp32 internals."""
    xf = x.astype(jnp.float32)
    m = jnp.max(xf, axis=-1, keepdims=True)
    e = jnp.exp(xf - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _kv_kernel(k_ref, v_ref, kv_ref, ksum_ref, kv_acc, ks_acc, *,
               kv_len: int, block_k: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        kv_acc[...] = jnp.zeros_like(kv_acc)
        ks_acc[...] = jnp.zeros_like(ks_acc)

    k = k_ref[0]
    v = v_ref[0].astype(jnp.float32)
    pk = _phi(k)                                      # (bk, D) f32
    row = j * block_k + jax.lax.broadcasted_iota(jnp.int32, pk.shape, 0)
    pk = jnp.where(row < kv_len, pk, 0.0)
    # v padding rows may be NaN garbage (planes inputs are unwritten past
    # kv_len) — 0 * NaN poisons the contraction, so mask v as well
    v = jnp.where(row < kv_len, v, 0.0)
    kv_acc[...] += jax.lax.dot_general(pk, v, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    ks_acc[...] += jnp.sum(pk, axis=0, keepdims=True)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        kv_ref[0] = kv_acc[...]
        ksum_ref[0] = ks_acc[...]


def _apply_kernel(q_ref, kvw_ref, ksum_ref, bias_ref, o_ref):
    q = q_ref[0]
    pq = _phi(q)                                      # (bq, D) f32
    num = jax.lax.dot(pq, kvw_ref[0], preferred_element_type=jnp.float32)
    # elementwise-mult + keepdims reduce instead of a (bq,D)x(D,1) matvec:
    # Mosaic lowers the matvec to a 1D multi_reduction it cannot lay out
    den = 1e-5 + jnp.sum(pq * ksum_ref[0], axis=-1, keepdims=True)
    o_ref[0] = (num / den + bias_ref[0]).astype(o_ref.dtype)


def _linear_projected_ref(q, k, v, w, b):
    """Differentiable jnp reference of the fused kernels (same math); used
    only as the backward-pass recompute of the custom VJP below."""
    def phi(x):
        return jax.nn.softmax(x.astype(jnp.float32), axis=-1)

    pq, pk = phi(q), phi(k)
    vf = v.astype(jnp.float32)
    kv = jnp.einsum("blhd,blhe->bhde", pk, vf)
    ksum = jnp.sum(pk, axis=1)                            # (B, H, D)
    num = jnp.einsum("blhd,bhde->blhe", pq, kv)
    den = 1e-5 + jnp.einsum("blhd,bhd->blh", pq, ksum)[..., None]
    o = num / den
    return (o @ w.astype(jnp.float32) + b.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _linear_projected(q, k, v, w, b, block, interpret):
    return _linear_projected_impl(q, k, v, w, b, block, interpret)


def _linear_projected_fwd(q, k, v, w, b, block, interpret):
    return _linear_projected_impl(q, k, v, w, b, block, interpret), \
        (q, k, v, w, b)


def _linear_projected_bwd(block, interpret, res, g):
    _, vjp = jax.vjp(_linear_projected_ref, *res)
    return vjp(g)


_linear_projected.defvjp(_linear_projected_fwd, _linear_projected_bwd)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def linear_attention_projected(q, k, v, w, b, block: int = 512,
                               interpret: bool = False):
    """(B, L, H, D) -> proj_l(linear_attention(q, k, v)). w: (D, D), b: (D,).

    Differentiable: a custom VJP recomputes the branch in jnp on the backward
    pass (the fused Pallas forward has no JVP rule), so SLA training — whose
    main trainable is proj_l — works through the fast path on TPU."""
    return _linear_projected(q, k, v, w, b, block, interpret)


@functools.partial(jax.jit, static_argnames=("true_len", "block", "interpret"))
def linear_projected_planes(qp, kp, vp, w, b, true_len: int,
                            block: int = 512, interpret: bool = False):
    """Head-planes variant for the fused SLA path: inputs/outputs are
    (B, H, Lp, D) with Lp a block multiple; rows in [true_len, Lp) are
    garbage in and garbage out (masked by kv_len in the accumulation).
    Inference-only (no VJP) — training uses `linear_attention_projected`."""
    B, H, Lp, D = qp.shape
    out = _planes_impl(qp.reshape(B * H, Lp, D), kp.reshape(B * H, Lp, D),
                       vp.reshape(B * H, Lp, D), w, b, true_len, block,
                       interpret)
    return out.reshape(B, H, Lp, D)


def _planes_impl(qf, kf, vf, w, b, kv_len: int, block: int, interpret: bool):
    BH, Lp, D = qf.shape
    nQ = nK = Lp // block

    kv, ksum = pl.pallas_call(
        functools.partial(_kv_kernel, kv_len=kv_len, block_k=block),
        grid=(BH, nK),
        in_specs=[
            pl.BlockSpec((1, block, D), lambda bh, j: (bh, j, 0)),
            pl.BlockSpec((1, block, D), lambda bh, j: (bh, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, D, D), lambda bh, j: (bh, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda bh, j: (bh, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, D, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(kf, vf)

    # fold proj_l into the per-head kv matrices (tiny (D,D) matmuls)
    kvw = jnp.einsum("nde,ef->ndf", kv, w.astype(jnp.float32))
    bias = jnp.broadcast_to(b.astype(jnp.float32)[None, None], (BH, 1, D))

    return pl.pallas_call(
        _apply_kernel,
        grid=(BH, nQ),
        in_specs=[
            pl.BlockSpec((1, block, D), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, D, D), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, D), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lp, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(qf, kvw, ksum, bias)


def _linear_projected_impl(q, k, v, w, b, block: int, interpret: bool):
    B, L, H, D = q.shape
    Lk = k.shape[1]
    nQ, nK = _cdiv(L, block), _cdiv(Lk, block)
    Lp, Lkp = nQ * block, nK * block

    def fold(x, lp):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))

    qf, kf, vf = fold(q, Lp), fold(k, Lkp), fold(v, Lkp)

    kv, ksum = pl.pallas_call(
        functools.partial(_kv_kernel, kv_len=Lk, block_k=block),
        grid=(B * H, nK),
        in_specs=[
            pl.BlockSpec((1, block, D), lambda bh, j: (bh, j, 0)),
            pl.BlockSpec((1, block, D), lambda bh, j: (bh, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, D, D), lambda bh, j: (bh, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda bh, j: (bh, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, D, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, 1, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(kf, vf)

    # fold proj_l into the per-head kv matrices (tiny (D,D) matmuls)
    kvw = jnp.einsum("nde,ef->ndf", kv, w.astype(jnp.float32))
    bias = jnp.broadcast_to(b.astype(jnp.float32)[None, None], (B * H, 1, D))

    out = pl.pallas_call(
        _apply_kernel,
        grid=(B * H, nQ),
        in_specs=[
            pl.BlockSpec((1, block, D), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, D, D), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, D), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(qf, kvw, ksum, bias)

    out = out[:, :L].reshape(B, H, L, D)
    return jnp.swapaxes(out, 1, 2)
