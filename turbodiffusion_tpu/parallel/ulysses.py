"""Ulysses context-parallel attention via shard_map + all_to_all.

Reference: rcm/utils/a2a_cp.py:43-200 (_SeqAllToAllQKV / DistributedAttention
/ MinimalA2AAttnOp): sequence-sharded activations are all-to-all'd into
head-sharded layout, attention runs exactly on full local sequences, and the
output is all-to-all'd back.

On TPU this must be an explicit shard_map (the Pallas attention kernels are
opaque to the GSPMD partitioner); `jax.lax.all_to_all` lowers to the ICI
collective, replacing the reference's hand-rolled async NCCL overlap
(a2a_cp.py:66-105) with XLA's own latency hiding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from turbodiffusion_tpu.config import AttentionConfig
from turbodiffusion_tpu.ops.attention import attention
from turbodiffusion_tpu.parallel.sharding import get_mesh


def context_parallel_size(mesh: Optional[Mesh]) -> int:
    if mesh is None or "context" not in mesh.axis_names:
        return 1
    return mesh.shape["context"]


def ulysses_attention(q, k, v, cfg: AttentionConfig, proj_l=None,
                      mesh: Optional[Mesh] = None):
    """q, k, v: (B, L, H, D) sequence-sharded on the 'context' mesh axis.
    Heads must divide the context-parallel size (a2a_cp.py:49-51)."""
    mesh = mesh if mesh is not None else get_mesh()
    cp = context_parallel_size(mesh)
    if cp <= 1:
        return attention(q, k, v, cfg, proj_l=proj_l)

    H = q.shape[2]
    assert H % cp == 0, f"num_heads {H} must be divisible by cp={cp}"

    data_axis = "data" if ("data" in mesh.axis_names
                           and mesh.shape["data"] > 1) else None
    spec = P(data_axis, "context", None, None)

    def local(q, k, v, proj_l):
        # seq-sharded -> head-sharded: gather seq, scatter heads
        # (≡ _SeqAllToAllQKV forward, a2a_cp.py:43-105)
        a2a = lambda x: jax.lax.all_to_all(x, "context", split_axis=2,
                                           concat_axis=1, tiled=True)
        o = attention(a2a(q), a2a(k), a2a(v), cfg, proj_l=proj_l)
        # head-sharded -> seq-sharded (≡ _SeqAllToAll backward direction)
        return jax.lax.all_to_all(o, "context", split_axis=1, concat_axis=2,
                                  tiled=True)

    proj_spec = jax.tree.map(lambda _: P(), proj_l) if proj_l is not None \
        else None
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, proj_spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, proj_l)


def ulysses_sla_fused(q_proj, k_proj, v_proj, norm_q_w, norm_k_w, rope_cs,
                      proj_l, cfg: AttentionConfig, *, num_heads: int,
                      eps: float = 1e-6, qkv_fused: bool = False,
                      mesh: Optional[Mesh] = None, interpret: bool = False):
    """Fused SageSLA front-end under Ulysses context parallelism.

    Single-chip, the whole front-end is one fused pipeline
    (ops/attention.sla_attention_fused). Under CP the full-dim RMSNorm-QK
    stat spans all heads, so the split is: per-shard fused norm+RoPE on
    local tokens (full width) -> all_to_all into head-sharded layout ->
    the SAME fused pool/quant/block-map/sparse/linear pipeline over the full
    sequence with H/cp local heads -> all_to_all back. The a2a volume equals
    the composable path's q/k/v exchange (a2a_cp.py:43-105); everything the
    single-chip fusion saves (fold transposes, pooling, int8 passes) stays
    saved.

    q_proj: (B, L, H*Dh) seq-sharded on 'context' (or (B, L, 3*H*Dh) fused
    QKV when qkv_fused). Returns bf16 (B, L, H*Dh) seq-sharded, ready for
    the O projection.
    """
    from turbodiffusion_tpu.ops.fused_norm import _rmsrope_pallas
    from turbodiffusion_tpu.ops.flash_pallas import (
        quantize_v_per_channel, sparse_attention_i8_planes)
    from turbodiffusion_tpu.ops.linear_attention_pallas import (
        linear_projected_planes)
    from turbodiffusion_tpu.ops.sla_fused import (
        block_map_from_pooled, head_planes, subquant_pack_kv)

    mesh = mesh if mesh is not None else get_mesh()
    cp = context_parallel_size(mesh)
    H = num_heads
    assert H % cp == 0, f"num_heads {H} must be divisible by cp={cp}"
    Hl = H // cp
    B, L_total, Wx = q_proj.shape
    HD = Wx // 3 if qkv_fused else Wx
    Dh = HD // H
    cosF, sinF = rope_cs

    data_axis = "data" if ("data" in mesh.axis_names
                           and mesh.shape["data"] > 1) else None
    x_spec = P(data_axis, "context", None)
    t_spec = P("context", None)          # rope tables split over tokens
    rep = P()

    def local(qp, kp, vp, nq_w, nk_w, cos_l, sin_l, pl_w):
        # 1. per-shard fused RMSNorm(full width) + rotate-half RoPE
        #    (B, Ll, H*Dh) -> (B, Ll, H*Dh); V is already final
        if qkv_fused:
            srcs = ((qp, 0), (qp, 1), (qp, 2))
        else:
            srcs = ((qp, 0), (kp, 0), (vp, 0))
        qn = _rmsrope_pallas(srcs[0][0], nq_w, cos_l, sin_l, eps, H,
                             interpret=interpret, width=HD,
                             col_block=srcs[0][1])
        kn = _rmsrope_pallas(srcs[1][0], nk_w, cos_l, sin_l, eps, H,
                             interpret=interpret, width=HD,
                             col_block=srcs[1][1])
        Ll = qn.shape[1]
        if qkv_fused:
            vn = jax.lax.slice_in_dim(srcs[2][0], 2 * HD, 3 * HD, axis=2)
        else:
            vn = srcs[2][0]
        vn = vn.reshape(B, Ll, H, Dh)

        # 2. token-sharded -> head-sharded (full sequence, H/cp heads)
        def a2a(x):
            return jax.lax.all_to_all(x, "context", split_axis=2,
                                      concat_axis=1, tiled=True)
        qf = a2a(qn).reshape(B, cp * Ll, Hl * Dh)
        kf = a2a(kn).reshape(B, cp * Ll, Hl * Dh)
        vf = a2a(vn).reshape(B, cp * Ll, Hl * Dh)
        Lf = cp * Ll

        # 3. the single-chip fused pipeline, norm/rope already done
        pad_to = -(-Lf // 512) * 512
        lin = cfg.linear_branch
        v_chan = cfg.v_quant == "channel"
        # head_planes pools in 256-row tiles, so in-kernel pooling is capped
        # at 256; wider block_q merges adjacent pooled rows count-weighted
        # afterwards (mirrors ops/attention.py sagesla_fused).
        q_pool = min(cfg.block_q, 256)
        Q = head_planes(qf, num_heads=Hl, pool=q_pool, quant=True,
                        bf16_out=lin, pad_to=pad_to, interpret=interpret)
        K = head_planes(kf, num_heads=Hl, pool=cfg.block_k, quant=False,
                        bf16_out=True, pad_to=pad_to, interpret=interpret)
        V = head_planes(vf, num_heads=Hl, pool=0, quant=not v_chan,
                        bf16_out=lin or v_chan, pad_to=pad_to,
                        interpret=interpret)
        pooled_q = Q["pooled"]
        if cfg.block_q > q_pool:
            f = cfg.block_q // q_pool
            nP = pooled_q.shape[2]
            nPp = -(-nP // f) * f
            cnt = jnp.clip(Lf - jnp.arange(nPp) * q_pool, 0, q_pool
                           ).astype(jnp.float32)
            pq = jnp.pad(pooled_q, ((0, 0), (0, 0), (0, nPp - nP), (0, 0)))
            pq = pq * cnt[None, None, :, None]
            pq = pq.reshape(*pq.shape[:2], nPp // f, f, pq.shape[-1]).sum(3)
            csum = jnp.maximum(cnt.reshape(nPp // f, f).sum(1), 1.0)
            pooled_q = pq / csum[None, None, :, None]
        lut, _, k_mean = block_map_from_pooled(
            pooled_q, K["pooled"], Lf, cfg.block_k, cfg.sla_topk)
        if v_chan:
            vi, vcs = quantize_v_per_channel(V["bf16"], Lf)
            kvi, ksb = subquant_pack_kv(K["bf16"], k_mean, vi, cfg.block_k,
                                        block_scales=True, kv_len=Lf,
                                        interpret=interpret)
            zb = jnp.zeros((*vi.shape[:3], 1), jnp.float32)
            o = sparse_attention_i8_planes(
                Q["i8"], Q["scale"], None, zb, None, zb, lut,
                block_q=cfg.block_q, block_k=cfg.block_k, kv_len=Lf,
                v_channel_scale=vcs, kvi_packed=kvi, k_block_scale=ksb,
                interpret=interpret)
        else:
            vi, vs = V["i8"], V["scale"]
            kvi, ks = subquant_pack_kv(K["bf16"], k_mean, vi, cfg.block_k,
                                       interpret=interpret)
            o = sparse_attention_i8_planes(
                Q["i8"], Q["scale"], None, ks, None, vs, lut,
                block_q=cfg.block_q, block_k=cfg.block_k, kv_len=Lf,
                kvi_packed=kvi, interpret=interpret)
        if lin:
            o = o + linear_projected_planes(
                Q["bf16"], K["bf16"], V["bf16"], pl_w["w"], pl_w["b"],
                true_len=Lf, interpret=interpret)

        # 4. head-sharded -> token-sharded, then unfold for the O GEMM
        o = jax.lax.all_to_all(o[:, :, :Lf], "context", split_axis=2,
                               concat_axis=1, tiled=True)  # (B, H, Ll, Dh)
        return jnp.swapaxes(o, 1, 2).reshape(B, Ll, H * Dh)

    pl_spec = jax.tree.map(lambda _: rep, proj_l) if proj_l is not None \
        else None
    if proj_l is None:
        proj_l = {"w": jnp.zeros((Dh, Dh), jnp.float32),
                  "b": jnp.zeros((Dh,), jnp.float32)}
        pl_spec = jax.tree.map(lambda _: rep, proj_l)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(x_spec, (rep if qkv_fused else x_spec),
                  (rep if qkv_fused else x_spec),
                  rep, rep, t_spec, t_spec, pl_spec),
        out_specs=x_spec,
        check_vma=False,
    )(q_proj,
      q_proj[:, :1] if qkv_fused else k_proj,
      q_proj[:, :1] if qkv_fused else v_proj,
      norm_q_w.reshape(-1), norm_k_w.reshape(-1), cosF, sinF, proj_l)
