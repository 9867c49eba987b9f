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
