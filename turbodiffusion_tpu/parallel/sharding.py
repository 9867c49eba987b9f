"""Mesh and sharding utilities.

One `jax.sharding.Mesh` with named axes replaces the reference's entire
NCCL/megatron process-group stack (imaginaire/utils/distributed.py:50-98,
rcm/utils/fsdp_helper.py:96-149):

  axis 'data'    — data parallel (≡ DDP / HSDP replicate dim)
  axis 'fsdp'    — parameter sharding (≡ FSDP2 per-param DTensor sharding)
  axis 'context' — sequence/context parallel (≡ flattened CP + Ulysses)

Activations carry sharding constraints; XLA's SPMD partitioner inserts the
collectives (all-gather/reduce-scatter/all-to-all) that the reference issues
by hand.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from turbodiffusion_tpu.config import MeshConfig

_state = threading.local()


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = cfg.total
    if len(devices) < n:
        raise ValueError(f"Mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.data, cfg.fsdp, cfg.context)
    return Mesh(arr, axis_names=("data", "fsdp", "context"))


def get_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    prev = get_mesh()
    _state.mesh = mesh
    try:
        yield mesh
    finally:
        _state.mesh = prev


def _filter_spec(mesh: Mesh, spec: Sequence) -> P:
    """Drop axes absent from the mesh or of size 1."""
    out = []
    for a in spec:
        if a is not None and a in mesh.axis_names and mesh.shape[a] > 1:
            out.append(a)
        else:
            out.append(None)
    return P(*out)


_warned_skips = set()


def constrain(x, spec: Sequence):
    """with_sharding_constraint if a mesh is active; no-op otherwise."""
    mesh = get_mesh()
    if mesh is None or all(s == 1 for s in mesh.shape.values()):
        return x
    p = _filter_spec(mesh, spec)
    # Skip if any sharded dim isn't divisible by its axis size — but say so
    # once per shape: a silent skip silently loses parallelism.
    for dim, axis in enumerate(p):
        if axis is not None and x.shape[dim] % mesh.shape[axis] != 0:
            key = (x.shape, tuple(p))
            if key not in _warned_skips:
                _warned_skips.add(key)
                import logging
                logging.getLogger(__name__).warning(
                    "sharding constraint %s skipped for shape %s: dim %d "
                    "(%d) not divisible by mesh axis %r (%d) — tensor stays "
                    "unsharded", tuple(p), x.shape, dim, x.shape[dim], axis,
                    mesh.shape[axis])
            return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, p))


def param_sharding_spec(path_leaf_shape, mesh: Mesh) -> P:
    """FSDP-style parameter sharding: shard the largest dim that divides the
    'fsdp' axis (≡ fully_shard per block, rcm/networks/wan2pt1.py:766-772)."""
    shape = path_leaf_shape
    n = mesh.shape.get("fsdp", 1)
    if n <= 1 or not shape:
        return P()
    # prefer the last-but-one (input-features) dim, else any divisible dim
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % n == 0 and shape[d] >= n * 2:
            spec = [None] * len(shape)
            spec[d] = "fsdp"
            return P(*spec)
    return P()


def per_device_param_bytes(param_shapes, mesh: Mesh) -> int:
    """Per-device resident bytes of a param tree under param_sharding_spec —
    an eval_shape-level HBM budget check (no arrays materialized). Use
    before committing a model+mesh combination to real chips."""
    total = 0
    for leaf in jax.tree.leaves(param_shapes):
        spec = param_sharding_spec(leaf.shape, mesh)
        div = 1
        for axis in spec:
            if axis is not None:
                div *= mesh.shape[axis]
        n = 1
        for s in leaf.shape:
            n *= s
        total += n * leaf.dtype.itemsize // div
    return total


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh with FSDP sharding."""
    def place(leaf):
        sh = NamedSharding(mesh, param_sharding_spec(leaf.shape, mesh))
        return jax.device_put(leaf, sh)
    return jax.tree.map(place, params)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a data batch on the mesh: leading (batch) dim on the 'data'
    axis when divisible, replicated otherwise (≡ the reference's per-rank
    dataloader split, rcm/datasets/webdataset.py split_by_node)."""
    ndata = mesh.shape.get("data", 1)

    def place(v):
        if not hasattr(v, "ndim") or v.ndim == 0:
            return v
        spec = P()
        if ndata > 1 and v.shape[0] % ndata == 0:
            spec = P("data", *([None] * (v.ndim - 1)))
        return jax.device_put(v, NamedSharding(mesh, spec))

    return {k: place(v) for k, v in batch.items()}
