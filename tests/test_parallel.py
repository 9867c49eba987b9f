"""Distributed correctness tests on the 8-device virtual CPU mesh — the test
class the reference entirely lacks (SURVEY.md §4: 'Distributed testing:
none')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.config import MeshConfig, wan_test_config
from turbodiffusion_tpu.models.wan import init_wan_params, wan_forward
from turbodiffusion_tpu.ops.attention import dense_attention_ref
from turbodiffusion_tpu.parallel.sharding import (
    make_mesh, shard_params, use_mesh)
from turbodiffusion_tpu.parallel.ulysses import ulysses_attention
from turbodiffusion_tpu.config import AttentionConfig


requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@requires_8_devices
def test_ulysses_attention_matches_single_device():
    """shard_map all_to_all Ulysses == plain attention (exactness of the
    a2a plumbing, ≡ a2a_cp.py:43-200)."""
    mesh = make_mesh(MeshConfig(data=1, fsdp=1, context=4))
    B, L, H, D = 1, 32, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, L, H, D))
    k = jax.random.normal(ks[1], (B, L, H, D))
    v = jax.random.normal(ks[2], (B, L, H, D))
    ref = dense_attention_ref(q, k, v)
    cfg = AttentionConfig(backend="dense")
    with use_mesh(mesh):
        out = jax.jit(lambda q, k, v: ulysses_attention(q, k, v, cfg,
                                                        mesh=mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@requires_8_devices
def test_ulysses_sla_matches_single_device():
    mesh = make_mesh(MeshConfig(data=1, fsdp=1, context=2))
    B, L, H, D = 1, 64, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, L, H, D))
    k = jax.random.normal(ks[1], (B, L, H, D))
    v = jax.random.normal(ks[2], (B, L, H, D))
    cfg = AttentionConfig(backend="sla", sla_topk=0.5, block_q=16, block_k=16)
    proj_l = {"w": jnp.zeros((D, D)), "b": jnp.zeros((D,))}
    from turbodiffusion_tpu.ops.attention import sla_attention
    ref = sla_attention(q, k, v, proj_l, cfg)
    with use_mesh(mesh):
        out = jax.jit(lambda q, k, v: ulysses_attention(
            q, k, v, cfg, proj_l=proj_l, mesh=mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@requires_8_devices
def test_sharded_forward_matches_single_device():
    """Full model: (data=2, fsdp=2, context=2) sharded forward == unsharded.
    Validates FSDP param sharding + sequence sharding + Ulysses end to end."""
    cfg = wan_test_config()
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    params["head"]["head"]["w"] = jnp.ones_like(params["head"]["head"]["w"]) * 0.01
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 2, 4, 4))
    t = jnp.full((2, 1), 600.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.text_len, cfg.text_dim))
    ref = wan_forward(params, cfg, x, t, ctx)

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, context=2))
    with use_mesh(mesh):
        sp = shard_params(params, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda p, x: wan_forward(p, cfg, x, t, ctx))(sp, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
