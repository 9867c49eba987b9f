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


@requires_8_devices
def test_ulysses_fused_sla_matches_single_device():
    """CP-fused SageSLA front-end (VERDICT r2 #8): per-shard fused norm/rope
    + a2a + fused pool/quant/sparse pipeline under context=2 must match the
    single-device fused pipeline bit-for-bit (same kernels, same order)."""
    from turbodiffusion_tpu.ops.attention import sla_attention_fused
    from turbodiffusion_tpu.ops.sla_fused import unfold_planes
    from turbodiffusion_tpu.parallel.ulysses import ulysses_sla_fused

    mesh = make_mesh(MeshConfig(data=1, fsdp=1, context=2))
    B, L, H, Dh = 1, 1024, 2, 128
    HD = H * Dh
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    cfg = AttentionConfig(backend="sagesla", sla_topk=0.5,
                          block_q=128, block_k=128)
    nq_w = 1.0 + 0.1 * jax.random.normal(ks[3], (HD,))
    nk_w = 1.0 - 0.1 * jax.random.normal(ks[3], (HD,))
    proj_l = {"w": jnp.eye(Dh, dtype=jnp.float32) * 0.05,
              "b": jnp.zeros((Dh,), jnp.float32)}

    from turbodiffusion_tpu.ops.fused_norm import rope_cos_sin_full
    from turbodiffusion_tpu.models.rope import rope_freqs_3d
    freqs = rope_freqs_3d(4, 16, 16, Dh)
    rope_cs = rope_cos_sin_full(freqs)

    def mk(i):
        return jax.random.normal(ks[i], (B, L, HD), jnp.float32) * 0.5

    q_proj, k_proj, v_proj = mk(0), mk(1), mk(2)

    single = sla_attention_fused(
        q_proj, k_proj, v_proj, nq_w, nk_w, rope_cs, proj_l, cfg,
        num_heads=H, interpret=True)
    single = unfold_planes(single, L)

    with use_mesh(mesh):
        out = jax.jit(lambda q, k, v: ulysses_sla_fused(
            q, k, v, nq_w, nk_w, rope_cs, proj_l, cfg, num_heads=H,
            mesh=mesh, interpret=True))(q_proj, k_proj, v_proj)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(single, np.float32),
                               rtol=2e-2, atol=2e-2)


@requires_8_devices
def test_ulysses_fused_sla_qkv_fused_input():
    """Fused-QKV GEMM output variant: column slices ride the BlockSpec."""
    from turbodiffusion_tpu.parallel.ulysses import ulysses_sla_fused

    mesh = make_mesh(MeshConfig(data=1, fsdp=1, context=2))
    B, L, H, Dh = 1, 512, 2, 128
    HD = H * Dh
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    cfg = AttentionConfig(backend="sagesla", sla_topk=1.0,
                          block_q=128, block_k=128, linear_branch=False)
    nq_w = jnp.ones((HD,))
    nk_w = jnp.ones((HD,))
    from turbodiffusion_tpu.ops.fused_norm import rope_cos_sin_full
    from turbodiffusion_tpu.models.rope import rope_freqs_3d
    rope_cs = rope_cos_sin_full(rope_freqs_3d(2, 16, 16, Dh))

    qkv = jax.random.normal(ks[0], (B, L, 3 * HD), jnp.float32) * 0.5
    with use_mesh(mesh):
        out = jax.jit(lambda x: ulysses_sla_fused(
            x, None, None, nq_w, nk_w, rope_cs, None, cfg, num_heads=H,
            qkv_fused=True, mesh=mesh, interpret=True))(qkv)
    sep = jnp.split(qkv, 3, axis=-1)
    with use_mesh(mesh):
        ref = jax.jit(lambda q, k, v: ulysses_sla_fused(
            q, k, v, nq_w, nk_w, rope_cs, None, cfg, num_heads=H,
            mesh=mesh, interpret=True))(*sep)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-5, atol=1e-5)


@requires_8_devices
def test_ulysses_fused_sla_wide_block_q():
    """Regression (ADVICE r4 high): production make_wan_cfg defaults
    block_q=512 (2x block_k); head_planes caps in-kernel pooling at 256, so
    ulysses_sla_fused must merge pooled rows count-weighted like the
    single-device path (ops/attention.py:418-441) instead of asserting.
    Runs the real-model default config (quant V per channel, linear branch
    on) and checks it matches the single-device fused pipeline."""
    from turbodiffusion_tpu.ops.attention import sla_attention_fused
    from turbodiffusion_tpu.ops.sla_fused import unfold_planes
    from turbodiffusion_tpu.parallel.ulysses import ulysses_sla_fused

    mesh = make_mesh(MeshConfig(data=1, fsdp=1, context=2))
    B, L, H, Dh = 1, 1024, 2, 128
    HD = H * Dh
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    cfg = AttentionConfig(backend="sagesla", sla_topk=0.5,
                          block_q=512, block_k=256)
    nq_w = 1.0 + 0.1 * jax.random.normal(ks[3], (HD,))
    nk_w = 1.0 - 0.1 * jax.random.normal(ks[3], (HD,))
    proj_l = {"w": jnp.eye(Dh, dtype=jnp.float32) * 0.05,
              "b": jnp.zeros((Dh,), jnp.float32)}

    from turbodiffusion_tpu.ops.fused_norm import rope_cos_sin_full
    from turbodiffusion_tpu.models.rope import rope_freqs_3d
    rope_cs = rope_cos_sin_full(rope_freqs_3d(4, 16, 16, Dh))

    def mk(i):
        return jax.random.normal(ks[i], (B, L, HD), jnp.float32) * 0.5

    q_proj, k_proj, v_proj = mk(0), mk(1), mk(2)

    single = sla_attention_fused(
        q_proj, k_proj, v_proj, nq_w, nk_w, rope_cs, proj_l, cfg,
        num_heads=H, interpret=True)
    single = unfold_planes(single, L)

    with use_mesh(mesh):
        out = jax.jit(lambda q, k, v: ulysses_sla_fused(
            q, k, v, nq_w, nk_w, rope_cs, proj_l, cfg, num_heads=H,
            mesh=mesh, interpret=True))(q_proj, k_proj, v_proj)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(single, np.float32),
                               rtol=2e-2, atol=2e-2)
