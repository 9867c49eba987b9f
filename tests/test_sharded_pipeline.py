"""Sharded (multi-chip) inference: mesh-aware WanPipeline + flagship-preset
validation.

The 14B / A14B models cannot fit one 16GB chip in bf16 — the pipeline's
mesh path (FSDP-sharded params + context-sharded sequence + Ulysses
attention) is how they run at all. These tests exercise that path on the
8-virtual-device CPU mesh (tiny model / tiny frames), plus shape-level
validation of the real flagship presets (config typos in dim/head splits
would otherwise only surface on a real multi-chip run)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.config import (
    GenerationConfig, MeshConfig, wan_config)
from turbodiffusion_tpu.models.wan import init_wan_params, wan_forward
from turbodiffusion_tpu.pipelines.pipeline import WanPipeline
from turbodiffusion_tpu import config as C


@pytest.fixture(autouse=True)
def _test_res():
    C.VIDEO_RES_SIZE_INFO.setdefault("test", {"1:1": (32, 32)})


def test_sharded_t2v_matches_unsharded():
    """Pipeline on a (data=1, fsdp=2, context=2) mesh: runs, and matches the
    single-device result (generation math is mesh-invariant)."""
    gen = GenerationConfig(num_steps=2, num_frames=5, resolution="test",
                           aspect_ratio="1:1", ode=True)
    base = WanPipeline.create(model="test", attention_type="original",
                              seed=11)
    ref = base.generate_t2v("a boat", gen)

    sharded = WanPipeline.create(
        model="test", attention_type="original", seed=11,
        mesh_config=MeshConfig(data=1, fsdp=2, context=2))
    assert sharded.mesh is not None
    out = sharded.generate_t2v("a boat", gen)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-2)


def test_sharded_i2v_two_experts():
    """A14B-style two-expert I2V on the mesh: both experts resident,
    sharded (vs the reference's CPU offload, wan2.2_i2v_infer.py:91-94)."""
    pipe = WanPipeline.create(
        model="test", attention_type="original",
        mesh_config=MeshConfig(data=1, fsdp=2, context=2))
    pipe.cfg = pipe.cfg.replace(arch="wan2.2", model_type="i2v", in_dim=36)
    from turbodiffusion_tpu.parallel.sharding import shard_params
    pipe.params = shard_params(
        init_wan_params(jax.random.PRNGKey(0), pipe.cfg), pipe.mesh)
    pipe.params_low = shard_params(
        init_wan_params(jax.random.PRNGKey(1), pipe.cfg), pipe.mesh)
    image = np.zeros((3, 32, 32), np.float32)
    gen = GenerationConfig(num_steps=2, num_frames=5, resolution="test",
                           aspect_ratio="1:1", sigma_max=200.0, ode=True)
    video = pipe.generate_i2v("a sunrise", image, gen)
    assert video.shape == (1, 3, 5, 32, 32)
    assert np.isfinite(video).all()


@pytest.mark.parametrize("preset,in_extra", [
    ("Wan2.1-1.3B", 0),
    ("Wan2.1-14B", 0),
    ("Wan2.2-A14B", 20),   # i2v channel-concat: 16 + 4 mask + 16 latent
])
def test_flagship_presets_eval_shape(preset, in_extra):
    """Abstract forward over the REAL presets (no params materialized):
    catches dim/head/ffn config typos in the flagship models
    (inference/modify_model.py:86-127 are the reference's numbers)."""
    cfg = wan_config(preset)
    if in_extra:
        assert cfg.in_dim == 16 + in_extra
    param_shapes = jax.eval_shape(lambda k: init_wan_params(k, cfg),
                                  jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(param_shapes))
    if "14B" in preset:
        assert 13e9 < n_params < 16e9, n_params
    else:
        assert 1.2e9 < n_params < 1.7e9, n_params

    x = jax.ShapeDtypeStruct((1, cfg.in_dim, 2, 16, 16), jnp.float32)
    t = jax.ShapeDtypeStruct((1, 1), jnp.float32)
    ctx = jax.ShapeDtypeStruct((1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    out = jax.eval_shape(
        lambda p, x, t, c: wan_forward(p, cfg, x, t, c),
        param_shapes, x, t, ctx)
    assert out.shape == (1, cfg.out_dim, 2, 16, 16)


def test_14b_sharded_forward_compiles():
    """AOT-compile the 14B forward over the 8-device mesh with abstract
    params (nothing materialized): validates that the FSDP/context shardings
    partition the real architecture."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from turbodiffusion_tpu.parallel.sharding import (
        make_mesh, param_sharding_spec, use_mesh)
    cfg = wan_config("Wan2.1-14B")
    mesh = make_mesh(MeshConfig(data=1, fsdp=4, context=2))
    param_shapes = jax.eval_shape(lambda k: init_wan_params(k, cfg),
                                  jax.random.PRNGKey(0))
    p_abstract = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, s.dtype,
            sharding=NamedSharding(mesh, param_sharding_spec(s.shape, mesh))),
        param_shapes)
    rep = NamedSharding(mesh, P())
    x = jax.ShapeDtypeStruct((1, cfg.in_dim, 2, 32, 32), jnp.float32,
                             sharding=rep)
    t = jax.ShapeDtypeStruct((1, 1), jnp.float32, sharding=rep)
    ctx = jax.ShapeDtypeStruct((1, cfg.text_len, cfg.text_dim),
                               jnp.bfloat16, sharding=rep)

    with use_mesh(mesh):
        fn = jax.jit(lambda p, x, t, c: wan_forward(p, cfg, x, t, c))
        compiled = fn.lower(p_abstract, x, t, ctx).compile()
    assert compiled is not None


def test_a14b_two_expert_memory_budget():
    """HBM budget for the mesh-resident two-expert A14B I2V (VERDICT r2 #9):
    eval_shape-level accounting of both experts + the 720p activation
    envelope on a (data=1, fsdp=4, context=2) mesh must fit 16 GB/chip with
    int8 weights — and provably must NOT in bf16, which documents why the
    sharded pipeline quantizes (pipeline.py int8 path; the reference instead
    CPU-offloads the idle expert, wan2.2_i2v_infer.py:91-94)."""
    from turbodiffusion_tpu.ops.quant import quantize_wan_blocks
    from turbodiffusion_tpu.parallel.sharding import (
        make_mesh, per_device_param_bytes)

    cfg = wan_config("Wan2.2-A14B")
    mesh = make_mesh(MeshConfig(data=1, fsdp=4, context=2))

    def build(quant):
        p = jax.eval_shape(lambda k: init_wan_params(k, cfg),
                           jax.random.PRNGKey(0))
        if quant:
            p["blocks"] = jax.eval_shape(
                lambda b: quantize_wan_blocks(b, mode="postscale"),
                p["blocks"])
        return p

    HBM = 16 * 1024 ** 3
    # 720p/81f latent grid 21x90x160 -> L = 21*45*80 tokens after (1,2,2)
    # patchify; context=2 halves the resident sequence. Envelope: ~8 live
    # (L, dim) bf16 buffers (x, qkv planes, attn out, residuals) + the
    # chunked FFN hidden cap (models/wan.py _ffn: 600 MB) + block map/LUT.
    L_local = 21 * 45 * 80 // mesh.shape["context"]
    act = 8 * L_local * cfg.dim * 2 + 600_000_000

    int8_two = 2 * per_device_param_bytes(build(True), mesh)
    bf16_two = 2 * per_device_param_bytes(build(False), mesh)

    assert int8_two + act < HBM * 0.9, (
        f"int8 two-expert budget {int8_two/2**30:.1f} GiB params + "
        f"{act/2**30:.1f} GiB activations exceeds 16 GB/chip")
    # bf16 two-expert params alone (~56 GB / 4) blow the budget: the int8
    # path is load-bearing, not an optimization
    assert bf16_two + act > HBM, bf16_two
