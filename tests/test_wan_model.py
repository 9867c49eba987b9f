"""Wan DiT model tests: shapes, dtype islands, sampler math, i2v branches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.config import wan_test_config, AttentionConfig
from turbodiffusion_tpu.models.wan import (
    init_wan_params, wan_forward, patchify, unpatchify)
from turbodiffusion_tpu.pipelines.sampler import rcm_timesteps, rcm_sample


def _tiny_inputs(cfg, B=1, T=2, H=4, W=4, key=0):
    k = jax.random.PRNGKey(key)
    k1, k2, k3 = jax.random.split(k, 3)
    x = jax.random.normal(k1, (B, 16, T, H, W), jnp.float32)
    t = jnp.full((B, 1), 800.0, jnp.float32)
    ctx = jax.random.normal(k2, (B, cfg.text_len, cfg.text_dim), jnp.float32)
    return x, t, ctx


def test_forward_shape_t2v():
    cfg = wan_test_config()
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    x, t, ctx = _tiny_inputs(cfg)
    out = wan_forward(params, cfg, x, t, ctx)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_patchify_unpatchify_layouts():
    """Reference layouts are asymmetric: patchify flattens (c kt kh kw)
    (wan2pt1.py:654-660) while unpatchify expects (kt kh kw d) from the head
    (wan2pt1.py:710-721)."""
    from einops import rearrange
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 4, 8, 8))
    p = patchify(x, (1, 2, 2))
    assert p.shape == (2, 4 * 4 * 4, 16 * 4)
    # unpatchify inverts the head-layout rearrange
    h = rearrange(x, "b d (t kt) (h kh) (w kw) -> b (t h w) (kt kh kw d)",
                  kt=1, kh=2, kw=2)
    x2 = unpatchify(h, 4, 4, 4, (1, 2, 2), 16)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-6)


def test_patchify_channel_order_matches_reference():
    """(c kt kh kw) flattening: channel-major then patch offsets
    (wan2pt1.py:654-660)."""
    x = jnp.arange(16 * 2 * 2, dtype=jnp.float32).reshape(1, 16, 1, 2, 2)
    p = patchify(x, (1, 2, 2))  # (1, 1, 64)
    expect = np.asarray(x).reshape(16, 4).reshape(-1)  # c-major, then kh,kw
    np.testing.assert_array_equal(np.asarray(p)[0, 0], expect)


def test_zero_head_init_gives_zero_velocity():
    """Reference zero-inits the output head (wan2pt1.py:755-758); forward of a
    fresh model must emit exactly zero velocity."""
    cfg = wan_test_config()
    params = init_wan_params(jax.random.PRNGKey(1), cfg)
    x, t, ctx = _tiny_inputs(cfg)
    out = wan_forward(params, cfg, x, t, ctx)
    assert np.abs(np.asarray(out)).max() == 0.0


def test_i2v_channel_concat_wan22():
    cfg = wan_test_config(arch="wan2.2", model_type="i2v", in_dim=36)
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    x, t, ctx = _tiny_inputs(cfg)
    y = jax.random.normal(jax.random.PRNGKey(5), (1, 20, 2, 4, 4), jnp.float32)
    out = wan_forward(params, cfg, x, t, ctx, y_B_C_T_H_W=y)
    assert out.shape == (1, 16, 2, 4, 4)


def test_i2v_clip_branch_wan21():
    cfg = wan_test_config(arch="wan2.1", model_type="i2v")
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    assert "img_emb" in params
    x, t, ctx = _tiny_inputs(cfg)
    clip = jax.random.normal(jax.random.PRNGKey(7), (1, 257, 1280), jnp.float32)
    out = wan_forward(params, cfg, x, t, ctx, frame_cond_crossattn_emb=clip)
    assert out.shape == x.shape


def test_sla_backend_runs():
    cfg = wan_test_config(attention=AttentionConfig(backend="sla", sla_topk=0.5,
                                                    block_q=8, block_k=8))
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    assert "proj_l" in params["blocks"]["self_attn"]
    x, t, ctx = _tiny_inputs(cfg)
    out = wan_forward(params, cfg, x, t, ctx)
    assert np.isfinite(np.asarray(out)).all()


def test_rcm_timestep_schedule():
    """Exact schedule math vs the reference formula
    (wan2.1_t2v_infer.py:111-122)."""
    import math
    ts = np.asarray(rcm_timesteps(4, 80.0))
    raw = [math.atan(80.0), 1.5, 1.4, 1.0, 0.0]
    expect = [math.sin(t) / (math.cos(t) + math.sin(t)) for t in raw]
    np.testing.assert_allclose(ts, expect, rtol=1e-6)
    # 1-step schedule keeps only [atan(sigma_max), 0]
    ts1 = np.asarray(rcm_timesteps(1, 80.0))
    assert len(ts1) == 2 and ts1[-1] == 0.0


def test_rcm_sampler_converges_on_linear_model():
    """With a perfect velocity oracle v = (x - x0)/t for RF, the ODE sampler
    recovers x0 in one step from any t."""
    x0 = jnp.ones((1, 4, 2, 4, 4)) * 0.37

    def oracle(x, t, i):
        return (x - x0 * (1 - t)) / jnp.maximum(t, 1e-6) - x0 * 0  # RF: x_t = (1-t)x0 + t*eps => v = eps - x0
    # Use proper RF algebra: x_t = (1-t) x0 + t n, v = n - x0 = (x_t - x0)/t
    def oracle2(x, t, i):
        return (x - x0) / jnp.maximum(t, 1e-9)

    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    out = rcm_sample(oracle2, noise, jax.random.PRNGKey(1), num_steps=1,
                     sigma_max=80.0, ode=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=2e-2)


def test_forward_jit_and_grad():
    cfg = wan_test_config()
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    # overwrite zero head so grads flow
    params["head"]["head"]["w"] = jnp.ones_like(params["head"]["head"]["w"]) * 0.01
    x, t, ctx = _tiny_inputs(cfg)

    @jax.jit
    def loss(p):
        out = wan_forward(p, cfg, x, t, ctx)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_flf2v_emb_pos_branch():
    """flf2v: zero-init emb_pos exists, shifts the CLIP branch when nonzero,
    and pairs stacked on batch merge to (…, 514, 1280)
    (wan2pt1.py:457-486, FIRST_LAST_FRAME_CONTEXT_TOKEN_NUMBER=514)."""
    cfg = wan_test_config(arch="wan2.1", model_type="flf2v")
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    assert params["img_emb"]["emb_pos"].shape == (1, 514, 1280)

    x, t, ctx = _tiny_inputs(cfg)
    clip = jax.random.normal(jax.random.PRNGKey(7), (1, 514, 1280),
                             jnp.float32)
    out0 = wan_forward(params, cfg, x, t, ctx, frame_cond_crossattn_emb=clip)
    # zero-init emb_pos: identical to the plain i2v MLPProj output
    p_no = {k: v for k, v in params.items()}
    p_no["img_emb"] = {k: v for k, v in params["img_emb"].items()
                       if k != "emb_pos"}
    out_plain = wan_forward(p_no, cfg, x, t, ctx,
                            frame_cond_crossattn_emb=clip)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)
    # nonzero emb_pos changes the projected image context (the model head
    # is zero-init, so compare at the MLPProj level)
    from turbodiffusion_tpu.models.wan import _img_emb
    e0 = _img_emb(params["img_emb"], clip)
    params["img_emb"]["emb_pos"] = params["img_emb"]["emb_pos"] + 0.5
    e1 = _img_emb(params["img_emb"], clip)
    assert float(np.abs(np.asarray(e1) - np.asarray(e0)).max()) > 1e-6

    # first/last pairs stacked on batch: (2, 257, d) merges to (1, 514, d)
    pair = jax.random.normal(jax.random.PRNGKey(8), (2, 257, 1280),
                             jnp.float32)
    merged = _img_emb(params["img_emb"], pair)
    assert merged.shape[0] == 1 and merged.shape[1] == 514


def test_flf2v_state_dict_roundtrip():
    from turbodiffusion_tpu.utils.checkpoint import (
        wan_params_from_state_dict, wan_state_dict_from_params)
    cfg = wan_test_config(arch="wan2.1", model_type="flf2v")
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    params["img_emb"]["emb_pos"] = params["img_emb"]["emb_pos"] + 0.25
    sd = wan_state_dict_from_params(params, cfg)
    assert "img_emb.emb_pos" in sd
    re = wan_params_from_state_dict(sd, cfg)
    np.testing.assert_allclose(np.asarray(re["img_emb"]["emb_pos"]),
                               np.asarray(params["img_emb"]["emb_pos"]))


def test_remat_modes_match_gradients():
    """All SAC modes (reference selective_activation_checkpoint.py:26-59)
    must produce identical loss and gradients — remat changes what is saved,
    never the math. Covers the new self_attn_only mode (r5)."""
    import dataclasses
    cfg = wan_test_config()
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    params["head"]["head"]["w"] = jnp.ones_like(
        params["head"]["head"]["w"]) * 0.01
    x, t, ctx = _tiny_inputs(cfg)

    def make_loss(c):
        def loss(p):
            return jnp.mean(wan_forward(p, c, x, t, ctx) ** 2)
        return loss

    l0, g0 = jax.value_and_grad(make_loss(cfg))(params)
    for mode in ("mm_only", "attn_only", "self_attn_only", "full"):
        c = dataclasses.replace(cfg, remat=mode)
        l1, g1 = jax.jit(jax.value_and_grad(make_loss(c)))(params)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
            g0, g1)
