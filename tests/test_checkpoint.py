"""Checkpoint mapping tests: export -> import round trip preserves the model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.config import AttentionConfig, wan_test_config
from turbodiffusion_tpu.models.wan import init_wan_params, wan_forward
from turbodiffusion_tpu.utils.checkpoint import (
    merge_models, strip_prefix, wan_params_from_state_dict,
    wan_state_dict_from_params)


def _forward(params, cfg):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 2, 4, 4))
    t = jnp.full((1, 1), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg.text_len, cfg.text_dim))
    return wan_forward(params, cfg, x, t, ctx)


def test_wan_roundtrip_t2v():
    cfg = wan_test_config()
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    params["head"]["head"]["w"] = jnp.ones_like(params["head"]["head"]["w"]) * 0.01
    sd = wan_state_dict_from_params(params, cfg)
    # reference naming spot checks (wan2pt1.py module tree)
    assert "blocks.0.self_attn.q.weight" in sd
    assert "blocks.1.ffn.2.bias" in sd
    assert sd["blocks.0.modulation"].shape == (1, 6, cfg.dim)
    re = wan_params_from_state_dict(sd, cfg)
    o1 = _forward(params, cfg)
    o2 = _forward(re, cfg)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)


def test_wan_roundtrip_i2v_with_sla():
    cfg = wan_test_config(
        arch="wan2.1", model_type="i2v",
        attention=AttentionConfig(backend="sla", sla_topk=0.5,
                                  block_q=8, block_k=8))
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    sd = wan_state_dict_from_params(params, cfg)
    assert "blocks.0.self_attn.attn_op.local_attn.proj_l.weight" in sd
    assert "blocks.0.cross_attn.k_img.weight" in sd
    assert "img_emb.proj.1.weight" in sd
    re = wan_params_from_state_dict(sd, cfg)
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        params, re)


def test_missing_proj_l_defaults_to_zero():
    """Loading a non-SLA checkpoint into an SLA model must zero-init proj_l
    (modify_model.py loads with replace_attention before load_state_dict)."""
    cfg_dense = wan_test_config()
    params = init_wan_params(jax.random.PRNGKey(0), cfg_dense)
    sd = wan_state_dict_from_params(params, cfg_dense)
    cfg_sla = wan_test_config(attention=AttentionConfig(
        backend="sla", sla_topk=0.5, block_q=8, block_k=8))
    re = wan_params_from_state_dict(sd, cfg_sla)
    assert np.abs(np.asarray(re["blocks"]["self_attn"]["proj_l"]["w"])).max() == 0


def test_strip_prefix_net():
    sd = {"net.a": 1, "net.b": 2}
    assert strip_prefix(sd) == {"a": 1, "b": 2}
    assert strip_prefix({"x": 3}) == {"x": 3}
    # EMA weights win when both prefixes exist (dcp_to_pth.py:36-46)
    both = {"net.a": 1, "net_ema.a": 10, "net.b": 2, "net_ema.b": 20}
    assert strip_prefix(both) == {"a": 10, "b": 20}


def test_merge_models_task_arithmetic():
    """base + w*(target - diffbase) (merge_models.py:6-60)."""
    base = {"w": jnp.ones(3)}
    tgt = {"w": jnp.ones(3) * 5}
    dbase = {"w": jnp.ones(3) * 2}
    out = merge_models(base, tgt, dbase, weight=0.5)
    np.testing.assert_allclose(np.asarray(out["w"]), 1 + 0.5 * 3)


def test_quantized_linear_roundtrip():
    from turbodiffusion_tpu.ops.quant import quantize_linear_params
    cfg = wan_test_config(quant_linear=True)
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    # quantize all block linears (as the offline quantize CLI does)
    blocks = params["blocks"]
    for path in (("self_attn", "v"), ("ffn", "fc1")):
        node = blocks
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = quantize_linear_params(node[path[-1]], mode="block")
    sd = wan_state_dict_from_params(params, cfg)
    assert "blocks.0.self_attn.v.int8_weight" in sd
    assert sd["blocks.0.self_attn.v.int8_weight"].dtype == np.int8
    re = wan_params_from_state_dict(sd, cfg)
    # v is not rope-permuted -> exact int8 roundtrip; q goes through a
    # dequant/requant permutation in the tiny (head-straddling) config, so
    # compare dequantized values there.
    np.testing.assert_array_equal(
        np.asarray(re["blocks"]["self_attn"]["v"]["w_int8"]),
        np.asarray(blocks["self_attn"]["v"]["w_int8"]))
