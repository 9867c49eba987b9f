"""LTX-2 generator checkpoint import: synthesized reference-layout state
dicts (ltx_core model.py:135-176, transformer.py:110-178, attention.py:166-173)
-> param trees, round-tripped against init_ltx_params.

Pattern follows tests/test_ltx_vae_import.py: synthesize the torch key
layout, import, verify exact round trip + a running forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from turbodiffusion_tpu.models.ltx import (
    LTXConfig, init_ltx_params, ltx_config_from_state_dict, ltx_forward,
    ltx_params_from_state_dict, ltx_test_config, strip_comfy_prefix)


def _cfg():
    # head dims must be the real 128/64 (the importer infers heads from them)
    return ltx_test_config(
        video_heads=1, video_head_dim=128, audio_heads=1, audio_head_dim=64,
        cross_attention_dim=128, audio_cross_attention_dim=64,
        caption_channels=32, dtype=jnp.float32)


def _export_state_dict(params, cfg: LTXConfig, with_proj_l=False):
    """Inverse of ltx_params_from_state_dict: our pytree -> torch key layout."""
    sd = {}

    def put_lin(name, p):
        sd[name + ".weight"] = np.asarray(p["w"], np.float32).T
        if "b" in p:
            sd[name + ".bias"] = np.asarray(p["b"], np.float32)

    def put_adaln(name, p):
        put_lin(name + ".emb.timestep_embedder.linear_1", p["emb_fc1"])
        put_lin(name + ".emb.timestep_embedder.linear_2", p["emb_fc2"])
        put_lin(name + ".linear", p["linear"])

    def put_attn(pre, p, proj_l_key=None):
        put_lin(pre + ".to_q", p["to_q"])
        put_lin(pre + ".to_k", p["to_k"])
        put_lin(pre + ".to_v", p["to_v"])
        put_lin(pre + ".to_out.0", p["to_out"])
        sd[pre + ".q_norm.weight"] = np.asarray(p["q_norm"], np.float32)
        sd[pre + ".k_norm.weight"] = np.asarray(p["k_norm"], np.float32)
        if proj_l_key is not None:
            dh = p["to_q"]["w"].shape[1]
            sd[proj_l_key + ".weight"] = np.eye(dh, dtype=np.float32) * 0.1
            sd[proj_l_key + ".bias"] = np.zeros(dh, np.float32)

    put_lin("patchify_proj", params["patchify_proj"])
    put_lin("audio_patchify_proj", params["audio_patchify_proj"])
    put_adaln("adaln_single", params["adaln_single"])
    put_adaln("audio_adaln_single", params["audio_adaln_single"])
    put_adaln("av_ca_video_scale_shift_adaln_single", params["av_ca_video_ss"])
    put_adaln("av_ca_audio_scale_shift_adaln_single", params["av_ca_audio_ss"])
    put_adaln("av_ca_a2v_gate_adaln_single", params["av_ca_a2v_gate"])
    put_adaln("av_ca_v2a_gate_adaln_single", params["av_ca_v2a_gate"])
    put_lin("caption_projection.linear_1", params["caption_projection"]["fc1"])
    put_lin("caption_projection.linear_2", params["caption_projection"]["fc2"])
    put_lin("audio_caption_projection.linear_1",
            params["audio_caption_projection"]["fc1"])
    put_lin("audio_caption_projection.linear_2",
            params["audio_caption_projection"]["fc2"])
    sd["scale_shift_table"] = np.asarray(params["scale_shift_table"],
                                         np.float32)
    sd["audio_scale_shift_table"] = np.asarray(
        params["audio_scale_shift_table"], np.float32)
    put_lin("proj_out", params["proj_out"])
    put_lin("audio_proj_out", params["audio_proj_out"])

    for i in range(cfg.num_layers):
        blk = jax.tree.map(lambda x: x[i], params["blocks"])
        pre = f"transformer_blocks.{i}"
        put_attn(pre + ".attn1", blk["attn1"],
                 proj_l_key=(pre + ".attn1.attention_function.local_attn."
                             "proj_l") if with_proj_l and i == 0 else None)
        put_attn(pre + ".attn2", blk["attn2"])
        put_lin(pre + ".ff.net.0.proj", blk["ff"]["fc1"])
        put_lin(pre + ".ff.net.2", blk["ff"]["fc2"])
        sd[pre + ".scale_shift_table"] = np.asarray(
            blk["scale_shift_table"], np.float32)
        put_attn(pre + ".audio_attn1", blk["audio_attn1"])
        put_attn(pre + ".audio_attn2", blk["audio_attn2"])
        put_lin(pre + ".audio_ff.net.0.proj", blk["audio_ff"]["fc1"])
        put_lin(pre + ".audio_ff.net.2", blk["audio_ff"]["fc2"])
        sd[pre + ".audio_scale_shift_table"] = np.asarray(
            blk["audio_scale_shift_table"], np.float32)
        put_attn(pre + ".audio_to_video_attn", blk["audio_to_video_attn"])
        put_attn(pre + ".video_to_audio_attn", blk["video_to_audio_attn"])
        sd[pre + ".scale_shift_table_a2v_ca_video"] = np.asarray(
            blk["scale_shift_table_a2v_ca_video"], np.float32)
        sd[pre + ".scale_shift_table_a2v_ca_audio"] = np.asarray(
            blk["scale_shift_table_a2v_ca_audio"], np.float32)
    return sd


def test_roundtrip_exact():
    cfg = _cfg()
    params = init_ltx_params(jax.random.PRNGKey(0), cfg)
    sd = _export_state_dict(params, cfg)
    imported, icfg = ltx_params_from_state_dict(sd, dtype=jnp.float32)

    assert icfg.num_layers == cfg.num_layers
    assert icfg.video_heads == cfg.video_heads
    assert icfg.audio_heads == cfg.audio_heads
    assert icfg.caption_channels == cfg.caption_channels

    ours = jax.tree.leaves_with_path(params)
    theirs = dict(jax.tree.leaves_with_path(imported))
    assert len(ours) == len(theirs)
    for path, leaf in ours:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(theirs[path]), str(path))


def test_comfy_prefix_and_config_inference():
    cfg = _cfg()
    params = init_ltx_params(jax.random.PRNGKey(1), cfg)
    sd = _export_state_dict(params, cfg)
    comfy = {"model.diffusion_model." + k: v for k, v in sd.items()}
    comfy["vae.decoder.conv_in.conv.weight"] = np.zeros((1,), np.float32)
    stripped = strip_comfy_prefix(comfy)
    assert "patchify_proj.weight" in stripped
    assert not any("vae." in k for k in stripped)
    icfg = ltx_config_from_state_dict(stripped)
    assert icfg.num_layers == cfg.num_layers
    assert icfg.video_in_channels == cfg.video_in_channels
    assert icfg.audio_cross_attention_dim == cfg.audio_cross_attention_dim

    imported, icfg = ltx_params_from_state_dict(comfy, cfg,
                                                dtype=jnp.float32)
    video = jnp.ones((1, 8, cfg.video_in_channels), jnp.float32)
    audio = jnp.ones((1, 4, cfg.audio_in_channels), jnp.float32)
    cap_v = jnp.ones((1, 6, cfg.caption_channels), jnp.float32)
    t = jnp.full((1, 1), 0.5, jnp.float32)
    vo, ao = ltx_forward(imported, icfg, video, audio, t, t, cap_v, cap_v,
                         (2, 2, 2))
    assert vo.shape == (1, 8, cfg.video_out_channels)
    assert ao.shape == (1, 4, cfg.audio_out_channels)
    assert bool(jnp.isfinite(vo).all() & jnp.isfinite(ao).all())


def test_proj_l_uniformized_for_scan():
    """An SLA-finetuned checkpoint may carry proj_l on only some layers; the
    importer must zero-fill the rest so blocks scan-stack."""
    cfg = _cfg()
    params = init_ltx_params(jax.random.PRNGKey(2), cfg)
    sd = _export_state_dict(params, cfg, with_proj_l=True)
    imported, _ = ltx_params_from_state_dict(sd, cfg, dtype=jnp.float32)
    pl = imported["blocks"]["attn1"]["proj_l"]
    assert pl["w"].shape == (cfg.num_layers, cfg.video_head_dim,
                             cfg.video_head_dim)
    np.testing.assert_allclose(np.asarray(pl["w"][0]),
                               np.eye(cfg.video_head_dim) * 0.1, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(pl["w"][1]), 0.0)


def test_corruption_detected():
    cfg = _cfg()
    params = init_ltx_params(jax.random.PRNGKey(3), cfg)
    sd = _export_state_dict(params, cfg)
    del sd["transformer_blocks.0.attn1.to_q.weight"]
    with pytest.raises(KeyError):
        ltx_params_from_state_dict(sd, cfg)
