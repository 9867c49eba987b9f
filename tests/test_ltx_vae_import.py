"""LTX-2 video VAE checkpoint import: synthesized torch-layout state dicts
(video_vae.py:186-243,460-522 key paths) -> param trees that run.

Covers: conv.conv weight paths, res_x blocks (res_blocks.{j}), compress_*_res
down blocks, per-channel statistics buffers (`std-of-means`/`mean-of-means`,
ops.py:71-75), decoder timestep conditioning (scale_shift_table +
last_time_embedder + timestep_scale_multiplier), and the checkpoint-config
block-list parser."""

import numpy as np
import jax
import jax.numpy as jnp

from turbodiffusion_tpu.models.ltx_vae import (
    LTXVAEConfig, init_ltx_vae, ltx_vae_config_from_blocks, ltx_vae_decode,
    ltx_vae_encode, ltx_vae_params_from_state_dict, ltx_vae_test_config)


def _conv_sd(sd, name, o, i, rng, k=(3, 3, 3)):
    sd[name + ".conv.weight"] = (rng.randn(o, i, *k) * 0.05).astype(np.float32)
    sd[name + ".conv.bias"] = np.zeros(o, np.float32)


def _res_sd(sd, pre, c_in, c_out, rng, conditioned=False):
    _conv_sd(sd, pre + ".conv1", c_out, c_in, rng)
    _conv_sd(sd, pre + ".conv2", c_out, c_out, rng)
    if c_in != c_out:
        _conv_sd(sd, pre + ".conv_shortcut", c_out, c_in, rng, k=(1, 1, 1))
    if conditioned:
        sd[pre + ".scale_shift_table"] = (
            rng.randn(4, c_in) * 0.01).astype(np.float32)


def _temb_sd(sd, pre, width, rng):
    sd[pre + ".timestep_embedder.linear_1.weight"] = (
        rng.randn(width, 256) * 0.02).astype(np.float32)
    sd[pre + ".timestep_embedder.linear_1.bias"] = np.zeros(width, np.float32)
    sd[pre + ".timestep_embedder.linear_2.weight"] = (
        rng.randn(width, width) * 0.02).astype(np.float32)
    sd[pre + ".timestep_embedder.linear_2.bias"] = np.zeros(width, np.float32)


def _synth_vae_sd(cfg: LTXVAEConfig, rng, conditioned=False):
    sd = {}
    C = cfg.latent_channels
    ps = cfg.patch_size

    # encoder
    widths, c_final = cfg.encoder_widths
    _conv_sd(sd, "encoder.conv_in", C, cfg.in_channels * ps * ps, rng)
    for i, ((kind, bc), c) in enumerate(zip(cfg.encoder_blocks, widths)):
        pre = f"encoder.down_blocks.{i}"
        if kind == "res_x":
            for j in range(bc.get("num_layers", 1)):
                _res_sd(sd, f"{pre}.res_blocks.{j}", c, c, rng)
        elif kind.endswith("_res"):
            st = {"compress_space_res": 4, "compress_time_res": 2,
                  "compress_all_res": 8}[kind]
            _conv_sd(sd, pre + ".conv",
                     c * bc.get("multiplier", 2) // st, c, rng)
    _conv_sd(sd, "encoder.conv_out", C, c_final, rng)
    for stat in ("std-of-means", "mean-of-means"):
        sd[f"encoder.per_channel_statistics.{stat}"] = (
            np.abs(rng.randn(C)) + 0.5 if "std" in stat
            else rng.randn(C) * 0.1).astype(np.float32)

    # decoder (up_blocks indexed in REVERSED config order)
    dwidths, d_final = cfg.decoder_widths
    _conv_sd(sd, "decoder.conv_in", dwidths[0], C, rng)
    for i, ((kind, bc), c) in enumerate(
            zip(tuple(reversed(cfg.decoder_blocks)), dwidths)):
        pre = f"decoder.up_blocks.{i}"
        if kind == "res_x":
            for j in range(bc.get("num_layers", 1)):
                _res_sd(sd, f"{pre}.res_blocks.{j}", c, c, rng,
                        conditioned=conditioned)
            if conditioned:
                _temb_sd(sd, pre + ".time_embedder", 4 * c, rng)
        else:
            st = {"compress_space": 4, "compress_time": 2,
                  "compress_all": 8}[kind]
            _conv_sd(sd, pre + ".conv",
                     c * st // bc.get("multiplier", 1), c, rng)
    _conv_sd(sd, "decoder.conv_out", cfg.in_channels * ps * ps, d_final, rng)
    for stat in ("std-of-means", "mean-of-means"):
        sd[f"decoder.per_channel_statistics.{stat}"] = \
            sd[f"encoder.per_channel_statistics.{stat}"]
    if conditioned:
        sd["decoder.timestep_scale_multiplier"] = np.float32(1000.0)
        _temb_sd(sd, "decoder.last_time_embedder", 2 * d_final, rng)
        sd["decoder.last_scale_shift_table"] = (
            rng.randn(2, d_final) * 0.01).astype(np.float32)
    return sd


def test_vae_import_runs_and_uses_stats():
    cfg = ltx_vae_test_config()
    rng = np.random.RandomState(0)
    sd = _synth_vae_sd(cfg, rng)
    enc, dec = ltx_vae_params_from_state_dict(sd, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(enc["per_channel_statistics"]["std"]),
        sd["encoder.per_channel_statistics.std-of-means"])

    video = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 32, 32))
    z = ltx_vae_encode(enc, cfg, video)
    assert z.shape == (1, cfg.latent_channels, 2, 2, 2)
    out = ltx_vae_decode(dec, cfg, z)
    assert out.shape == (1, 3, 5, 32, 32)
    assert np.isfinite(np.asarray(out)).all()

    # stats actually applied: doubling std-of-means halves the normalized z
    sd2 = dict(sd)
    sd2["encoder.per_channel_statistics.std-of-means"] = \
        sd["encoder.per_channel_statistics.std-of-means"] * 2
    enc2, _ = ltx_vae_params_from_state_dict(sd2, cfg, dtype=jnp.float32)
    z2 = ltx_vae_encode(enc2, cfg, video)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z) / 2, rtol=1e-4,
                               atol=1e-5)


def test_vae_import_timestep_conditioned_decoder():
    cfg = ltx_vae_test_config(timestep_conditioning=True)
    rng = np.random.RandomState(1)
    sd = _synth_vae_sd(cfg, rng, conditioned=True)
    _, dec = ltx_vae_params_from_state_dict(sd, cfg, dtype=jnp.float32)
    assert "timestep_scale_multiplier" in dec
    # res_x sits last in the reversed-processed schedule
    assert any("time_emb" in b for b in dec["blocks"])

    z = jax.random.normal(jax.random.PRNGKey(2),
                          (1, cfg.latent_channels, 2, 2, 2))
    v_default = ltx_vae_decode(dec, cfg, z)               # decode_timestep
    v_zero = ltx_vae_decode(dec, cfg, z, timestep=0.9)
    assert np.isfinite(np.asarray(v_default)).all()
    # conditioning actually changes the output
    assert float(np.abs(np.asarray(v_default) - np.asarray(v_zero)).max()) > 1e-6


def test_vae_config_from_checkpoint_blocks():
    cfg = ltx_vae_config_from_blocks(
        encoder_blocks=[["compress_space_res", {"multiplier": 2}],
                        ["res_x", 2],
                        ["compress_all_res", {"multiplier": 2}]],
        decoder_blocks=[["res_x", 1], ["compress_all", {"multiplier": 2}]],
        latent_channels=16)
    assert cfg.encoder_blocks[1] == ("res_x", {"num_layers": 2})
    assert cfg.spatial_factor == 4 * 2 * 2
    assert cfg.temporal_factor == 2
    widths, c_final = cfg.encoder_widths
    assert widths == [16, 32, 32] and c_final == 64


def test_vae_init_matches_import_topology():
    """init_ltx_vae and the importer agree on tree structure (so Orbax
    checkpoints and torch imports are interchangeable)."""
    cfg = ltx_vae_test_config()
    rng = np.random.RandomState(3)
    enc_i, dec_i = init_ltx_vae(jax.random.PRNGKey(0), cfg)
    enc_t, dec_t = ltx_vae_params_from_state_dict(
        _synth_vae_sd(cfg, rng), cfg, dtype=jnp.float32)

    def paths(tree, pre=""):
        if isinstance(tree, dict):
            return sorted(sum((paths(v, f"{pre}/{k}")
                               for k, v in tree.items()), []))
        if isinstance(tree, list):
            return sorted(sum((paths(v, f"{pre}/{i}")
                               for i, v in enumerate(tree)), []))
        return [pre] if tree is not None else []

    assert paths(enc_i) == paths(enc_t)
    assert paths(dec_i) == paths(dec_t)
