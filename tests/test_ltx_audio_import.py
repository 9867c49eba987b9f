"""LTX-2 audio VAE + vocoder checkpoint import: synthesized comfy-layout
state dicts (audio_vae.* / vocoder.* keys, model_configurator.py:26-124)
-> param trees, round-tripped against init_audio_vae / init_vocoder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from turbodiffusion_tpu.models.ltx_audio import (
    AudioVAEConfig, VocoderConfig, audio_patchify, audio_unpatchify,
    audio_vae_config_from_state_dict, audio_vae_decode, audio_vae_encode,
    audio_vae_params_from_state_dict, audio_vae_test_config, init_audio_vae,
    init_vocoder, vocoder_config_from_state_dict,
    vocoder_params_from_state_dict, vocoder_synthesize, vocoder_test_config)


def _cfg(**kw):
    base = dict(ch=4, ch_mult=(1, 1, 2), z_channels=4, mel_bins=16,
                resolution=16, attn_resolutions=(8,), num_res_blocks=1)
    base.update(kw)
    return AudioVAEConfig(**base)


def _export_audio_sd(enc, dec, cfg: AudioVAEConfig):
    """Inverse of audio_vae_params_from_state_dict: comfy key layout."""
    sd = {}

    def put_conv(name, p, wrapped=True):
        key = name + (".conv" if wrapped else "")
        sd[key + ".weight"] = np.asarray(p["w"], np.float32)
        sd[key + ".bias"] = np.asarray(p["b"], np.float32)

    def put_norm(name, p):
        if p is not None:
            sd[name + ".weight"] = np.asarray(p["scale"], np.float32)
            sd[name + ".bias"] = np.asarray(p["bias"], np.float32)

    def put_res(pre, p):
        put_norm(pre + ".norm1", p["norm1"])
        put_conv(pre + ".conv1", p["conv1"])
        put_norm(pre + ".norm2", p["norm2"])
        put_conv(pre + ".conv2", p["conv2"])
        if p["nin_shortcut"] is not None:
            put_conv(pre + ".nin_shortcut", p["nin_shortcut"])

    def put_attn(pre, p):
        put_norm(pre + ".norm", p["norm"])
        for k in ("q", "k", "v", "proj_out"):
            put_conv(f"{pre}.{k}", p[k], wrapped=False)   # plain Conv2d

    def put_side(side, params, res_key):
        pre = f"audio_vae.{side}."
        put_conv(pre + "conv_in", params["conv_in"])
        put_res(pre + "mid.block_1", params["mid"]["block_1"])
        if params["mid"]["attn_1"] is not None:
            put_attn(pre + "mid.attn_1", params["mid"]["attn_1"])
        put_res(pre + "mid.block_2", params["mid"]["block_2"])
        for i, stage in enumerate(params[res_key]):
            spre = f"{pre}{res_key}.{i}"
            for j, rp in enumerate(stage["block"]):
                put_res(f"{spre}.block.{j}", rp)
            for j, ap in enumerate(stage["attn"]):
                put_attn(f"{spre}.attn.{j}", ap)
            if stage.get("upsample") is not None:
                put_conv(f"{spre}.upsample.conv", stage["upsample"])
            if stage.get("downsample") is not None:
                put_conv(f"{spre}.downsample.conv", stage["downsample"],
                         wrapped=False)   # Downsample uses a plain Conv2d
        put_norm(pre + "norm_out", params["norm_out"])
        put_conv(pre + "conv_out", params["conv_out"])

    put_side("decoder", dec, "up")
    put_side("encoder", enc, "down")
    st = dec["per_channel_statistics"]
    sd["audio_vae.per_channel_statistics.mean-of-means"] = np.asarray(
        st["mean"], np.float32)
    sd["audio_vae.per_channel_statistics.std-of-means"] = np.asarray(
        st["std"], np.float32)
    return sd


@pytest.mark.parametrize("norm_type", ["pixel", "group"])
def test_audio_vae_roundtrip(norm_type):
    cfg = _cfg(norm_type=norm_type)
    enc, dec = init_audio_vae(jax.random.PRNGKey(0), cfg)
    sd = _export_audio_sd(enc, dec, cfg)

    idec, icfg = audio_vae_params_from_state_dict(
        sd, side="decoder",
        cfg=audio_vae_config_from_state_dict(
            {k[len("audio_vae.decoder."):]: v for k, v in sd.items()
             if k.startswith("audio_vae.decoder.")} |
            {"per_channel_statistics.std-of-means":
                 sd["audio_vae.per_channel_statistics.std-of-means"]},
            resolution=cfg.resolution,
            attn_resolutions=cfg.attn_resolutions, mel_bins=cfg.mel_bins))
    assert icfg.ch == cfg.ch and icfg.ch_mult == cfg.ch_mult
    assert icfg.z_channels == cfg.z_channels
    assert icfg.norm_type == cfg.norm_type
    assert icfg.num_res_blocks == cfg.num_res_blocks

    # exact leaf equality decoder-side
    ours = jax.tree.leaves_with_path(dec)
    theirs = dict(jax.tree.leaves_with_path(idec))
    assert len(ours) == len(theirs)
    for path, leaf in ours:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(theirs[path]), str(path))

    ienc, _ = audio_vae_params_from_state_dict(sd, cfg, side="encoder")
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 9, cfg.mel_bins))
    z = audio_vae_encode(ienc, cfg, mel)
    out = audio_vae_decode(idec, icfg, z)
    assert out.shape == mel.shape
    # matches the original params bit-for-bit
    np.testing.assert_array_equal(
        np.asarray(audio_vae_decode(dec, cfg, z)), np.asarray(out))


def test_audio_config_inference_defaults():
    """Default-geometry decoder sd infers the published ddconfig."""
    cfg = AudioVAEConfig(ch=8, ch_mult=(1, 2, 4), z_channels=8, mel_bins=64,
                         num_res_blocks=2)
    _, dec = init_audio_vae(jax.random.PRNGKey(0), cfg)
    sd = _export_audio_sd(*init_audio_vae(jax.random.PRNGKey(0), cfg), cfg)
    flat = {k[len("audio_vae.decoder."):]: v for k, v in sd.items()
            if k.startswith("audio_vae.decoder.")}
    flat["per_channel_statistics.std-of-means"] = sd[
        "audio_vae.per_channel_statistics.std-of-means"]
    icfg = audio_vae_config_from_state_dict(flat)
    assert icfg.ch == 8 and icfg.ch_mult == (1, 2, 4)
    assert icfg.z_channels == 8 and icfg.num_res_blocks == 2
    assert icfg.mel_bins == 64
    assert icfg.latent_channels == 8 * 16


def test_patchify_stats_layout():
    """Per-channel stats act on (c f)-patchified tokens (ops.py:61-76)."""
    z = jnp.arange(2 * 3 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 5)
    tok = audio_patchify(z)
    assert tok.shape == (2, 4, 15)
    np.testing.assert_array_equal(np.asarray(audio_unpatchify(tok, 3)),
                                  np.asarray(z))


def _export_vocoder_sd(params, cfg: VocoderConfig):
    sd = {}

    def put(name, p):
        sd[name + ".weight"] = np.asarray(p["w"], np.float32)
        sd[name + ".bias"] = np.asarray(p["b"], np.float32)

    put("vocoder.conv_pre", params["conv_pre"])
    for i, u in enumerate(params["ups"]):
        put(f"vocoder.ups.{i}", u)
    for i, rb in enumerate(params["resblocks"]):
        for j, c in enumerate(rb["convs1"]):
            put(f"vocoder.resblocks.{i}.convs1.{j}", c)
        for j, c in enumerate(rb["convs2"]):
            put(f"vocoder.resblocks.{i}.convs2.{j}", c)
    put("vocoder.conv_post", params["conv_post"])
    return sd


def test_vocoder_roundtrip():
    cfg = vocoder_test_config()
    params = init_vocoder(jax.random.PRNGKey(0), cfg)
    sd = _export_vocoder_sd(params, cfg)
    imported, icfg = vocoder_params_from_state_dict(
        sd, vocoder_config_from_state_dict(
            {k[len("vocoder."):]: v for k, v in sd.items()},
            upsample_rates=cfg.upsample_rates,
            resblock_dilations=cfg.resblock_dilations))
    assert icfg.mel_bins == cfg.mel_bins
    assert icfg.upsample_kernel_sizes == cfg.upsample_kernel_sizes
    assert icfg.stereo == cfg.stereo

    ours = jax.tree.leaves_with_path(params)
    theirs = dict(jax.tree.leaves_with_path(imported))
    assert len(ours) == len(theirs)
    for path, leaf in ours:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(theirs[path]), str(path))

    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 6, cfg.mel_bins))
    wav = vocoder_synthesize(imported, icfg, mel)
    assert wav.shape == (1, 2, 6 * 4 * 2)


def test_vocoder_default_geometry_inference():
    """The published 24kHz vocoder geometry round-trips through shape-only
    inference (rates come from the defaults, vocoder.py:48-56)."""
    cfg = VocoderConfig(mel_bins=4, upsample_initial_channel=32)
    params = init_vocoder(jax.random.PRNGKey(2), cfg)
    sd = {k[len("vocoder."):]: v
          for k, v in _export_vocoder_sd(params, cfg).items()}
    icfg = vocoder_config_from_state_dict(sd)
    assert icfg.upsample_rates == (6, 5, 2, 2, 2)
    assert icfg.upsample_kernel_sizes == (16, 15, 8, 4, 4)
    assert icfg.resblock_kernel_sizes == (3, 7, 11)
    assert icfg.stereo
