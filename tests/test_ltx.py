"""LTX-2 AV transformer + acceleration + pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.models.ltx import (
    init_ltx_params, ltx_forward, ltx_test_config, ltx2_sigmas,
    modulate, modulated_rms_norm_from_ada, gated_residual_from_ada,
    output_modulate, rms_norm)
from turbodiffusion_tpu.models.ltx_accel import (
    AccelerationReport, apply_turbodiffusion_acceleration, effective_topk,
    fuse_attention_qkv, linear_name_in_quant_scope, parse_sla_topk_schedule,
    scheduled_sla_topk)
from turbodiffusion_tpu.pipelines.av_pipeline import (
    bidirectional_av_sample, trig_student_sigmas)


CFG = ltx_test_config()
GRID = (2, 2, 2)
LV, LA = 8, 6


@pytest.fixture(scope="module")
def ltx():
    params = init_ltx_params(jax.random.PRNGKey(0), CFG)
    v = jax.random.normal(jax.random.PRNGKey(1), (1, LV, CFG.video_in_channels))
    a = jax.random.normal(jax.random.PRNGKey(2), (1, LA, CFG.audio_in_channels))
    cap_v = jax.random.normal(jax.random.PRNGKey(3), (1, 4, CFG.caption_channels))
    cap_a = jax.random.normal(jax.random.PRNGKey(4), (1, 4, CFG.caption_channels))
    return params, v, a, cap_v, cap_a


def test_av_forward_shapes(ltx):
    params, v, a, cap_v, cap_a = ltx
    t = jnp.full((1, 1), 0.7)
    vo, ao = ltx_forward(params, CFG, v, a, t, t, cap_v, cap_a, GRID)
    assert vo.shape == (1, LV, CFG.video_out_channels)
    assert ao.shape == (1, LA, CFG.audio_out_channels)
    assert np.isfinite(np.asarray(vo)).all()
    assert np.isfinite(np.asarray(ao)).all()


def test_audio_video_coupling(ltx):
    """A2V/V2A cross attention: perturbing audio must change video output."""
    params, v, a, cap_v, cap_a = ltx
    t = jnp.full((1, 1), 0.7)
    vo1, _ = ltx_forward(params, CFG, v, a, t, t, cap_v, cap_a, GRID)
    a2 = a + 1.0
    vo2, _ = ltx_forward(params, CFG, v, a2, t, t, cap_v, cap_a, GRID)
    assert np.abs(np.asarray(vo1) - np.asarray(vo2)).max() > 1e-5


def test_fusion_helpers_match_unfused():
    """The *_from_ada fused helpers equal unfused formulas — mirrors the
    reference's test_transformer_fusion_helpers.py."""
    key = jax.random.PRNGKey(0)
    B, L, D, N = 2, 3, 8, 6
    x = jax.random.normal(key, (B, L, D))
    table = jax.random.normal(jax.random.fold_in(key, 1), (N, D))
    ts = jax.random.normal(jax.random.fold_in(key, 2), (B, 1, N * D))

    tsr = np.asarray(ts).reshape(B, 1, N, D)
    scale = np.asarray(table)[1][None, None] + tsr[:, :, 1]
    shift = np.asarray(table)[0][None, None] + tsr[:, :, 0]
    expect = np.asarray(rms_norm(x)) * (1 + scale) + shift
    got = modulated_rms_norm_from_ada(x, table, ts, scale_index=1,
                                      shift_index=0, num_ada=N)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-5, atol=2e-5)

    gate = np.asarray(table)[2][None, None] + tsr[:, :, 2]
    res = jax.random.normal(jax.random.fold_in(key, 3), (B, L, D))
    got = gated_residual_from_ada(x, res, table, ts, gate_index=2, num_ada=N)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(x) + np.asarray(res) * gate,
                               rtol=2e-5, atol=2e-5)

    # output_modulate (model.py:32-38)
    sst = jax.random.normal(jax.random.fold_in(key, 4), (2, D))
    emb = jax.random.normal(jax.random.fold_in(key, 5), (B, 1, D))
    got = output_modulate(x, sst, emb)
    vals = np.asarray(sst)[None, None] + np.asarray(emb)[:, :, None]
    expect = np.asarray(x) * (1 + vals[:, :, 1]) + vals[:, :, 0]
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-5, atol=2e-5)


def test_topk_schedule_parsing():
    """Format + selection semantics (acceleration.py:445-492; mirrors
    test_acceleration_config.py)."""
    sched = parse_sla_topk_schedule("0-15:0.35,16-31:0.3,40:0.25")
    assert scheduled_sla_topk(7, 0.5, sched) == 0.35
    assert scheduled_sla_topk(20, 0.5, sched) == 0.3
    assert scheduled_sla_topk(40, 0.5, sched) == 0.25
    assert scheduled_sla_topk(35, 0.5, sched) == 0.5
    for bad in ("3-1:0.3", "0-2:0", "0-2:1.1", "bad"):
        with pytest.raises(ValueError):
            parse_sla_topk_schedule(bad)
    assert effective_topk(0.01, 10) == 0.1


def test_quant_scopes():
    assert linear_name_in_quant_scope("blocks.0.ff.fc1", "video_ffn")
    assert not linear_name_in_quant_scope("blocks.0.audio_ff.fc1", "video_ffn")
    assert linear_name_in_quant_scope("blocks.0.audio_ff.fc1", "audio_ffn")
    assert linear_name_in_quant_scope("blocks.0.attn1.to_q", "video_heavy")
    assert not linear_name_in_quant_scope("blocks.0.attn1.to_q",
                                          "non_attention")


def test_acceleration_application(ltx):
    params, v, a, cap_v, cap_a = ltx
    t = jnp.full((1, 1), 0.7)
    base_v, base_a = ltx_forward(params, CFG, v, a, t, t, cap_v, cap_a, GRID)

    p2, attn_cfgs, report = apply_turbodiffusion_acceleration(
        params, CFG, attention_type="sla", sla_topk=1.0,
        sla_topk_schedule="0-0:0.9", w8a8_backend="postscale",
        quant_scope="ffn", fuse_qkv=True)
    assert report.attention_replaced == CFG.num_layers
    assert report.linears_quantized > 0
    assert report.qkv_fused == 4
    assert attn_cfgs[0].sla_topk == 0.9 and attn_cfgs[1].sla_topk == 1.0
    assert "to_qkv" in p2["blocks"]["attn1"]
    assert "w_int8" in p2["blocks"]["ff"]["fc1"]
    # still runs and stays in the same ballpark (topk≈1 + int8 ffn)
    v2, a2 = ltx_forward(p2, CFG, v, a, t, t, cap_v, cap_a, GRID,
                         attn_cfgs=[c.__class__(**{
                             **c.__dict__, "block_q": 4, "block_k": 4})
                             for c in attn_cfgs])
    rel = np.abs(np.asarray(v2) - np.asarray(base_v)).max() / (
        np.abs(np.asarray(base_v)).max() + 1e-9)
    assert rel < 0.35, rel


def test_ltx2_scheduler():
    s = ltx2_sigmas(8, num_tokens=2048)
    assert s[0] == 1.0 and s[-1] == 0.0
    assert np.all(np.diff(s) < 0)
    # terminal stretch: last nonzero sigma == terminal
    np.testing.assert_allclose(s[-2], 0.1, atol=1e-6)


def test_bidirectional_pipeline(ltx):
    params, v, a, cap_v, cap_a = ltx

    def gen(video, audio, sigma):
        t = jnp.full((1, 1), sigma)
        return ltx_forward(params, CFG, video, audio, t, t, cap_v, cap_a,
                           GRID)

    kv = jax.random.normal(jax.random.PRNGKey(7), (1, LV, CFG.video_in_channels))
    ka = jax.random.normal(jax.random.PRNGKey(8), (1, LA, CFG.audio_in_channels))
    for mode in ("euler", "trig", "rf"):
        vo, ao = bidirectional_av_sample(gen, kv, ka, jax.random.PRNGKey(9),
                                         num_steps=2, mode=mode)
        assert vo.shape == kv.shape and ao.shape == ka.shape
        assert np.isfinite(np.asarray(vo)).all()

    sig = trig_student_sigmas(4)
    assert len(sig) == 5 and sig[-1] == 0.0


def test_ltx_video_vae_shapes_and_roundtrip():
    """32x spatial (patch4 x space x 2*all... test cfg: 4*2*2=16x), temporal
    1+(F-1)/4 in the 3-block test config; F' = 1 + (F-1)/2^n_time."""
    from turbodiffusion_tpu.models.ltx_vae import (
        init_ltx_vae, ltx_vae_decode, ltx_vae_encode, ltx_vae_test_config)
    cfg = ltx_vae_test_config()
    enc, dec = init_ltx_vae(jax.random.PRNGKey(0), cfg)
    assert cfg.spatial_factor == 16 and cfg.temporal_factor == 4
    video = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 32, 32))
    z = ltx_vae_encode(enc, cfg, video)
    assert z.shape == (1, cfg.latent_channels, 2, 2, 2)
    assert np.isfinite(np.asarray(z)).all()
    out = ltx_vae_decode(dec, cfg, z)
    assert out.shape == (1, 3, 5, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_ltx_video_vae_causal_first_frame():
    """With decoder_causal=True, frame 0 of the decode must not depend on
    later latent frames. (The reference decoder is NON-causal by default,
    video_vae.py:430 — causality is a config choice, exercised here.)"""
    from turbodiffusion_tpu.models.ltx_vae import (
        init_ltx_vae, ltx_vae_decode, ltx_vae_test_config)
    cfg = ltx_vae_test_config(decoder_causal=True)
    _, dec = init_ltx_vae(jax.random.PRNGKey(0), cfg)
    z1 = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.latent_channels, 3, 2, 2))
    z2 = z1.at[:, :, 2:].set(0.0)
    v1 = ltx_vae_decode(dec, cfg, z1)
    v2 = ltx_vae_decode(dec, cfg, z2)
    np.testing.assert_allclose(np.asarray(v1[:, :, 0]), np.asarray(v2[:, :, 0]),
                               rtol=1e-4, atol=1e-4)


def test_audio_vae_roundtrip_shapes():
    from turbodiffusion_tpu.models.ltx_audio import (
        AudioVAEConfig, audio_vae_decode, audio_vae_encode,
        audio_vae_test_config, init_audio_vae)
    cfg = audio_vae_test_config(ch=4, ch_mult=(1, 1, 2), z_channels=4)
    enc, dec = init_audio_vae(jax.random.PRNGKey(0), cfg)
    # 9 = 2*4+1 mel frames: the causal x4 grid (decode target T_lat*4 - 3,
    # audio_vae.py:382-392)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 9, cfg.mel_bins))
    z = audio_vae_encode(enc, cfg, mel)
    assert z.shape == (1, cfg.z_channels, 3, cfg.mel_bins // 4)
    out = audio_vae_decode(dec, cfg, z)
    assert out.shape == mel.shape
    assert np.isfinite(np.asarray(out)).all()
    # 16kHz / hop 160 / x4 time downsample = 25 latent fps (ltx_wrapper.py:49)
    from turbodiffusion_tpu.models.ltx_audio import AudioVAEConfig as C
    assert C().latent_fps == 25.0


def test_vocoder_upsample_factor():
    from turbodiffusion_tpu.models.ltx_audio import (
        init_vocoder, vocoder_synthesize, vocoder_test_config)
    cfg = vocoder_test_config()
    params = init_vocoder(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 6, cfg.mel_bins))
    wav = vocoder_synthesize(params, cfg, mel)
    assert wav.shape == (1, 2, 6 * 4 * 2)   # prod(upsample_rates)
    assert np.abs(np.asarray(wav)).max() <= 1.0
    # mono input path
    mcfg = vocoder_test_config(stereo=False)
    mparams = init_vocoder(jax.random.PRNGKey(3), mcfg)
    mono = vocoder_synthesize(mparams, mcfg,
                              jax.random.normal(jax.random.PRNGKey(2),
                                                (1, 6, mcfg.mel_bins)))
    assert mono.shape == (1, 1, 48)
