"""LTX-2 T2AV inference / latency-eval CLI.

Reference surface: python -m ltx_distillation.tools.run_av_inference_eval
(TurboT2AV run_av_inference_eval.py: student/teacher modes, warmup + latency
benchmarking, latent shape math :71-95, student sigmas :98-109) and the
acceleration flags (--attention_type --sla_topk --sla_topk_schedule
--w8a8_backend --quant_scope --fuse_qkv, acceleration.py:1139-1196).

The headline reference metric is generator-only latency at 121 frames
1024x1792 on H20 (TurboT2AV/README.md:17-27); --benchmark reproduces that
measurement (VAE decode and Gemma encoding excluded, as in the reference).
"""

from __future__ import annotations

import argparse
import json
import time


def latent_geometry(height: int, width: int, num_frames: int, fps: float = 30.0):
    """Video VAE: 32x spatial, 8x temporal, 128ch; audio: 25 latent fps
    (run_av_inference_eval.py:71-95; ltx_wrapper.py:48-50)."""
    t_lat = 1 + (num_frames - 1) // 8
    h_lat, w_lat = height // 32, width // 32
    audio_len = max(1, int(round(num_frames / fps * 25)))
    return (t_lat, h_lat, w_lat), audio_len


def main():
    p = argparse.ArgumentParser(description="TurboDiffusion-TPU LTX-2 T2AV")
    p.add_argument("--checkpoint", default=None,
                   help="generator checkpoint (None = random weights)")
    p.add_argument("--prompt", default="a dog barking in a park")
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1792)
    p.add_argument("--num_frames", type=int, default=121)
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--mode", choices=["student", "teacher"], default="student")
    p.add_argument("--teacher_steps", type=int, default=40)
    p.add_argument("--stepping", choices=["euler", "trig", "rf"],
                   default="trig")
    p.add_argument("--attention_type", default="original",
                   choices=["original", "sla", "sagesla"])
    p.add_argument("--sla_topk", type=float, default=0.3)
    p.add_argument("--sla_topk_schedule", default=None)
    p.add_argument("--w8a8_backend", default="none",
                   choices=["none", "postscale", "block"])
    p.add_argument("--quant_scope", default="transformer_blocks")
    p.add_argument("--fuse_qkv", action="store_true")
    p.add_argument("--num_layers", type=int, default=48)
    p.add_argument("--benchmark", action="store_true",
                   help="measure generator-only latency (reference metric)")
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gemma_checkpoint", default=None,
                   help="HF Gemma-3 weights (.safetensors/.pth) for real "
                        "caption conditioning")
    p.add_argument("--gemma_tokenizer", default=None,
                   help="local tokenizer dir (offline AutoTokenizer)")
    p.add_argument("--use_gemma", action="store_true",
                   help="run the Gemma conditioning stack even without "
                        "weights (random init; smoke-tests the pipeline)")
    p.add_argument("--gemma_layers", type=int, default=None,
                   help="override Gemma depth (random-init smoke runs)")
    p.add_argument("--decode", action="store_true",
                   help="decode video+audio through the VAEs/vocoder and save "
                        "outputs (run_av_inference_eval.py decode path)")
    p.add_argument("--save_path", default="output/t2av")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from turbodiffusion_tpu.models.ltx import (
        LTXConfig, init_ltx_params, ltx_forward, ltx2_sigmas)
    from turbodiffusion_tpu.models.ltx_accel import (
        apply_turbodiffusion_acceleration)
    from turbodiffusion_tpu.pipelines.av_pipeline import (
        bidirectional_av_sample, trig_student_sigmas)

    ckpt_sd = None
    if args.checkpoint:
        # real weights: comfy-layout safetensors / .pth generator state dict
        # (reference loader: run_av_inference_eval.py:112-157 via
        # ltx_core/loader + LTXV_MODEL_COMFY_RENAMING_MAP)
        from turbodiffusion_tpu.models.ltx import ltx_params_from_state_dict
        from turbodiffusion_tpu.utils.checkpoint import load_torch_state_dict
        print(f"loading generator from {args.checkpoint}")
        ckpt_sd = load_torch_state_dict(args.checkpoint)
        params, cfg = ltx_params_from_state_dict(ckpt_sd)
        print(f"loaded LTX-2 ({cfg.num_layers} layers, video dim "
              f"{cfg.video_dim}, audio dim {cfg.audio_dim})")
    else:
        cfg = LTXConfig(num_layers=args.num_layers)
        print(f"building LTX-2 ({args.num_layers} layers, video dim "
              f"{cfg.video_dim}, audio dim {cfg.audio_dim}) — random init")
        params = init_ltx_params(jax.random.PRNGKey(args.seed), cfg)

    params, attn_cfgs, report = apply_turbodiffusion_acceleration(
        params, cfg, attention_type=args.attention_type,
        sla_topk=args.sla_topk, sla_topk_schedule=args.sla_topk_schedule,
        w8a8_backend=args.w8a8_backend, quant_scope=args.quant_scope,
        fuse_qkv=args.fuse_qkv)
    print(report)

    grid, audio_len = latent_geometry(args.height, args.width,
                                      args.num_frames)
    lv = grid[0] * grid[1] * grid[2]
    print(f"video grid {grid} -> {lv} tokens; audio {audio_len} tokens")

    key = jax.random.PRNGKey(args.seed)
    kv, ka, kc, ks = jax.random.split(key, 4)
    video = jax.random.normal(kv, (1, lv, cfg.video_in_channels), jnp.float32)
    audio = jax.random.normal(ka, (1, audio_len, cfg.audio_in_channels),
                              jnp.float32)
    if args.gemma_checkpoint or args.use_gemma:
        # real conditioning stack: tokenize -> Gemma-3 all-hidden-states ->
        # feature extractor -> embeddings connector (models/gemma.py)
        from turbodiffusion_tpu.models.gemma import (
            Gemma3Config, encode_text, gemma_params_from_state_dict,
            init_connector_params, init_feature_extractor_params,
            init_gemma_params)
        gcfg = Gemma3Config(hidden_size=cfg.caption_channels)
        if args.gemma_layers:
            import dataclasses as _dc
            gcfg = _dc.replace(gcfg, num_layers=args.gemma_layers)
        from turbodiffusion_tpu.models.gemma import (
            connector_params_from_state_dict)
        kg1, kg2, kg3 = jax.random.split(kc, 3)
        if args.gemma_checkpoint:
            from turbodiffusion_tpu.utils.checkpoint import (
                load_torch_state_dict)
            gp = gemma_params_from_state_dict(
                load_torch_state_dict(args.gemma_checkpoint), gcfg)
        else:
            gp = init_gemma_params(kg1, gcfg)
        if "feature_extractor" not in gp:
            gp["feature_extractor"] = init_feature_extractor_params(kg2, gcfg)
        ch = 30 if gcfg.hidden_size % 30 == 0 else 1   # connector 30x128
        # the video/audio connectors ship INSIDE the generator checkpoint
        # (model.diffusion_model.{video,audio}_embeddings_connector.*,
        # av_encoder.py:102-106)
        conns = {}
        for stream in ("video", "audio"):
            pre = f"{stream}_embeddings_connector."
            if ckpt_sd is not None and any(
                    k.startswith("model.diffusion_model." + pre)
                    for k in ckpt_sd):
                sub = {k.split(pre, 1)[1]: v for k, v in ckpt_sd.items()
                       if ("model.diffusion_model." + pre) in k}
                conns[stream] = connector_params_from_state_dict(sub)
            else:
                conns[stream] = init_connector_params(
                    jax.random.fold_in(kg3, hash(stream) % 97),
                    gcfg.hidden_size, heads=ch,
                    head_dim=gcfg.hidden_size // ch)
        caps = {}
        for stream in ("video", "audio"):
            caps[stream], _ = encode_text(
                args.prompt, gp, conns[stream], gcfg,
                tokenizer_path=args.gemma_tokenizer,
                heads=ch, head_dim=gcfg.hidden_size // ch)
            caps[stream] = caps[stream].astype(jnp.bfloat16)
        cap_v, cap_a = caps["video"], caps["audio"]
        print(f"Gemma conditioning: caption context {cap_v.shape}")
    else:
        # random caption embeddings (checkpoint-free benchmark mode)
        cap_v = jax.random.normal(kc, (1, 128, cfg.caption_channels),
                                  jnp.bfloat16)
        cap_a = cap_v

    if args.mode == "student":
        sigmas = trig_student_sigmas(args.num_steps)
    else:
        sigmas = ltx2_sigmas(args.teacher_steps, num_tokens=lv)

    @jax.jit
    def generate(params, video, audio, key):
        def gen(v, a, sigma):
            t = jnp.full((1, 1), sigma, jnp.float32)
            return ltx_forward(params, cfg, v, a, t, t, cap_v, cap_a, grid,
                               attn_cfgs=attn_cfgs)
        return bidirectional_av_sample(gen, video, audio, key, sigmas=sigmas,
                                       mode=args.stepping)

    from turbodiffusion_tpu.utils.timing import fetch_sync
    t0 = time.time()
    vo, ao = generate(params, video, audio, ks)
    fetch_sync((vo, ao))
    print(f"compile+first generation: {time.time()-t0:.1f}s")

    if args.benchmark:
        for _ in range(args.warmup):
            fetch_sync(generate(params, video, audio, ks))
        t0 = time.perf_counter()
        vo, ao = generate(params, video, audio, ks)
        fetch_sync((vo, ao))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "ltx2_t2av_generator_only",
            "num_layers": args.num_layers,
            "steps": len(sigmas) - 1,
            "video_tokens": lv,
            "audio_tokens": audio_len,
            "value": round(dt, 4), "unit": "s",
        }))
    print("video out:", vo.shape, "audio out:", ao.shape,
          "finite:", bool(jnp.isfinite(vo).all() & jnp.isfinite(ao).all()))

    if args.decode:
        # _decode_and_save_sample analog (run_av_inference_eval.py:227-307):
        # video latent -> frames via the video VAE; audio latent -> mel via
        # the audio VAE -> waveform via the vocoder. Random-weight VAEs here
        # until checkpoint configs exist; the plumbing is the deliverable.
        import numpy as np
        from turbodiffusion_tpu.models.ltx_audio import (
            AudioVAEConfig, audio_unpatchify, audio_vae_decode,
            audio_vae_params_from_state_dict, init_audio_vae, init_vocoder,
            VocoderConfig, vocoder_params_from_state_dict,
            vocoder_synthesize)
        from turbodiffusion_tpu.models.ltx_vae import (
            LTXVAEConfig, init_ltx_vae, ltx_vae_decode_tiled,
            ltx_vae_params_from_state_dict)
        from turbodiffusion_tpu.utils.video_io import save_video

        vcfg = LTXVAEConfig()
        if ckpt_sd is not None and any(k.startswith("vae.decoder.")
                                       for k in ckpt_sd):
            sub = {k[len("vae."):]: v for k, v in ckpt_sd.items()
                   if k.startswith("vae.")}
            _, vdec = ltx_vae_params_from_state_dict(sub, vcfg)
            print("video VAE decoder loaded from checkpoint")
        else:
            _, vdec = init_ltx_vae(jax.random.PRNGKey(10), vcfg)
        v_lat = jnp.moveaxis(vo.reshape(1, grid[0], grid[1], grid[2],
                                        cfg.video_in_channels), -1, 1)
        frames = ltx_vae_decode_tiled(vdec, vcfg, v_lat.astype(jnp.float32),
                                      tile=16)
        video = np.asarray((jnp.clip(frames, -1, 1) + 1) / 2)
        vp = save_video(video[0], args.save_path + ".mp4", fps=30)
        print(f"video decoded {video.shape} -> {vp}")

        if ckpt_sd is not None and any(k.startswith("audio_vae.decoder.")
                                       for k in ckpt_sd):
            adec, acfg = audio_vae_params_from_state_dict(ckpt_sd,
                                                          side="decoder")
            print("audio VAE decoder loaded from checkpoint")
        else:
            acfg = AudioVAEConfig()
            _, adec = init_audio_vae(jax.random.PRNGKey(11), acfg)
        # transformer audio tokens are the patchified (c f) latent
        # (patchifiers.py:282-302); fold them back to (B, z, T, F_lat)
        a_lat = audio_unpatchify(ao[..., :acfg.latent_channels].astype(
            jnp.float32), acfg.z_channels)
        mel = audio_vae_decode(adec, acfg, a_lat)
        if ckpt_sd is not None and any(k.startswith("vocoder.")
                                       for k in ckpt_sd):
            voc, vocfg = vocoder_params_from_state_dict(ckpt_sd)
            print("vocoder loaded from checkpoint")
        else:
            vocfg = VocoderConfig()
            voc = init_vocoder(jax.random.PRNGKey(12), vocfg)
        # mel from the audio VAE is (B, 2, T_mel, mel_bins) — the vocoder's
        # stereo input layout already
        wav = np.asarray(vocoder_synthesize(voc, vocfg, mel))
        import wave, struct
        wav16 = (np.clip(wav[0, 0], -1, 1) * 32767).astype(np.int16)
        with wave.open(args.save_path + ".wav", "wb") as f:
            f.setnchannels(1); f.setsampwidth(2)
            f.setframerate(vocfg.output_sample_rate)
            f.writeframes(wav16.tobytes())
        print(f"audio decoded {wav.shape} -> {args.save_path}.wav")


if __name__ == "__main__":
    main()
