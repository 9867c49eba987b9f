"""LTX-2 AV evaluation sweep runner.

TPU analog of the reference's evaluation harness
(TurboT2AV .../ltx_distillation/tools/run_av_inference_eval.py):
prompt-file x seed sweeps, JavisBench-layout per-sample outputs
(sample_XXXX[_seedYYYY].{mp4,wav,json}, :227-307), multi-process prompt
sharding (i % num_shards == shard_id, :63-68) with a model-init flock
(:200-218), and a prompts_shard_XX.txt manifest (:601-603).

Usage:
  python -m turbodiffusion_tpu.inference.ltx_av_eval \
      --prompts_file prompts.csv --output_dir out/ --num_seeds 2 \
      --num_shards 4 --shard_id 0 [--checkpoint gen.safetensors] [...]
"""

from __future__ import annotations

import argparse
import contextlib
import csv
import json
import os
import time


def load_prompts(path: str, limit=None):
    """CSV with a prompt/caption/text column, else plaintext lines
    (run_av_inference_eval.py:43-61)."""
    with open(path, "r", encoding="utf-8-sig") as f:
        first = f.readline().strip()
        f.seek(0)
        header = next(csv.reader([first]), [])
        cols = {c.strip().lower() for c in header} & {"prompt", "caption",
                                                      "text"}
        if cols:
            reader = csv.DictReader(f)
            field = next(c for c in (reader.fieldnames or [])
                         if c.strip().lower() in cols)
            prompts = [row.get(field, "").strip() for row in reader if row]
        else:
            prompts = [line.strip() for line in f if line.strip()]
    prompts = [p for p in prompts if p]
    return prompts[:limit] if limit is not None else prompts


def selected_indices(num_prompts: int, num_shards: int, shard_id: int):
    """Round-robin prompt sharding (run_av_inference_eval.py:63-68)."""
    if num_shards < 1:
        raise ValueError("--num_shards must be >= 1")
    if not 0 <= shard_id < num_shards:
        raise ValueError("--shard_id must be in [0, num_shards)")
    return [i for i in range(num_prompts) if i % num_shards == shard_id]


@contextlib.contextmanager
def model_init_lock(lock_path, shard_id: int):
    """Exclusive flock serializing model construction across shard
    processes on one host (run_av_inference_eval.py:200-218)."""
    if lock_path is None:
        yield
        return
    import fcntl
    os.makedirs(os.path.dirname(os.path.abspath(lock_path)), exist_ok=True)
    with open(lock_path, "w", encoding="utf-8") as lf:
        print(f"[AVEval] shard={shard_id} waiting for model-init lock "
              f"{lock_path}", flush=True)
        fcntl.flock(lf, fcntl.LOCK_EX)
        print(f"[AVEval] shard={shard_id} acquired model-init lock",
              flush=True)
        try:
            yield
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
            print(f"[AVEval] shard={shard_id} released model-init lock",
                  flush=True)


def sample_stem(prompt_idx: int, seed_idx: int, num_seeds: int) -> str:
    """JavisBench stem (run_av_inference_eval.py:786-788)."""
    if num_seeds == 1:
        return f"sample_{prompt_idx:04d}"
    return f"sample_{prompt_idx:04d}_seed{seed_idx:04d}"


def save_wav(path: str, wav, sample_rate: int):
    """16-bit PCM wav via the stdlib (the reference's scipy.io.wavfile
    analog, run_av_inference_eval.py:292-307)."""
    import wave

    import numpy as np
    data = np.clip(np.asarray(wav, dtype=np.float32), -1.0, 1.0)
    if data.ndim > 1:            # (channels, samples) -> mono channel 0
        data = data[0]
    pcm16 = (data * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm16.tobytes())


def parse_args():
    p = argparse.ArgumentParser(
        description="TurboDiffusion-TPU LTX-2 AV evaluation sweep")
    p.add_argument("--prompts_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_prompts", type=int, default=None,
                   help="limit to the first N prompts")
    p.add_argument("--num_seeds", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--same_seed", action="store_true",
                   help="same seed sequence for every prompt "
                        "(run_av_inference_eval.py:779-783)")
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--shard_id", type=int, default=0)
    p.add_argument("--no_init_lock", action="store_true")
    p.add_argument("--init_lock_path", default=None)
    # geometry / sampling (ltx_t2av surface)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1792)
    p.add_argument("--num_frames", type=int, default=121)
    p.add_argument("--video_fps", type=int, default=30)
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--mode", choices=["student", "teacher"],
                   default="student")
    p.add_argument("--teacher_steps", type=int, default=40)
    p.add_argument("--stepping", choices=["euler", "trig", "rf"],
                   default="trig")
    # model / acceleration (ltx_t2av surface)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--num_layers", type=int, default=48)
    p.add_argument("--attention_type", default="original",
                   choices=["original", "sla", "sagesla"])
    p.add_argument("--sla_topk", type=float, default=0.3)
    p.add_argument("--sla_topk_schedule", default=None)
    p.add_argument("--w8a8_backend", default="none",
                   choices=["none", "postscale", "block"])
    p.add_argument("--quant_scope", default="transformer_blocks")
    p.add_argument("--fuse_qkv", action="store_true")
    p.add_argument("--gemma_checkpoint", default=None)
    p.add_argument("--gemma_tokenizer", default=None)
    p.add_argument("--skip_decode", action="store_true",
                   help="skip the VAEs/vocoder; .json records latent stats")
    return p.parse_args()


def main():
    args = parse_args()
    prompts = load_prompts(args.prompts_file, args.num_prompts)
    indices = selected_indices(len(prompts), args.num_shards, args.shard_id)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir,
                           f"prompts_shard_{args.shard_id:02d}.txt"),
              "w", encoding="utf-8") as f:
        for idx in indices:
            f.write(f"{idx}\t{prompts[idx]}\n")
    print(f"[AVEval] prompts={len(prompts)} "
          f"shard={args.shard_id}/{args.num_shards} "
          f"selected={len(indices)} num_seeds={args.num_seeds} "
          f"output={args.output_dir}", flush=True)

    lock_path = None
    if args.num_shards > 1 and not args.no_init_lock:
        lock_path = args.init_lock_path or os.path.join(
            args.output_dir, ".av_eval_model_init.lock")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from turbodiffusion_tpu.inference.ltx_t2av import latent_geometry
    from turbodiffusion_tpu.models.ltx import (
        LTXConfig, init_ltx_params, ltx_forward, ltx2_sigmas)
    from turbodiffusion_tpu.models.ltx_accel import (
        apply_turbodiffusion_acceleration)
    from turbodiffusion_tpu.pipelines.av_pipeline import (
        bidirectional_av_sample, trig_student_sigmas)

    with model_init_lock(lock_path, args.shard_id):
        ckpt_sd = None
        if args.checkpoint:
            from turbodiffusion_tpu.models.ltx import (
                ltx_params_from_state_dict)
            from turbodiffusion_tpu.utils.checkpoint import (
                load_torch_state_dict)
            print(f"loading generator from {args.checkpoint}", flush=True)
            ckpt_sd = load_torch_state_dict(args.checkpoint)
            params, cfg = ltx_params_from_state_dict(ckpt_sd)
        else:
            cfg = LTXConfig(num_layers=args.num_layers)
            params = init_ltx_params(jax.random.PRNGKey(args.seed), cfg)
        params, attn_cfgs, report = apply_turbodiffusion_acceleration(
            params, cfg, attention_type=args.attention_type,
            sla_topk=args.sla_topk,
            sla_topk_schedule=args.sla_topk_schedule,
            w8a8_backend=args.w8a8_backend, quant_scope=args.quant_scope,
            fuse_qkv=args.fuse_qkv)
        print(report, flush=True)

    grid, audio_len = latent_geometry(args.height, args.width,
                                      args.num_frames, fps=args.video_fps)
    lv = grid[0] * grid[1] * grid[2]

    if args.mode == "student":
        sigmas = trig_student_sigmas(args.num_steps)
    else:
        sigmas = ltx2_sigmas(args.teacher_steps, num_tokens=lv)

    encode = None
    if args.gemma_checkpoint:
        from turbodiffusion_tpu.models.gemma import (
            Gemma3Config, encode_text, gemma_params_from_state_dict,
            init_feature_extractor_params)
        from turbodiffusion_tpu.utils.checkpoint import (
            load_torch_state_dict)
        gcfg = Gemma3Config(hidden_size=cfg.caption_channels)
        gp = gemma_params_from_state_dict(
            load_torch_state_dict(args.gemma_checkpoint), gcfg)
        if "feature_extractor" not in gp:
            gp["feature_extractor"] = init_feature_extractor_params(
                jax.random.PRNGKey(7), gcfg)

        def encode(prompt):
            caps = {}
            from turbodiffusion_tpu.models.gemma import (
                connector_params_from_state_dict, init_connector_params)
            ch = 30 if gcfg.hidden_size % 30 == 0 else 1
            for stream in ("video", "audio"):
                pre = f"model.diffusion_model.{stream}_embeddings_connector."
                if ckpt_sd is not None and any(k.startswith(pre)
                                               for k in ckpt_sd):
                    conn = connector_params_from_state_dict(
                        {k[len(pre):]: v for k, v in ckpt_sd.items()
                         if k.startswith(pre)})
                else:
                    conn = init_connector_params(
                        jax.random.PRNGKey(hash(stream) % 97),
                        gcfg.hidden_size, heads=ch,
                        head_dim=gcfg.hidden_size // ch)
                cap, _ = encode_text(prompt, gp, conn, gcfg,
                                     tokenizer_path=args.gemma_tokenizer,
                                     heads=ch, head_dim=gcfg.hidden_size // ch)
                caps[stream] = cap.astype(jnp.bfloat16)
            return caps["video"], caps["audio"]

    @jax.jit
    def generate(params, video, audio, cap_v, cap_a, key):
        def gen(v, a, sigma):
            t = jnp.full((1, 1), sigma, jnp.float32)
            return ltx_forward(params, cfg, v, a, t, t, cap_v, cap_a, grid,
                               attn_cfgs=attn_cfgs)
        return bidirectional_av_sample(gen, video, audio, key, sigmas=sigmas,
                                       mode=args.stepping)

    # decoder stacks built once, reused per sample
    decoders = None
    if not args.skip_decode:
        from turbodiffusion_tpu.models.ltx_audio import (
            AudioVAEConfig, VocoderConfig, audio_vae_params_from_state_dict,
            init_audio_vae, init_vocoder, vocoder_params_from_state_dict)
        from turbodiffusion_tpu.models.ltx_vae import (
            LTXVAEConfig, init_ltx_vae, ltx_vae_params_from_state_dict)
        if ckpt_sd is not None and any(k.startswith("vae.decoder.")
                                       for k in ckpt_sd):
            vcfg = LTXVAEConfig()
            sub = {k[len("vae."):]: v for k, v in ckpt_sd.items()
                   if k.startswith("vae.")}
            _, vdec = ltx_vae_params_from_state_dict(sub, vcfg)
        else:
            # random-init fallback sized to the generator's latent interface
            vcfg = LTXVAEConfig(latent_channels=cfg.video_in_channels)
            _, vdec = init_ltx_vae(jax.random.PRNGKey(10), vcfg)
        if ckpt_sd is not None and any(k.startswith("audio_vae.decoder.")
                                       for k in ckpt_sd):
            adec, acfg = audio_vae_params_from_state_dict(ckpt_sd,
                                                          side="decoder")
        else:
            # z * latent_mel_bins must equal the generator's audio_in
            acfg = AudioVAEConfig(z_channels=cfg.audio_in_channels,
                                  ch_mult=(1, 2), mel_bins=2)
            _, adec = init_audio_vae(jax.random.PRNGKey(11), acfg)
        if ckpt_sd is not None and any(k.startswith("vocoder.")
                                       for k in ckpt_sd):
            voc, vocfg = vocoder_params_from_state_dict(ckpt_sd)
        else:
            vocfg = VocoderConfig(mel_bins=acfg.mel_bins)
            voc = init_vocoder(jax.random.PRNGKey(12), vocfg)
        decoders = (vdec, vcfg, adec, acfg, voc, vocfg)

    for prompt_idx in indices:
        prompt = prompts[prompt_idx]
        for seed_idx in range(args.num_seeds):
            if args.same_seed:
                seed = args.seed + seed_idx
            else:
                seed = args.seed + prompt_idx * args.num_seeds + seed_idx
            stem = sample_stem(prompt_idx, seed_idx, args.num_seeds)
            key = jax.random.PRNGKey(seed)
            kv, ka, kc, ks = jax.random.split(key, 4)
            video = jax.random.normal(kv, (1, lv, cfg.video_in_channels),
                                      jnp.float32)
            audio = jax.random.normal(ka, (1, audio_len,
                                           cfg.audio_in_channels),
                                      jnp.float32)
            if encode is not None:
                cap_v, cap_a = encode(prompt)
            else:
                # checkpoint-free caption conditioning: deterministic
                # pseudo-embedding keyed by the prompt text
                kc = jax.random.fold_in(kc, abs(hash(prompt)) % (2 ** 31))
                cap_v = jax.random.normal(kc, (1, 128, cfg.caption_channels),
                                          jnp.bfloat16)
                cap_a = cap_v
            t0 = time.perf_counter()
            vo, ao = generate(params, video, audio, cap_v, cap_a, ks)
            from turbodiffusion_tpu.utils.timing import fetch_sync
            fetch_sync((vo, ao))
            dt = time.perf_counter() - t0
            print(f"[AVEval] {stem}: prompt {prompt_idx} seed {seed} "
                  f"generated in {dt:.2f}s", flush=True)

            rec = {"index": prompt_idx, "prompt": prompt, "seed": seed,
                   "seed_idx": seed_idx, "generation_seconds": round(dt, 3)}
            if decoders is not None:
                from turbodiffusion_tpu.models.ltx_audio import (
                    audio_unpatchify, audio_vae_decode, vocoder_synthesize)
                from turbodiffusion_tpu.models.ltx_vae import (
                    ltx_vae_decode_tiled)
                from turbodiffusion_tpu.utils.video_io import save_video
                vdec, vcfg, adec, acfg, voc, vocfg = decoders
                v_lat = jnp.moveaxis(
                    vo.reshape(1, grid[0], grid[1], grid[2],
                               cfg.video_in_channels), -1, 1)
                frames = ltx_vae_decode_tiled(
                    vdec, vcfg, v_lat.astype(jnp.float32), tile=16)
                vid = np.asarray((jnp.clip(frames, -1, 1) + 1) / 2)
                mp4 = save_video(vid[0],
                                 os.path.join(args.output_dir,
                                              f"{stem}.mp4"),
                                 fps=args.video_fps)
                a_lat = audio_unpatchify(
                    ao[..., :acfg.latent_channels].astype(jnp.float32),
                    acfg.z_channels)
                mel = audio_vae_decode(adec, acfg, a_lat)
                wav = np.asarray(vocoder_synthesize(voc, vocfg, mel))
                wav_path = os.path.join(args.output_dir, f"{stem}.wav")
                # JavisBench asserts sample_XXXX.wav exists even when the
                # mp4 muxes audio (run_av_inference_eval.py:258-260)
                save_wav(wav_path, wav[0], vocfg.output_sample_rate)
                rec.update(mp4=mp4, wav=wav_path)
            else:
                rec.update(
                    video_latent_std=float(jnp.std(vo)),
                    audio_latent_std=float(jnp.std(ao)),
                    finite=bool(jnp.isfinite(vo).all()
                                & jnp.isfinite(ao).all()))
            with open(os.path.join(args.output_dir, f"{stem}.json"), "w",
                      encoding="utf-8") as f:
                json.dump(rec, f, ensure_ascii=False)
    print(f"[AVEval] shard {args.shard_id}: "
          f"{len(indices) * args.num_seeds} samples done", flush=True)


if __name__ == "__main__":
    main()
