"""Quality-parity harness: compare this framework's generation against
dumped reference tensors, stage by stage.

The reference publishes side-by-side videos; the quantitative protocol here
pins every pipeline stage so that the moment real checkpoints/dumps are
available, parity is one command (SURVEY §4 test strategy; the reference's
own numeric tests compare per-tensor, e.g. wan2pt1_jvp_test.py).

Dump directory protocol (all .npy, channel-first, fp32):
    meta.json           {"model", "num_steps", "sigma_max", "ode",
                         "attention_type", "boundary"?}
    noise.npy           (B, 16, T, H, W)   initial latent noise
    text_emb.npy        (B, 512, text_dim) umT5 embedding (pre-DiT)
    y.npy               (B, 20, T, H, W)   i2v channel conditioning [opt]
    latent_step_XXX.npy (B, 16, T, H, W)   latent AFTER denoise step XXX
    video.npy           (B, 3, F, Hp, Wp)  decoded frames in [0, 1]

To produce dumps from the reference, hook its sampling loop and save the
same tensors (torch: `np.save(..., t.float().cpu().numpy())`).

Usage:
  # golden dumps from this framework (self-test / regression baseline):
  python -m turbodiffusion_tpu.scripts.parity dump --out_dir /tmp/golden \
      --model test --random_weights --num_steps 2

  # compare a pipeline against dumps:
  python -m turbodiffusion_tpu.scripts.parity replay --dump_dir /tmp/golden \
      --model test --random_weights

Reports per-stage MSE / PSNR / max|Δ|; exits nonzero if any stage PSNR
falls below --min_psnr (default 30 dB).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def _psnr(a: np.ndarray, b: np.ndarray, peak: float) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def _report(name: str, ours: np.ndarray, ref: np.ndarray, peak: float):
    if ours.shape != ref.shape:
        print(f"  {name:<18} SHAPE MISMATCH ours={ours.shape} ref={ref.shape}")
        return -1.0
    mse = float(np.mean((ours.astype(np.float64) - ref) ** 2))
    psnr = _psnr(ours, ref, peak)
    mad = float(np.max(np.abs(ours.astype(np.float64) - ref)))
    print(f"  {name:<18} mse={mse:.3e}  psnr={psnr:7.2f} dB  max|d|={mad:.3e}")
    return psnr


def _build_pipeline(args):
    from turbodiffusion_tpu.pipelines.pipeline import WanPipeline
    if args.dit_path is None and not args.random_weights:
        print("note: no --dit_path; running with random weights "
              "(pass --random_weights to silence)", file=sys.stderr)
    return WanPipeline.create(
        model=args.model, dit_path=args.dit_path, vae_path=args.vae_path,
        text_encoder_path=args.text_encoder_path,
        attention_type=args.attention_type, sla_topk=args.sla_topk,
        quant_linear=args.quant_linear, seed=args.seed)


def _run_stages(pipe, meta, noise, text_emb, y=None):
    """Replay the sampling loop eagerly, collecting per-step latents and the
    decoded video (same math as WanPipeline._t2v_jit / _i2v_jit)."""
    import jax
    import jax.numpy as jnp
    from turbodiffusion_tpu.pipelines.sampler import rcm_timesteps
    from turbodiffusion_tpu.models.vae import vae_decode

    num_steps = int(meta["num_steps"])
    t_steps = rcm_timesteps(num_steps, float(meta["sigma_max"]))
    boundary = float(meta.get("boundary", -1.0))
    if boundary > 0 and pipe.params_low is not None:
        pps = [pipe.params if t_steps[i] >= boundary else pipe.params_low
               for i in range(num_steps)]
    else:
        pps = [pipe.params] * num_steps
    x = jnp.asarray(noise) * t_steps[0]
    te = jnp.asarray(text_emb).astype(pipe.cfg.dtype)
    yj = None if y is None else jnp.asarray(y)
    x, lat_steps = pipe._denoise_latents(
        pps, x, te, t_steps, jax.random.PRNGKey(0), bool(meta["ode"]),
        y=yj, collect=True)
    chunk = 4 if (x.shape[2] - 1) % 4 == 0 else 1
    video = vae_decode(pipe.vae_params, x, chunk=chunk)
    video = (1.0 + jnp.clip(video, -1.0, 1.0)) / 2.0
    return [np.asarray(l) for l in lat_steps], np.asarray(video)


def cmd_dump(args):
    import jax
    import jax.numpy as jnp
    pipe = _build_pipeline(args)
    os.makedirs(args.out_dir, exist_ok=True)
    from turbodiffusion_tpu.config import VIDEO_RES_SIZE_INFO
    w, h = VIDEO_RES_SIZE_INFO[args.resolution][args.aspect_ratio]
    kn, _ = jax.random.split(jax.random.PRNGKey(args.seed))
    noise = np.asarray(jax.random.normal(
        kn, (1, 16, 1 + (args.num_frames - 1) // 4, h // 8, w // 8),
        jnp.float32))
    text_emb = np.asarray(pipe.text_encoder(args.prompt), np.float32)
    meta = {"model": args.model, "num_steps": args.num_steps,
            "sigma_max": args.sigma_max, "ode": True,
            "attention_type": args.attention_type}
    lat, video = _run_stages(pipe, meta, noise, text_emb)
    np.save(os.path.join(args.out_dir, "noise.npy"), noise)
    np.save(os.path.join(args.out_dir, "text_emb.npy"), text_emb)
    for i, l in enumerate(lat):
        np.save(os.path.join(args.out_dir, f"latent_step_{i:03d}.npy"), l)
    np.save(os.path.join(args.out_dir, "video.npy"), video)
    with open(os.path.join(args.out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    print(f"dumped {len(lat)} latent stages + video to {args.out_dir}")


def cmd_replay(args):
    with open(os.path.join(args.dump_dir, "meta.json")) as f:
        meta = json.load(f)
    noise = np.load(os.path.join(args.dump_dir, "noise.npy"))
    text_emb = np.load(os.path.join(args.dump_dir, "text_emb.npy"))
    y_path = os.path.join(args.dump_dir, "y.npy")
    y = np.load(y_path) if os.path.exists(y_path) else None

    pipe = _build_pipeline(args)
    lat, video = _run_stages(pipe, meta, noise, text_emb, y=y)

    print(f"parity vs {args.dump_dir} "
          f"(model={meta['model']}, steps={meta['num_steps']}):")
    worst = float("inf")
    ref_lats = sorted(glob.glob(os.path.join(args.dump_dir,
                                             "latent_step_*.npy")))
    for i, path in enumerate(ref_lats):
        ref = np.load(path)
        peak = float(np.max(np.abs(ref))) or 1.0
        if i < len(lat):
            worst = min(worst, _report(os.path.basename(path), lat[i], ref,
                                       peak))
    vid_path = os.path.join(args.dump_dir, "video.npy")
    if os.path.exists(vid_path):
        worst = min(worst, _report("video", video, np.load(vid_path), 1.0))

    if worst < args.min_psnr:
        print(f"FAIL: worst stage {worst:.2f} dB < {args.min_psnr} dB")
        sys.exit(1)
    print(f"PASS: worst stage {worst:.2f} dB >= {args.min_psnr} dB")


def main():
    p = argparse.ArgumentParser(description="Quality-parity harness")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--model", default="Wan2.1-1.3B")
        sp.add_argument("--dit_path", default=None)
        sp.add_argument("--vae_path", default=None)
        sp.add_argument("--text_encoder_path", default=None)
        sp.add_argument("--attention_type", default="original")
        sp.add_argument("--sla_topk", type=float, default=0.1)
        sp.add_argument("--quant_linear", action="store_true")
        sp.add_argument("--random_weights", action="store_true")
        sp.add_argument("--seed", type=int, default=0)

    d = sub.add_parser("dump", help="generate golden dumps")
    common(d)
    d.add_argument("--out_dir", required=True)
    d.add_argument("--prompt", default="a red boat on a calm lake")
    d.add_argument("--num_steps", type=int, default=4)
    d.add_argument("--sigma_max", type=float, default=80.0)
    d.add_argument("--num_frames", type=int, default=81)
    d.add_argument("--resolution", default="480p")
    d.add_argument("--aspect_ratio", default="16:9")
    d.set_defaults(fn=cmd_dump)

    r = sub.add_parser("replay", help="compare against dumps")
    common(r)
    r.add_argument("--dump_dir", required=True)
    r.add_argument("--min_psnr", type=float, default=30.0)
    r.set_defaults(fn=cmd_replay)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
