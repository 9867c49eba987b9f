"""TurboDiffusion-TPU T2V inference CLI.

Flag surface mirrors the reference (inference/wan2.1_t2v_infer.py:35-55,
README.md:128-156). Extra: --random_weights for checkpoint-free smoke runs.

Usage:
  python -m turbodiffusion_tpu.inference.wan2_1_t2v \
      --dit_path ckpt.pth --prompt "..." [--num_steps 4] [--serve]
"""

from __future__ import annotations

import argparse
import time

from einops import rearrange


def parse_arguments() -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="TurboDiffusion-TPU inference script for Wan2.1 T2V")
    p.add_argument("--dit_path", type=str, default=None,
                   help="Path to the DiT checkpoint (distilled model)")
    p.add_argument("--model", choices=["Wan2.1-1.3B", "Wan2.1-14B", "test"],
                   default="Wan2.1-1.3B")
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--num_steps", type=int, choices=[1, 2, 3, 4], default=4,
                   help="1~4 for timestep-distilled inference")
    p.add_argument("--sigma_max", type=float, default=80,
                   help="Initial sigma for rCM")
    p.add_argument("--vae_path", type=str, default=None,
                   help="Path to the Wan2.1 VAE checkpoint")
    p.add_argument("--text_encoder_path", type=str, default=None,
                   help="Path to the umT5 text encoder checkpoint")
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--resolution", default="480p", type=str)
    p.add_argument("--aspect_ratio", default="16:9", type=str)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_path", type=str,
                   default="output/generated_video.mp4")
    p.add_argument("--attention_type", choices=["sla", "sagesla", "original"],
                   default="sagesla")
    p.add_argument("--sla_topk", type=float, default=0.1)
    p.add_argument("--sla_block", type=int, default=256,
                   choices=[64, 128, 256],
                   help="sparse block granularity; 256 = TPU fast default, "
                        "64/128 = reference-map parity (SLA/kernel.py:247)")
    p.add_argument("--v_quant", choices=["channel", "row"],
                   default="channel",
                   help="sagesla INT8 V granularity (channel = FP8-V analog)")
    p.add_argument("--quant_linear", action="store_true")
    p.add_argument("--default_norm", action="store_true",
                   help="Kept for reference CLI parity (norms are always "
                        "fused on TPU)")
    p.add_argument("--serve", action="store_true",
                   help="Launch interactive TUI server mode")
    p.add_argument("--random_weights", action="store_true",
                   help="Run with random weights (no checkpoints; smoke/bench)")
    p.add_argument("--mesh", type=str, default=None, metavar="DP,FSDP,CP",
                   help="Multi-chip mesh, e.g. 1,4,2: params FSDP-sharded, "
                        "sequence context-sharded (needed for 14B models)")
    return p.parse_args()


def parse_mesh(spec):
    """'dp,fsdp,cp' -> MeshConfig | None."""
    if not spec:
        return None
    from turbodiffusion_tpu.config import MeshConfig
    dp, fsdp, cp = (int(x) for x in spec.split(","))
    return MeshConfig(data=dp, fsdp=fsdp, context=cp)


def main():
    args = parse_arguments()

    if args.serve:
        args.mode = "t2v"
        from turbodiffusion_tpu.serve.tui import main as serve_main
        serve_main(args)
        return

    if args.prompt is None:
        raise SystemExit("--prompt is required (unless using --serve mode)")
    if args.dit_path is None and not args.random_weights:
        raise SystemExit("--dit_path is required (or pass --random_weights)")

    import numpy as np

    from turbodiffusion_tpu.config import GenerationConfig
    from turbodiffusion_tpu.pipelines.pipeline import WanPipeline
    from turbodiffusion_tpu.utils.video_io import save_video

    pipe = WanPipeline.create(
        model=args.model, dit_path=args.dit_path, vae_path=args.vae_path,
        text_encoder_path=args.text_encoder_path,
        attention_type=args.attention_type, sla_topk=args.sla_topk,
        sla_block=args.sla_block, v_quant=args.v_quant,
        quant_linear=args.quant_linear, seed=args.seed,
        mesh_config=parse_mesh(args.mesh))

    gen = GenerationConfig(
        num_steps=args.num_steps, sigma_max=args.sigma_max,
        num_frames=args.num_frames, resolution=args.resolution,
        aspect_ratio=args.aspect_ratio, seed=args.seed,
        num_samples=args.num_samples)

    print(f"Generating with prompt: {args.prompt}")
    t0 = time.time()
    video = pipe.generate_t2v(args.prompt, gen)        # (B, 3, T, H, W) [0,1]
    print(f"Generated in {time.time() - t0:.2f}s "
          f"(includes compile on first call)")

    grid = rearrange(video, "b c t h w -> c t h (b w)")
    out = save_video(grid, args.save_path, fps=16)
    print(f"Saved to {out}")


if __name__ == "__main__":
    main()
