"""TurboDiffusion-TPU I2V inference CLI (Wan2.2-A14B two-expert).

Flag surface mirrors the reference (inference/wan2.2_i2v_infer.py:36-63):
two expert checkpoints, RF-time boundary switch, adaptive resolution,
ODE/SDE updates. Extra: --random_weights for checkpoint-free smoke runs.
"""

from __future__ import annotations

import argparse
import time

from einops import rearrange


def parse_arguments() -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="TurboDiffusion-TPU inference script for Wan2.2 I2V")
    p.add_argument("--high_noise_model_path", type=str, default=None)
    p.add_argument("--low_noise_model_path", type=str, default=None)
    p.add_argument("--model", choices=["Wan2.2-A14B", "test"],
                   default="Wan2.2-A14B")
    p.add_argument("--image_path", type=str, default=None)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--num_steps", type=int, choices=[1, 2, 3, 4], default=4)
    p.add_argument("--sigma_max", type=float, default=200,
                   help="Initial sigma for rCM (I2V default 200)")
    p.add_argument("--boundary", type=float, default=0.9,
                   help="RF-time boundary for the expert switch")
    p.add_argument("--vae_path", type=str, default=None)
    p.add_argument("--text_encoder_path", type=str, default=None)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--resolution", default="720p", type=str)
    p.add_argument("--aspect_ratio", default="16:9", type=str)
    p.add_argument("--adaptive_resolution", action="store_true")
    p.add_argument("--ode", action="store_true",
                   help="Use ODE updates instead of SDE re-noising")
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
    p.add_argument("--default_norm", action="store_true")
    p.add_argument("--serve", action="store_true")
    p.add_argument("--random_weights", action="store_true")
    p.add_argument("--mesh", type=str, default=None, metavar="DP,FSDP,CP",
                   help="Multi-chip mesh, e.g. 1,4,2: both A14B experts stay "
                        "resident FSDP-sharded across the slice")
    return p.parse_args()


def main():
    args = parse_arguments()

    if args.serve:
        args.mode = "i2v"
        from turbodiffusion_tpu.serve.tui import main as serve_main
        serve_main(args)
        return

    if args.prompt is None:
        raise SystemExit("--prompt is required (unless using --serve mode)")
    if args.image_path is None:
        raise SystemExit("--image_path is required (unless using --serve mode)")
    if args.high_noise_model_path is None and not args.random_weights:
        raise SystemExit("--high_noise_model_path is required "
                         "(or pass --random_weights)")

    from turbodiffusion_tpu.config import GenerationConfig
    from turbodiffusion_tpu.inference.wan2_1_t2v import parse_mesh
    from turbodiffusion_tpu.pipelines.pipeline import WanPipeline
    from turbodiffusion_tpu.utils.video_io import load_image, save_video

    pipe = WanPipeline.create(
        model=args.model if args.model != "test" else "test",
        dit_path=args.high_noise_model_path,
        low_noise_path=args.low_noise_model_path,
        vae_path=args.vae_path, text_encoder_path=args.text_encoder_path,
        attention_type=args.attention_type, sla_topk=args.sla_topk,
        sla_block=args.sla_block, v_quant=args.v_quant,
        quant_linear=args.quant_linear, seed=args.seed,
        mesh_config=parse_mesh(args.mesh))
    if args.model == "test":
        # test preset is t2v by default; switch to wan2.2-style i2v
        from turbodiffusion_tpu.config import wan_test_config
        from turbodiffusion_tpu.models.wan import init_wan_params
        import jax
        pipe.cfg = pipe.cfg.replace(arch="wan2.2", model_type="i2v", in_dim=36)
        pipe.params = init_wan_params(jax.random.PRNGKey(args.seed), pipe.cfg)
        pipe.params_low = init_wan_params(jax.random.PRNGKey(args.seed + 1),
                                          pipe.cfg)

    image = load_image(args.image_path)

    gen = GenerationConfig(
        num_steps=args.num_steps, sigma_max=args.sigma_max,
        num_frames=args.num_frames, resolution=args.resolution,
        aspect_ratio=args.aspect_ratio, seed=args.seed,
        num_samples=args.num_samples, ode=args.ode, boundary=args.boundary)

    print(f"Generating with prompt: {args.prompt}")
    t0 = time.time()
    video = pipe.generate_i2v(args.prompt, image, gen,
                              adaptive_resolution=args.adaptive_resolution)
    print(f"Generated in {time.time() - t0:.2f}s")

    grid = rearrange(video, "b c t h w -> c t h (b w)")
    out = save_video(grid, args.save_path, fps=16)
    print(f"Saved to {out}")


if __name__ == "__main__":
    main()
