"""Interactive TUI server: models stay resident, prompts generate videos.

Reference: serve/tui.py:241, serve/pipeline.py, serve/utils.py:6-11 —
prompt_toolkit + rich REPL with slash commands /help /show /set /reset /quit
and runtime-mutable params {num_steps, num_samples, num_frames, sigma_max}.
Reachable via `turbodiffusion-serve` or `--serve` on the inference CLIs
(wan2.1_t2v_infer.py:62-67).

TPU bonus over the reference: generation is jitted per (shape, steps)
signature, so after the first request at a given setting, subsequent prompts
skip compilation entirely.
"""

from __future__ import annotations

import dataclasses
import os
import time

# Runtime-adjustable parameters (serve/utils.py:6-11)
RUNTIME_PARAMS = {
    "num_steps": {"type": int, "choices": [1, 2, 3, 4]},
    "num_samples": {"type": int, "min": 1},
    "num_frames": {"type": int, "min": 1},
    "sigma_max": {"type": float, "min": 0.1},
    "seed": {"type": int, "min": 0},
}

HELP = """Commands:
  /help            show this help
  /show            show current configuration
  /set KEY VALUE   set a runtime parameter {num_steps,num_samples,num_frames,sigma_max,seed}
  /reset           reset runtime parameters to launch values
  /quit            exit
Anything else is treated as a prompt and generates a video."""


def _validate(key: str, raw: str):
    spec = RUNTIME_PARAMS[key]
    val = spec["type"](raw)
    if "choices" in spec and val not in spec["choices"]:
        raise ValueError(f"{key} must be one of {spec['choices']}")
    if "min" in spec and val < spec["min"]:
        raise ValueError(f"{key} must be >= {spec['min']}")
    return val


def main(args):
    """args: the argparse namespace from the inference CLIs (with .mode)."""
    from rich.console import Console
    from turbodiffusion_tpu.config import GenerationConfig
    from turbodiffusion_tpu.pipelines.pipeline import WanPipeline
    from turbodiffusion_tpu.utils.video_io import load_image, save_video
    from einops import rearrange

    console = Console()
    mode = getattr(args, "mode", "t2v")
    console.print(f"[bold]TurboDiffusion-TPU serve[/bold] — mode={mode}")
    console.print("loading models (stay resident)...")

    pipe = WanPipeline.create(
        model=args.model,
        dit_path=getattr(args, "dit_path", None) or
        getattr(args, "high_noise_model_path", None),
        low_noise_path=getattr(args, "low_noise_model_path", None),
        vae_path=args.vae_path, text_encoder_path=args.text_encoder_path,
        attention_type=args.attention_type, sla_topk=args.sla_topk,
        quant_linear=args.quant_linear, seed=args.seed)

    launch = dict(num_steps=args.num_steps, num_samples=args.num_samples,
                  num_frames=args.num_frames, sigma_max=args.sigma_max,
                  seed=args.seed)
    runtime = dict(launch)
    counter = 0

    def show():
        console.print("[bold cyan]Launch (immutable)[/bold cyan] "
                      f"model={args.model} resolution={args.resolution} "
                      f"aspect_ratio={args.aspect_ratio} "
                      f"attention={args.attention_type} "
                      f"sla_topk={args.sla_topk}")
        console.print("[bold cyan]Runtime (/set)[/bold cyan] " +
                      " ".join(f"{k}={v}" for k, v in runtime.items()))

    show()
    console.print(HELP)

    try:
        from prompt_toolkit import PromptSession
        session = PromptSession()
        read = lambda: session.prompt("turbodiffusion> ")
    except Exception:
        read = lambda: input("turbodiffusion> ")

    while True:
        try:
            line = read().strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        if line.startswith("/"):
            parts = line.split()
            cmd = parts[0]
            if cmd == "/quit":
                break
            elif cmd == "/help":
                console.print(HELP)
            elif cmd == "/show":
                show()
            elif cmd == "/reset":
                runtime = dict(launch)
                console.print("runtime parameters reset")
            elif cmd == "/set" and len(parts) == 3:
                key, raw = parts[1], parts[2]
                if key not in RUNTIME_PARAMS:
                    console.print(f"[red]unknown parameter {key}[/red]")
                    continue
                try:
                    runtime[key] = _validate(key, raw)
                    console.print(f"{key} = {runtime[key]}")
                except ValueError as e:
                    console.print(f"[red]{e}[/red]")
            else:
                console.print(f"[red]unknown command {cmd}[/red]")
            continue

        gen = GenerationConfig(
            num_steps=runtime["num_steps"], sigma_max=runtime["sigma_max"],
            num_frames=runtime["num_frames"],
            num_samples=runtime["num_samples"], seed=runtime["seed"],
            resolution=args.resolution, aspect_ratio=args.aspect_ratio,
            ode=getattr(args, "ode", False),
            boundary=getattr(args, "boundary", 0.9))
        t0 = time.time()
        with console.status("generating..."):
            if mode == "i2v":
                image = load_image(args.image_path)
                video = pipe.generate_i2v(line, image, gen,
                                          adaptive_resolution=getattr(
                                              args, "adaptive_resolution",
                                              False))
            else:
                video = pipe.generate_t2v(line, gen)
        dt = time.time() - t0
        counter += 1
        base, ext = os.path.splitext(args.save_path)
        path = f"{base}_{counter:03d}{ext or '.mp4'}"
        grid = rearrange(video, "b c t h w -> c t h (b w)")
        out = save_video(grid, path, fps=16)
        console.print(f"[green]done in {dt:.2f}s -> {out}[/green]")

    console.print("bye")


def console_main():
    """`turbodiffusion-serve` console script (pyproject.toml)."""
    from turbodiffusion_tpu.inference.wan2_1_t2v import parse_arguments
    args = parse_arguments()
    args.mode = "t2v"
    main(args)


if __name__ == "__main__":
    console_main()
