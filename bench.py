"""Benchmark suite. First line: the headline metric (Wan2.1-1.3B 4-step
rCM denoising at 480p/81 frames, matching the reference's E2E number —
diffusion denoising only, excluding text encoding and VAE decode,
reference README.md:207; BASELINE.md: 1.9s on RTX 5090, SageSLA topk 0.1 +
W8A8). Subsequent lines: VAE decode, 14B single-chip, 720p, sCM train step.

vs_baseline = ours_seconds / reference_seconds (1.0 = parity, lower=faster).
Set TDX_BENCH_FAST=1 to print only the headline metric.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: repeat runs skip the multi-minute XLA compile
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINES = {
    # reference numbers (BASELINE.md; RTX 5090)
    "wan2.1_1.3b_480p_4step_denoise": 1.9,
    "wan2.1_14b_480p_4step_denoise": 9.9,
    "wan2.1_1.3b_720p_4step_denoise": 24.0 * 1.9 / 9.9,  # no 1.3B/720p ref;
    # scale the 14B 720p/480p ratio onto the 1.3B number for a comparable bar
    "wan2.1_1.3b_480p_vae_decode": None,   # excluded from the reference E2E
    "scm_train_step_1.3b_480p_33f": None,
    "scm_train_step_1.3b_480p_81f": None,
}


def emit(metric, seconds, **extra):
    base = BASELINES.get(metric)
    rec = {"metric": metric, "value": round(seconds, 4), "unit": "s"}
    if base:
        rec["vs_baseline"] = round(seconds / base, 4)
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def _best(fn, *args, n=3):
    # fetch-synced: jax.block_until_ready is a no-op over the axon tunnel
    # (utils/timing.py docstring has the evidence)
    from turbodiffusion_tpu.utils.timing import measure_best
    return measure_best(fn, *args, n=n)


def _denoise_bench(model, gen, quant=True, fuse_qkv=True, linear=True,
                   n=3):
    from turbodiffusion_tpu.config import (
        AttentionConfig, wan_config)
    from turbodiffusion_tpu.models.wan import init_wan_params, wan_forward
    from turbodiffusion_tpu.pipelines.sampler import latent_shape, rcm_sample

    cfg = wan_config(
        model,
        attention=AttentionConfig(backend="sagesla", sla_topk=0.1,
                                  linear_branch=linear),
        quant_linear=quant,
    )
    if model == "Wan2.1-14B":
        # checkpoint-free 14B: building 14B random params on host takes
        # minutes; fill shape-faithful quantized params on device instead
        from turbodiffusion_tpu.ops.quant import quantize_wan_blocks

        def build():
            p = init_wan_params(jax.random.PRNGKey(0), cfg)
            if quant:
                p["blocks"] = quantize_wan_blocks(p["blocks"],
                                                  mode="postscale",
                                                  fuse_qkv=fuse_qkv)
            return p

        shapes = jax.eval_shape(build)

        def fill(s):
            if s.dtype == jnp.int8:
                return jnp.zeros(s.shape, s.dtype)
            if s.dtype == jnp.float32 and s.ndim <= 1:
                return jnp.ones(s.shape, s.dtype)
            return jnp.full(s.shape, 0.01, s.dtype)

        params = jax.tree.map(fill, shapes)
    else:
        params = init_wan_params(jax.random.PRNGKey(0), cfg)
        if quant:
            from turbodiffusion_tpu.ops.quant import quantize_wan_blocks
            params["blocks"] = quantize_wan_blocks(params["blocks"],
                                                   mode="postscale",
                                                   fuse_qkv=fuse_qkv)
    C, T, H, W = latent_shape(gen)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 4096),
                            jnp.bfloat16)

    @jax.jit
    def generate(params, noise, key):
        def denoise(x, t, i):
            tt = jnp.full((1, 1), t * 1000.0, jnp.float32)
            return wan_forward(params, cfg, x, tt, ctx)
        return rcm_sample(denoise, noise, key, num_steps=gen.num_steps,
                          sigma_max=gen.sigma_max)

    noise = jax.random.normal(jax.random.PRNGKey(2), (1, C, T, H, W),
                              jnp.float32)
    return _best(lambda p, x: generate(p, x, jax.random.PRNGKey(4)),
                 params, noise, n=n)


def _probe_backend(timeout_s: float = 600.0) -> bool:
    """The axon tunnel has outage windows where backend init or a tiny
    program hangs indefinitely (ROADMAP). Probe it under a watchdog so a
    dead tunnel yields an explicit error record instead of a silent hang
    into the driver's timeout."""
    import threading
    ok = []

    def probe():
        x = jnp.ones((128, 128))
        float(jax.device_get(jnp.sum(x @ x)))
        ok.append(True)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    from turbodiffusion_tpu.config import GenerationConfig

    quant = os.environ.get("TDX_BENCH_QUANT", "1") == "1"
    fast = os.environ.get("TDX_BENCH_FAST", "0") == "1"

    if not _probe_backend():
        print(json.dumps({"metric": "wan2.1_1.3b_480p_4step_denoise",
                          "error": "TPU backend unreachable (tunnel probe "
                                   "timed out after 600s)"}), flush=True)
        os._exit(0)

    # 1. headline (one retry: the axon tunnel has transient windows where a
    # fresh remote compile or run fails with INTERNAL — see ROADMAP)
    last = None
    for attempt in range(2):
        try:
            best = _denoise_bench("Wan2.1-1.3B", GenerationConfig(),
                                  quant=quant)
            emit("wan2.1_1.3b_480p_4step_denoise", best)
            break
        except Exception as e:                            # noqa: BLE001
            last = e
            # second attempt runs without the newest fast paths (fresh
            # closure => full retrace picks the env vars up)
            os.environ["TDX_CROSS_QOUT"] = "0"
            os.environ["TDX_HP_TL512"] = "0"
            time.sleep(30)
    else:
        print(json.dumps({"metric": "wan2.1_1.3b_480p_4step_denoise",
                          "error": f"{type(last).__name__}: {last}"[:200]}),
              flush=True)
    if fast:
        return

    # 2. VAE decode 480p/81f (the reference excludes decode from E2E, but it
    # dominates real user latency — VERDICT r2 #2)
    try:
        from turbodiffusion_tpu.models.vae import init_vae_params, vae_decode
        vp = init_vae_params(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 21, 60, 104),
                              jnp.float32)
        ck = os.environ.get("TDX_BENCH_VAE_CHUNK")
        chunk = int(ck) if ck else None        # None = auto
        dt = _best(lambda p, z: vae_decode(p, z, chunk=chunk), vp, z)
        emit("wan2.1_1.3b_480p_vae_decode", dt)
    except Exception as e:                                # noqa: BLE001
        print(json.dumps({"metric": "wan2.1_1.3b_480p_vae_decode",
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)

    # 3. 14B single-chip, 480p/81 frames (the flagship config)
    try:
        dt = _denoise_bench("Wan2.1-14B", GenerationConfig(),
                            quant=True, fuse_qkv=False, linear=False, n=1)
        emit("wan2.1_14b_480p_4step_denoise", dt, frames=81)
    except Exception as e:                                # noqa: BLE001
        print(json.dumps({"metric": "wan2.1_14b_480p_4step_denoise",
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)

    # 4. 1.3B 720p
    try:
        dt = _denoise_bench(
            "Wan2.1-1.3B", GenerationConfig(resolution="720p"), quant=quant,
            n=2)
        emit("wan2.1_1.3b_720p_4step_denoise", dt)
    except Exception as e:                                # noqa: BLE001
        print(json.dumps({"metric": "wan2.1_1.3b_720p_4step_denoise",
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)

    # 5. sCM training step: teacher fwd (x2 CFG-free) + student JVP fwd +
    # backward. Loss+grads only — a full fp32 Adam+EMA state for 1.3B
    # (~17 GB) is a multi-chip configuration (the FSDP mesh path), not a
    # single-chip one. Primary geometry is the REAL 81-frame/32.7k-token
    # training length (VERDICT r2 #6); falls back to 33f if it cannot run.
    from turbodiffusion_tpu.config import AttentionConfig, wan_config
    from turbodiffusion_tpu.models.wan import init_wan_params
    from turbodiffusion_tpu.training import distill as D

    # remat="full": the sagesla grad step needs 21.4 GB at mm_only
    # (measured via AOT compile) — full recompute fits one 16 GB chip
    cfg = wan_config("Wan2.1-1.3B",
                     attention=AttentionConfig(backend="sagesla",
                                               sla_topk=0.1),
                     remat="full")
    teacher = init_wan_params(jax.random.PRNGKey(0), cfg)
    dcfg = D.DistillConfig(loss_scale_dmd=0.0)       # pure sCM phase
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 512, 4096),
                             jnp.bfloat16)

    def make_grad_step():
        # fresh closure per attempt => full retrace picks up env switches
        @jax.jit
        def grad_step(student, teacher, x0, cond, key):
            def loss_fn(sp):
                return D.scm_loss(sp, teacher, cfg, dcfg, x0, cond, None,
                                  key, 0)
            loss, grads = jax.value_and_grad(loss_fn)(student)
            gn = jax.tree.reduce(
                lambda a, g: a + jnp.sum(g.astype(jnp.float32) ** 2),
                grads, 0.0)
            return loss, gn
        return grad_step

    for t_lat, name, pre in (
            (21, "scm_train_step_1.3b_480p_81f", None),
            (9, "scm_train_step_1.3b_480p_33f", None),
            # last resort: the pre-round-3 lax.map gather tangent
            (9, "scm_train_step_1.3b_480p_33f",
             ("TDX_JVP_PALLAS_SPARSE", "0"))):
        try:
            if pre is not None:
                os.environ[pre[0]] = pre[1]
            grad_step = make_grad_step()
            batch_lat = jax.random.normal(jax.random.PRNGKey(1),
                                          (1, 16, t_lat, 60, 104))
            args = (teacher, teacher, batch_lat, cond,
                    jax.random.PRNGKey(3))
            dt = _best(lambda *a: grad_step(*a), *args, n=2)
            emit(name, dt)
            break
        except Exception as e:                            # noqa: BLE001
            print(json.dumps({"metric": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
