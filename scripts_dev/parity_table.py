"""End-to-end quality-parity table at real 1.3B geometry (VERDICT r4 #4).

Golden = dense-attention bf16-GEMM 4-step rCM denoise + VAE decode at
480p/81f on the real chip. Every accelerated config (SageSLA int8 at topk
0.1/0.15, block granularities, quant_linear on/off, fused linear epilogue
on/off) replays the identical sampler from the identical noise/text inputs
and reports latent + decoded-video PSNR vs golden.

No released checkpoints exist in this environment, so weights are random
(fixed seed). That makes these numbers a measure of the *kernel chain's*
numerical fidelity at production geometry — the sparse-vs-dense rows bound
algorithmic approximation on maximally diffuse (random-weight) attention,
which is the hard case for top-k selection; the int8-vs-bf16 rows isolate
quantization noise exactly.

Run: PYTHONPATH=/root/repo python scripts_dev/parity_table.py [out.json]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FRAMES = int(os.environ.get("TDX_PARITY_FRAMES", "81"))
MODEL = os.environ.get("TDX_PARITY_MODEL", "Wan2.1-1.3B")
RES = os.environ.get("TDX_PARITY_RES", "480p")
ONLY = os.environ.get("TDX_PARITY_ONLY", "")  # comma-sep config substrings


def make_cfg(attn_kw, quant):
    from turbodiffusion_tpu.config import (
        AttentionConfig, wan_config, wan_test_config)
    attn = AttentionConfig(**attn_kw)
    if MODEL == "test":
        return wan_test_config(attention=attn, quant_linear=quant)
    return wan_config(MODEL, attention=attn, quant_linear=quant)


def build_params(cfg, quant):
    from turbodiffusion_tpu.models.wan import init_wan_params
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    if quant:
        from turbodiffusion_tpu.ops.quant import quantize_wan_blocks
        params["blocks"] = quantize_wan_blocks(params["blocks"],
                                               mode="postscale")
    return params


def run_denoise(cfg, gen, params, noise, ctx):
    from turbodiffusion_tpu.models.wan import wan_forward
    from turbodiffusion_tpu.pipelines.sampler import rcm_sample

    @jax.jit
    def generate(params, noise):
        def denoise(x, t, i):
            tt = jnp.full((1, 1), t * 1000.0, jnp.float32)
            return wan_forward(params, cfg, x, tt, ctx)
        return rcm_sample(denoise, noise, jax.random.PRNGKey(7),
                          num_steps=gen.num_steps, sigma_max=gen.sigma_max)

    out = generate(params, noise)
    return np.asarray(jax.device_get(out), np.float32)


def psnr(ours, ref, peak=None):
    ref64 = ref.astype(np.float64)
    mse = float(np.mean((ours.astype(np.float64) - ref64) ** 2))
    if peak is None:
        peak = float(ref64.max() - ref64.min())
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def main():
    from turbodiffusion_tpu.config import GenerationConfig
    from turbodiffusion_tpu.models.vae import init_vae_params, vae_decode
    from turbodiffusion_tpu.pipelines.sampler import latent_shape

    gen = GenerationConfig(num_frames=FRAMES, resolution=RES)
    C, T, H, W = latent_shape(gen)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, C, T, H, W),
                              jnp.float32)
    cfg0 = make_cfg(dict(backend="dense"), False)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg0.text_len, cfg0.text_dim), jnp.bfloat16)
    vae_params = init_vae_params(jax.random.PRNGKey(3))

    def decode(lat):
        v = vae_decode(vae_params, jnp.asarray(lat))
        return np.asarray(jax.device_get(v), np.float32)

    # (name, attention kwargs, quant_linear, env overrides)
    if MODEL == "test":                     # tiny token counts: tiny blocks
        sage = dict(backend="sagesla", block_q=8, block_k=8)
    else:
        sage = dict(backend="sagesla", block_q=512, block_k=256)
    CONFIGS = [
        ("dense_bf16 (golden)", dict(backend="dense"), False, {}),
        ("sagesla_i8 topk0.10", dict(sla_topk=0.1, **sage), True, {}),
        ("sagesla_i8 topk0.15", dict(sla_topk=0.15, **sage), True, {}),
        ("sagesla_i8 topk0.10 bf16-GEMM", dict(sla_topk=0.1, **sage),
         False, {}),
        ("sla_bf16 topk0.10 (unquantized attn)",
         dict(backend="sla", sla_topk=0.1, block_q=256, block_k=256),
         False, {}),
        ("sagesla_i8 topk0.10 block128",
         dict(backend="sagesla", sla_topk=0.1, block_q=128, block_k=128),
         True, {}),
        ("sagesla_i8 topk0.10 block64",
         dict(backend="sagesla", sla_topk=0.1, block_q=64, block_k=64),
         True, {}),
        ("sagesla_i8 topk0.10 lin-composable",
         dict(sla_topk=0.1, **sage), True, {"TDX_LIN_FUSED": "0"}),
    ]

    if ONLY:
        keys = [s.strip() for s in ONLY.split(",") if s.strip()]
        CONFIGS = [c for c in CONFIGS
                   if any(k in c[0] for k in keys) or c[0] == CONFIGS[0][0]]

    results = []
    golden_lat = golden_vid = None
    for name, attn_kw, quant, env in CONFIGS:
        for k, v in env.items():
            os.environ[k] = v
        try:
            cfg = make_cfg(attn_kw, quant)
            params = build_params(cfg, quant)
            t0 = time.perf_counter()
            lat = run_denoise(cfg, gen, params, noise, ctx)
            dt = time.perf_counter() - t0
            del params
            vid = decode(lat)
            if golden_lat is None:
                golden_lat, golden_vid = lat, vid
                rec = {"config": name, "golden": True,
                       "latent_std": float(lat.std()),
                       "video_range": [float(vid.min()), float(vid.max())]}
            else:
                rec = {"config": name,
                       "latent_psnr_db": round(psnr(lat, golden_lat), 2),
                       "video_psnr_db": round(
                           psnr(vid, golden_vid,
                                peak=2.0), 2),  # video in [-1, 1]
                       "latent_relerr": round(float(
                           np.abs(lat - golden_lat).mean()
                           / (np.abs(golden_lat).mean() + 1e-12)), 4)}
            rec["first_run_s"] = round(dt, 1)
        except Exception as e:                         # noqa: BLE001
            rec = {"config": name, "error": f"{type(e).__name__}: {e}"[:500]}
        finally:
            for k in env:
                os.environ.pop(k, None)
        print(json.dumps(rec), flush=True)
        results.append(rec)

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_table.json"
    with open(out, "w") as f:
        json.dump({"frames": FRAMES, "geometry": [1, C, T, H, W],
                   "results": results}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
