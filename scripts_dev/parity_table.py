"""End-to-end quality-parity table at real 1.3B geometry (VERDICT r4 #4).

Two golden anchors, each with the comparisons that are mathematically
meaningful against it:

* anchor A — dense-attention bf16-GEMM denoise+decode, linear branch OFF
  (proj_l = 0, its training init): the sagesla/sla rows against it measure
  top-k truncation + quantization on maximally diffuse (random-weight)
  attention — the hard-case bound for sparse selection.
* anchor B — composable SLA bf16 with a RANDOM nonzero proj_l: the
  sagesla rows against it run the SAME mathematical function (sparse +
  linear compensation branch) through the int8 fused/composable kernel
  paths — isolating kernel-chain numerical fidelity exactly (the ADVICE r4
  ask: fused-linear-epilogue quality at production geometry).

The output head is re-initialized to random for every row (the training
init zero-inits it, which makes every backend produce the identical
constant trajectory — measured inf dB across the board in the first r5
run; worthless).

Each row runs in its own subprocess: one INTERNAL tunnel error poisons an
in-process backend (bench.py rationale), and row isolation lets a retry
recompile cleanly. Golden latents/videos ride npy files in --golden_dir.

Run: PYTHONPATH=/root/repo python scripts_dev/parity_table.py [out.json]
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

FRAMES = int(os.environ.get("TDX_PARITY_FRAMES", "81"))
MODEL = os.environ.get("TDX_PARITY_MODEL", "Wan2.1-1.3B")
RES = os.environ.get("TDX_PARITY_RES", "480p")
ONLY = os.environ.get("TDX_PARITY_ONLY", "")  # comma-sep config substrings
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def table_configs():
    """Rows: (name, attn_kw, quant_linear, env, proj_l_mode, anchor).
    anchor 'A'/'B' names the golden the row is compared against; rows with
    anchor == None ARE the goldens."""
    if MODEL == "test":                     # tiny token counts: tiny blocks
        sage = dict(backend="sagesla", block_q=8, block_k=8)
        sla = dict(backend="sla", sla_topk=0.1, block_q=8, block_k=8)
    else:
        sage = dict(backend="sagesla", block_q=512, block_k=256)
        sla = dict(backend="sla", sla_topk=0.1, block_q=256, block_k=256)
    return [
        ("A dense_bf16 (golden)", dict(backend="dense"), False, {}, "zero",
         None),
        ("A sagesla_i8 topk0.10", dict(sla_topk=0.1, **sage), True, {},
         "zero", "A"),
        ("A sagesla_i8 topk0.15", dict(sla_topk=0.15, **sage), True, {},
         "zero", "A"),
        ("A sagesla_i8 topk0.10 bf16-GEMM", dict(sla_topk=0.1, **sage),
         False, {}, "zero", "A"),
        ("A sla_bf16 topk0.10 (unquantized attn)", sla, False, {}, "zero",
         "A"),
        ("A sagesla_i8 topk0.10 block128",
         dict(backend="sagesla", sla_topk=0.1, block_q=128, block_k=128),
         True, {}, "zero", "A"),
        ("A sagesla_i8 topk0.10 block64",
         dict(backend="sagesla", sla_topk=0.1, block_q=64, block_k=64),
         True, {}, "zero", "A"),
        ("B sla_bf16 topk0.10 +linear (golden)", sla, False, {}, "random",
         None),
        ("B sagesla_i8 topk0.10 +linear fused",
         dict(sla_topk=0.1, **sage), True, {"TDX_LIN_FUSED": "1"},
         "random", "B"),
        ("B sagesla_i8 topk0.10 +linear composable",
         dict(sla_topk=0.1, **sage), True, {"TDX_LIN_FUSED": "0"},
         "random", "B"),
    ]


def make_cfg(attn_kw, quant):
    from turbodiffusion_tpu.config import (
        AttentionConfig, wan_config, wan_test_config)
    attn = AttentionConfig(**attn_kw)
    if MODEL == "test":
        return wan_test_config(attention=attn, quant_linear=quant)
    return wan_config(MODEL, attention=attn, quant_linear=quant)


def build_params(jax, jnp, cfg, quant, proj_l_mode):
    from turbodiffusion_tpu.models.wan import init_wan_params
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(42), 3)
    hw = params["head"]["head"]["w"]
    params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(k1, hw.shape, hw.dtype))
    sa = params["blocks"]["self_attn"]      # stacked (num_layers, ...)
    if proj_l_mode == "random" and "proj_l" in sa:
        Dh = cfg.head_dim
        L = sa["proj_l"]["w"].shape[0]
        sa["proj_l"]["w"] = Dh ** -0.5 * jax.random.normal(
            k2, (L, Dh, Dh), jnp.float32)
        sa["proj_l"]["b"] = 0.01 * jax.random.normal(
            k3, (L, Dh), jnp.float32)
    if quant:
        from turbodiffusion_tpu.ops.quant import quantize_wan_blocks
        params["blocks"] = quantize_wan_blocks(params["blocks"],
                                               mode="postscale")
    return params


def psnr(ours, ref, peak=None):
    ref64 = ref.astype(np.float64)
    mse = float(np.mean((ours.astype(np.float64) - ref64) ** 2))
    if peak is None:
        peak = float(ref64.max() - ref64.min())
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


# --------------------------------------------------------------------------
# child: run ONE row, print its JSON record
# --------------------------------------------------------------------------

def run_row(idx: int, golden_dir: str):
    import jax
    import jax.numpy as jnp

    os.makedirs("/root/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from turbodiffusion_tpu.config import GenerationConfig
    from turbodiffusion_tpu.models.vae import init_vae_params, vae_decode
    from turbodiffusion_tpu.models.wan import wan_forward
    from turbodiffusion_tpu.pipelines.sampler import latent_shape, rcm_sample

    name, attn_kw, quant, env, proj_l_mode, anchor = table_configs()[idx]
    for k, v in env.items():
        os.environ[k] = v

    gen = GenerationConfig(num_frames=FRAMES, resolution=RES)
    C, T, H, W = latent_shape(gen)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, C, T, H, W),
                              jnp.float32)
    cfg = make_cfg(attn_kw, quant)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    params = build_params(jax, jnp, cfg, quant, proj_l_mode)

    @jax.jit
    def generate(params, noise):
        def denoise(x, t, i):
            tt = jnp.full((1, 1), t * 1000.0, jnp.float32)
            return wan_forward(params, cfg, x, tt, ctx)
        return rcm_sample(denoise, noise, jax.random.PRNGKey(7),
                          num_steps=gen.num_steps, sigma_max=gen.sigma_max)

    t0 = time.perf_counter()
    lat = np.asarray(jax.device_get(generate(params, noise)), np.float32)
    dt = time.perf_counter() - t0
    del params
    vae_params = init_vae_params(jax.random.PRNGKey(3))
    vid = np.asarray(jax.device_get(
        vae_decode(vae_params, jnp.asarray(lat))), np.float32)

    if anchor is None:
        np.save(os.path.join(golden_dir, f"lat_{name[0]}.npy"), lat)
        np.save(os.path.join(golden_dir, f"vid_{name[0]}.npy"), vid)
        rec = {"config": name, "golden": True,
               "latent_std": float(lat.std()),
               "video_range": [float(vid.min()), float(vid.max())]}
    else:
        glat = np.load(os.path.join(golden_dir, f"lat_{anchor}.npy"))
        gvid = np.load(os.path.join(golden_dir, f"vid_{anchor}.npy"))
        rec = {"config": name, "anchor": anchor,
               "latent_psnr_db": round(psnr(lat, glat), 2),
               "video_psnr_db": round(psnr(vid, gvid, peak=2.0), 2),
               "latent_relerr": round(float(
                   np.abs(lat - glat).mean()
                   / (np.abs(glat).mean() + 1e-12)), 4)}
    rec["first_run_s"] = round(dt, 1)
    print("ROW " + json.dumps(rec), flush=True)


# --------------------------------------------------------------------------
# parent: orchestrate rows in isolated subprocesses
# --------------------------------------------------------------------------

def main():
    cfgs = table_configs()
    sel = list(range(len(cfgs)))
    if ONLY:
        keys = [s.strip() for s in ONLY.split(",") if s.strip()]
        sel = [i for i, c in enumerate(cfgs)
               if c[5] is None or any(k in c[0] for k in keys)]

    golden_dir = os.environ.get("TDX_PARITY_GOLDEN_DIR",
                                "/tmp/parity_golden")
    os.makedirs(golden_dir, exist_ok=True)
    results = []
    for i in sel:
        name = cfgs[i][0]
        rec = None
        for attempt in range(2):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--row",
                 str(i), golden_dir],
                capture_output=True, text=True, timeout=3600,
                env=dict(os.environ), cwd=REPO)
            for line in r.stdout.splitlines():
                if line.startswith("ROW {"):
                    rec = json.loads(line[4:])
            if rec is not None:
                break
            time.sleep(20)
        if rec is None:
            tail = (r.stderr or "").strip().splitlines()[-8:]
            rec = {"config": name, "error": "\n".join(tail)[:500]}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    from turbodiffusion_tpu.config import GenerationConfig
    from turbodiffusion_tpu.pipelines.sampler import latent_shape
    C, T, H, W = latent_shape(GenerationConfig(num_frames=FRAMES,
                                               resolution=RES))
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_table.json"
    with open(out, "w") as f:
        json.dump({"frames": FRAMES, "geometry": [1, C, T, H, W],
                   "results": results}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--row":
        run_row(int(sys.argv[2]), sys.argv[3])
    else:
        main()
