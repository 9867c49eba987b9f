"""Measure the sCM student tangent + full train step at the REAL 81-frame
480p training geometry (32.7k tokens) — VERDICT r2 #6.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts_dev/measure_jvp_81f.py [frames]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from turbodiffusion_tpu.config import AttentionConfig, wan_config
    from turbodiffusion_tpu.models.wan import init_wan_params
    from turbodiffusion_tpu.training import distill as D
    from turbodiffusion_tpu.training.train_step import make_optimizer

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 81
    t_lat = 1 + (frames - 1) // 4
    print(jax.devices(), f"frames={frames} t_lat={t_lat} "
          f"tokens={t_lat * 30 * 52}")

    cfg = wan_config("Wan2.1-1.3B",
                     attention=AttentionConfig(backend="sagesla",
                                               sla_topk=0.1),
                     remat="full")  # sagesla grad at mm_only needs 21.4 GB
    teacher = init_wan_params(jax.random.PRNGKey(0), cfg)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1),
                                     (1, 16, t_lat, 60, 104)),
        "t5_text_embeddings": jax.random.normal(
            jax.random.PRNGKey(2), (1, 512, 4096), jnp.bfloat16),
    }

    # 1. tangent-only: the student JVP forward (the piece that was jnp
    #    gather at 13k tokens; measure it at 32.7k)
    dcfg = D.DistillConfig(loss_scale_dmd=0.0)

    @jax.jit
    def tangent_only(params, x0, cond, key):
        k1, k2 = jax.random.split(key)
        trig_t = jnp.full((1, 1), 1.1, jnp.float32)
        xt = jnp.cos(trig_t)[..., None, None, None] * x0 + \
            jnp.sin(trig_t)[..., None, None, None] * \
            jax.random.normal(k1, x0.shape)
        t_xt = jax.random.normal(k2, x0.shape)
        F, tF = D.student_F_and_tangent(params, cfg, xt, t_xt, trig_t,
                                        jnp.ones_like(trig_t), cond, dcfg)
        return jnp.sum(F ** 2) + jnp.sum(tF ** 2)

    args = (teacher, batch["latents"], batch["t5_text_embeddings"],
            jax.random.PRNGKey(3))
    t0 = time.perf_counter()
    jax.device_get(tangent_only(*args))  # fetch-synced: block_until_ready
    # is a no-op over the axon tunnel (utils/timing.py)
    print(f"tangent compile+run: {time.perf_counter()-t0:.1f} s")
    from turbodiffusion_tpu.utils.timing import measure_best
    dt = measure_best(tangent_only, *args, n=3)
    print(f"student JVP tangent fwd @ {frames}f: {dt:.3f} s")

    # 2. full sCM step (teacher fwd x2 + student jvp + backward + adam)
    opt = make_optimizer(lr=1e-5)
    state = D.create_distill_state(teacher, opt, dcfg, with_fake=False)
    step = D.make_distill_steps(cfg, dcfg, opt, with_fake=False)
    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(4))
    print(f"sCM step compile+run: {time.perf_counter()-t0:.1f} s "
          f"loss={float(jax.device_get(m['loss'])):.4f}")
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.PRNGKey(5 + i))
        # fetch the scalar loss: the only reliable sync over the tunnel
        float(jax.device_get(m["loss"]))
        ts.append(time.perf_counter() - t0)
    print(f"full sCM train step @ {frames}f: {min(ts):.3f} s/step")


if __name__ == "__main__":
    main()
