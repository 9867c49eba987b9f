"""rCM distillation: sCM / dCM consistency losses + DMD with a fake-score
critic.

Behavioral reference: rcm/models/t2v_model_distill_rcm.py (the core algorithm
of the reference repo). The single biggest TPU-side simplification: the
reference needs a hand-written twin network (`WanModel_JVP`, 1157 lines) plus
a bespoke Triton JVP flash-attention kernel (618 lines) to push tangents
through the student; in JAX the tangent pass is just `jax.jvp` through the
same `wan_forward` (flash attention carries a custom VJP and is evaluated
with its jnp-reference JVP under `jax.jvp`).

Three nets — student (trainable), teacher (frozen), fake_score (critic) —
share the WanConfig. Phase scheduling alternates student and critic updates
(student_update_freq, :294-357).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from turbodiffusion_tpu.config import WanConfig
from turbodiffusion_tpu.models.wan import wan_forward
from turbodiffusion_tpu.training.timesteps import (
    LogNormal, ema_beta, power_ema_gamma, rf_to_trig_time, trigflow_scaling)


@dataclass(frozen=True)
class DistillConfig:
    """T2VDistillConfig_rCM analog (t2v_model_distill_rcm.py:72-119)."""
    teacher_guidance: float = 5.0
    tangent_warmup: int = 0
    loss_scale: float = 100.0
    loss_scale_dmd: float = 1.0
    student_update_freq: int = 5
    max_simulation_steps_fake: int = 4
    p_g_mean: float = -0.8
    p_g_std: float = 1.6
    p_d_mean: float = 0.0
    p_d_std: float = 1.6
    t_scaling_factor: float = 1000.0
    backward_timesteps: Tuple[float, ...] = (1.5, 1.4, 1.0)
    dmd_fix_timesteps: bool = False
    cm_type: str = "scm"           # "scm" | "dcm"
    dcm_total_steps: int = 48
    dcm_skipping_interval_steps: int = 1
    dcm_timestep_shift: float = 5.0
    ema_rate: float = 0.15
    ema_enabled: bool = True
    ema_iteration_shift: int = 0


# ---------------------------------------------------------------------------
# Denoiser wrapper (EDM-style preconditioning on the RF-trained net)
# ---------------------------------------------------------------------------

def _bcast(t_B1):
    return t_B1[:, :, None, None, None]  # (B,1) -> (B,1,1,1,1)


def denoise(params, cfg: WanConfig, xt, trig_t_B1, cond, dcfg: DistillConfig):
    """denoise() (t2v_model_distill_rcm.py:372-420): returns (x0_pred, F_pred)
    in fp32. trig_t: TrigFlow time (B, 1)."""
    t = _bcast(trig_t_B1.astype(jnp.float32))
    c_skip, c_out, c_in, c_noise = trigflow_scaling(t, dcfg.t_scaling_factor)
    net_out = wan_forward(params, cfg, (xt * c_in).astype(cfg.dtype),
                          c_noise[:, 0, :, 0, 0], cond).astype(jnp.float32)
    x0 = c_skip * xt + c_out * net_out
    F = (jnp.cos(t) * xt - x0) / jnp.sin(t)
    return x0, F


def student_F_and_tangent(params, cfg: WanConfig, xt, t_xt, trig_t_B1,
                          t_trig_t_B1, cond, dcfg: DistillConfig):
    """student_F_withT (t2v_model_distill_rcm.py:422-476) via jax.jvp.

    The tangent pass runs the model in jvp_mode: attention dispatches to
    custom_jvp wrappers whose tangent rule is the fused one-pass Pallas JVP
    kernel (ops/flash_jvp_pallas.py) — the TPU analog of the reference's
    618-line Triton JVP kernel + twin JVP network
    (rcm/utils/flash_attention_jvp_triton.py, rcm/networks/wan2pt1_jvp.py).
    Both t_F and the params entering here are stop-gradient'd, so no VJP
    through this pass is ever needed."""
    jvp_cfg = cfg.replace(attention=dataclasses.replace(
        cfg.attention, jvp_mode=True))

    def F_of(xt_, t_):
        _, F = denoise(params, jvp_cfg, xt_, t_, cond, dcfg)
        return F

    F, t_F = jax.jvp(F_of, (xt, trig_t_B1), (t_xt, t_trig_t_B1))
    return F, jax.lax.stop_gradient(t_F)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def scm_loss(student_params, teacher_params, cfg: WanConfig,
             dcfg: DistillConfig, x0, cond, uncond, key, iteration):
    """Continuous-time consistency (sCM) loss
    (t2v_model_distill_rcm.py:508-589, fd_type=0 JVP path)."""
    B = x0.shape[0]
    k_t, k_eps = jax.random.split(key)
    rf_t = LogNormal(dcfg.p_g_mean, dcfg.p_g_std)(k_t, (B, 1))
    trig_t = rf_to_trig_time(rf_t)                      # (B,1)
    eps = jax.random.normal(k_eps, x0.shape, jnp.float32)

    t5 = _bcast(trig_t)
    cost, sint = jnp.cos(t5), jnp.sin(t5)
    xt = x0 * cost + eps * sint

    _, F_teacher = denoise(teacher_params, cfg, xt, trig_t, cond, dcfg)
    if dcfg.teacher_guidance > 1.0 and uncond is not None:
        _, F_un = denoise(teacher_params, cfg, xt, trig_t, uncond, dcfg)
        F_teacher = F_un + dcfg.teacher_guidance * (F_teacher - F_un)
    F_teacher = jax.lax.stop_gradient(F_teacher)

    # JVP rearrangement (arXiv 2410.11081 §5.1): tangent directions
    t_xt = cost * sint * F_teacher
    t_t = (cost * sint)[:, 0, :, 0, 0]

    _, t_F_theta = student_F_and_tangent(
        jax.lax.stop_gradient(student_params), cfg, xt, t_xt, trig_t, t_t,
        cond, dcfg)

    _, F_theta = denoise(student_params, cfg, xt, trig_t, cond, dcfg)
    F_sg = jax.lax.stop_gradient(F_theta)

    w = 1.0 if dcfg.tangent_warmup == 0 else jnp.minimum(
        1.0, iteration / dcfg.tangent_warmup)

    g = -cost * jnp.sqrt(1 - w ** 2 * sint ** 2) * (F_sg - F_teacher) - (
        w * cost * sint * xt + t_F_theta)

    # NaN masking (:554-571)
    nan_g = jnp.any(jnp.isnan(g.reshape(B, -1)), axis=1)
    nan_f = jnp.any(jnp.isnan(F_sg.reshape(B, -1)), axis=1)
    mask = (nan_g | nan_f)[:, None, None, None, None]
    g = jnp.where(mask, 0.0, g)
    F_theta = jnp.where(mask, 0.0, F_theta)
    F_sg = jnp.where(mask, 0.0, F_sg)

    gnorm = jnp.sqrt(jnp.sum(g ** 2, axis=(1, 2, 3, 4), keepdims=True))
    g = jax.lax.stop_gradient(g / (gnorm + 0.1))

    loss = jnp.sum((F_theta - F_sg - g) ** 2, axis=(1, 2, 3, 4))
    return dcfg.loss_scale * jnp.mean(loss)


def dcm_loss(student_params, teacher_params, cfg: WanConfig,
             dcfg: DistillConfig, x0, cond, uncond, key, iteration):
    """Discrete-time consistency (dCM) loss
    (t2v_model_distill_rcm.py:591-640)."""
    from turbodiffusion_tpu.training.timesteps import shift_rf_time
    B = x0.shape[0]
    k_u, k_eps = jax.random.split(key)
    eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
    du = 1.0 / dcfg.dcm_total_steps
    u = jax.random.uniform(k_u, (B, 1)) * (
        1.0 - dcfg.dcm_skipping_interval_steps * du)

    trig_ts = []
    for kk in range(dcfg.dcm_skipping_interval_steps + 1):
        s_k = 1.0 - (u + kk * du)
        trig_ts.append(rf_to_trig_time(shift_rf_time(s_k,
                                                     dcfg.dcm_timestep_shift)))
    t0, tN = trig_ts[0], trig_ts[-1]
    t05 = _bcast(t0)
    xt = jnp.cos(t05) * x0 + jnp.sin(t05) * eps

    x0_pred, _ = denoise(student_params, cfg, xt, t0, cond, dcfg)

    xk = xt
    for kk in range(dcfg.dcm_skipping_interval_steps):
        tk, tk1 = trig_ts[kk], trig_ts[kk + 1]
        _, F_t = denoise(teacher_params, cfg, xk, tk, cond, dcfg)
        if dcfg.teacher_guidance > 1.0 and uncond is not None:
            _, F_u = denoise(teacher_params, cfg, xk, tk, uncond, dcfg)
            F_t = F_u + dcfg.teacher_guidance * (F_t - F_u)
        xk = xk - _bcast(tk - tk1) * F_t
    x0_target, _ = denoise(jax.lax.stop_gradient(student_params), cfg, xk, tN,
                           cond, dcfg)
    x0_target = jax.lax.stop_gradient(x0_target)

    loss = jnp.sum((x0_pred - x0_target) ** 2, axis=(1, 2, 3, 4))
    return dcfg.loss_scale * jnp.mean(loss)


def backward_simulation(student_params, cfg: WanConfig, dcfg: DistillConfig,
                        cond, shape, n_steps: int, key, with_grad: bool):
    """1..n-step student sampling from pure noise
    (t2v_model_distill_rcm.py:478-502). TrigFlow re-noising between steps."""
    B = shape[0]
    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, shape, jnp.float32)
    t_traj = [jnp.full((B, 1), np.pi / 2, jnp.float32)]
    for i in range(n_steps - 1):
        if dcfg.dmd_fix_timesteps:
            t_traj.append(jnp.full((B, 1), dcfg.backward_timesteps[i],
                                   jnp.float32))
        else:
            key, kt = jax.random.split(key)
            t_new = rf_to_trig_time(
                LogNormal(dcfg.p_d_mean, dcfg.p_d_std)(kt, (B, 1)))
            t_traj.append(jnp.minimum(t_new, t_traj[-1]))
    t_traj.append(jnp.zeros((B, 1), jnp.float32))

    for step in range(n_steps):
        t_cur, t_next = t_traj[step], t_traj[step + 1]
        p = student_params if (with_grad and step == n_steps - 1) else \
            jax.lax.stop_gradient(student_params)
        x, _ = denoise(p, cfg, x, t_cur, cond, dcfg)
        if step < n_steps - 1:
            x = jax.lax.stop_gradient(x)
            key, kn = jax.random.split(key)
            tn5 = _bcast(t_next)
            x = jnp.cos(tn5) * x + jnp.sin(tn5) * jax.random.normal(
                kn, x.shape, jnp.float32)
    return x


def dmd_loss(student_params, teacher_params, fake_params, cfg: WanConfig,
             dcfg: DistillConfig, x0_shape, cond, uncond, key, n_sim: int):
    """Distribution-matching loss (t2v_model_distill_rcm.py:642-678)."""
    B = x0_shape[0]
    k_sim, k_t, k_eps = jax.random.split(key, 3)
    G_x0 = backward_simulation(student_params, cfg, dcfg, cond, x0_shape,
                               n_sim, k_sim, with_grad=True)
    D_t = rf_to_trig_time(LogNormal(dcfg.p_d_mean, dcfg.p_d_std)(k_t, (B, 1)))
    eps = jax.random.normal(k_eps, x0_shape, jnp.float32)
    t5 = _bcast(D_t)
    D_xt = jnp.cos(t5) * G_x0 + jnp.sin(t5) * eps

    x0_fake, _ = denoise(fake_params, cfg, jax.lax.stop_gradient(D_xt), D_t,
                         cond, dcfg)
    x0_teacher, _ = denoise(teacher_params, cfg, jax.lax.stop_gradient(D_xt),
                            D_t, cond, dcfg)
    if dcfg.teacher_guidance > 1.0 and uncond is not None:
        x0_un, _ = denoise(teacher_params, cfg, jax.lax.stop_gradient(D_xt),
                           D_t, uncond, dcfg)
        x0_teacher = x0_un + dcfg.teacher_guidance * (x0_teacher - x0_un)
    x0_fake = jax.lax.stop_gradient(x0_fake)
    x0_teacher = jax.lax.stop_gradient(x0_teacher)

    weight = jnp.clip(jnp.mean(jnp.abs(G_x0 - x0_teacher), axis=(1, 2, 3, 4),
                               keepdims=True), 1e-5)
    grad = jax.lax.stop_gradient((x0_fake - x0_teacher) / weight)
    target = jax.lax.stop_gradient(G_x0 - grad)
    loss = (G_x0 - target) ** 2
    nan = jnp.any(jnp.isnan(loss.reshape(B, -1)), axis=1)
    loss = jnp.where(nan[:, None, None, None, None], 0.0, loss)
    return dcfg.loss_scale_dmd * jnp.mean(
        jnp.sum(loss, axis=(1, 2, 3, 4)))


def critic_loss(fake_params, student_params, cfg: WanConfig,
                dcfg: DistillConfig, x0_shape, cond, key, n_sim: int):
    """Fake-score (critic) denoising loss
    (t2v_model_distill_rcm.py:680-700)."""
    B = x0_shape[0]
    k_sim, k_t, k_eps = jax.random.split(key, 3)
    G_x0 = backward_simulation(jax.lax.stop_gradient(student_params), cfg,
                               dcfg, cond, x0_shape, n_sim, k_sim,
                               with_grad=False)
    G_x0 = jax.lax.stop_gradient(G_x0)
    D_t = rf_to_trig_time(LogNormal(dcfg.p_d_mean, dcfg.p_d_std)(k_t, (B, 1)))
    eps = jax.random.normal(k_eps, x0_shape, jnp.float32)
    t5 = _bcast(D_t)
    cost, sint = jnp.cos(t5), jnp.sin(t5)
    D_xt = cost * G_x0 + sint * eps
    x0_fake, _ = denoise(fake_params, cfg, D_xt, D_t, cond, dcfg)
    loss = jnp.sum((G_x0 - x0_fake) ** 2 / sint ** 2, axis=(1, 2, 3, 4))
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# Phase scheduling + train state
# ---------------------------------------------------------------------------

def is_student_phase(iteration: int, dcfg: DistillConfig,
                     has_fake: bool) -> bool:
    """(t2v_model_distill_rcm.py:294-299)."""
    return ((not has_fake or dcfg.loss_scale_dmd == 0)
            or iteration < dcfg.tangent_warmup
            or (iteration - dcfg.tangent_warmup) % dcfg.student_update_freq == 0)


def effective_iteration(iteration: int, dcfg: DistillConfig,
                        has_fake: bool) -> int:
    if not has_fake or iteration < dcfg.tangent_warmup:
        return iteration
    return dcfg.tangent_warmup + (
        (iteration - dcfg.tangent_warmup) // dcfg.student_update_freq)


class DistillState(NamedTuple):
    student: Any
    teacher: Any
    fake_score: Any
    ema: Any
    opt_student: Any
    opt_fake: Any
    step: int


def create_distill_state(teacher_params, optimizer, dcfg: DistillConfig,
                         with_fake: bool = True):
    """Student and fake_score init from teacher (set_up_model,
    t2v_model_distill_rcm.py:231-260)."""
    student = jax.tree.map(jnp.copy, teacher_params)
    fake = jax.tree.map(jnp.copy, teacher_params) if with_fake else None
    ema = jax.tree.map(lambda x: x.astype(jnp.float32), student) \
        if dcfg.ema_enabled else None
    return DistillState(
        student=student, teacher=teacher_params, fake_score=fake, ema=ema,
        opt_student=optimizer.init(student),
        opt_fake=optimizer.init(fake) if with_fake else None,
        step=0)


def make_distill_steps(cfg: WanConfig, dcfg: DistillConfig, optimizer,
                       with_fake: bool = True):
    """Returns (student_step, critic_step) jitted functions. Phase dispatch
    happens at host level per iteration, mirroring the closure-based trainer
    (rcm/trainers/trainer_distillation.py:232-295)."""
    gamma = power_ema_gamma(dcfg.ema_rate)

    import functools

    @functools.partial(jax.jit, static_argnames=("n_sim",))
    def student_step(state: DistillState, batch, key, iteration, n_sim):
        x0 = batch["latents"].astype(jnp.float32)
        cond = batch["t5_text_embeddings"]
        uncond = batch.get("neg_t5_text_embeddings")

        def loss_fn(sp):
            k1, k2 = jax.random.split(key)
            if dcfg.cm_type == "dcm":
                l_cm = dcm_loss(sp, state.teacher, cfg, dcfg, x0, cond,
                                uncond, k1, iteration)
            else:
                l_cm = scm_loss(sp, state.teacher, cfg, dcfg, x0, cond,
                                uncond, k1, iteration)
            l_dmd = 0.0
            if with_fake and dcfg.loss_scale_dmd > 0:
                l_dmd = dmd_loss(sp, state.teacher, state.fake_score, cfg,
                                 dcfg, x0.shape, cond, uncond, k2, n_sim)
            return l_cm + l_dmd, (l_cm, l_dmd)

        (loss, (l_cm, l_dmd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.student)
        updates, opt_state = optimizer.update(grads, state.opt_student,
                                              state.student)
        student = optax.apply_updates(state.student, updates)
        return state._replace(student=student, opt_student=opt_state,
                              step=state.step + 1), \
            {"loss": loss, "loss_cm": l_cm, "loss_dmd": l_dmd}

    @functools.partial(jax.jit, static_argnames=("n_sim",))
    def critic_step(state: DistillState, batch, key, n_sim):
        x0 = batch["latents"].astype(jnp.float32)
        cond = batch["t5_text_embeddings"]

        def loss_fn(fp):
            return critic_loss(fp, state.student, cfg, dcfg, x0.shape, cond,
                               key, n_sim)

        loss, grads = jax.value_and_grad(loss_fn)(state.fake_score)
        updates, opt_state = optimizer.update(grads, state.opt_fake,
                                              state.fake_score)
        fake = optax.apply_updates(state.fake_score, updates)
        return state._replace(fake_score=fake, opt_fake=opt_state,
                              step=state.step + 1), {"loss_critic": loss}

    @jax.jit
    def ema_update(state: DistillState, beta):
        ema = jax.tree.map(
            lambda e, p: e * beta + (1.0 - beta) * p.astype(jnp.float32),
            state.ema, state.student)
        return state._replace(ema=ema)

    def train_step(state: DistillState, batch, key):
        """One outer iteration with phase dispatch + power-EMA."""
        # strip non-array entries (e.g. 'prompts' strings from the tar
        # shards) before crossing the jit boundary
        batch = {k: v for k, v in batch.items()
                 if hasattr(v, "dtype") or isinstance(v, (int, float))}
        it = int(state.step)
        if is_student_phase(it, dcfg, with_fake):
            eff = effective_iteration(it, dcfg, with_fake)
            n_sim = eff % dcfg.max_simulation_steps_fake + 1
            state, metrics = student_step(state, batch, key, it, n_sim)
            if dcfg.ema_enabled:
                state = ema_update(
                    state, ema_beta(eff, gamma, dcfg.ema_iteration_shift))
        else:
            eff_fake = it - effective_iteration(it, dcfg, with_fake) - 1
            n_sim = eff_fake % dcfg.max_simulation_steps_fake + 1
            state, metrics = critic_step(state, batch, key, n_sim)
        return state, metrics

    return train_step
