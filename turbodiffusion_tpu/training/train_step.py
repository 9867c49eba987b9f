"""Training steps.

Currently: the SLA white-box finetune objective — MSE between the student's
velocity prediction and a target velocity at RectifiedFlow-noised inputs
(reference: rcm/models/t2v_model_sla.py:300-336). The rCM distillation phases
(sCM via jax.jvp, DMD, critic) build on this scaffold.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from turbodiffusion_tpu.config import WanConfig
from turbodiffusion_tpu.models.wan import wan_forward


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def lambda_linear_schedule(base_lr: float, warmup_steps: int = 1000,
                           f_start: float = 1e-6, f_max: float = 1.0,
                           f_min: float = 1.0):
    """LambdaLinearScheduler (rcm/utils/lr_scheduler.py): linear warmup from
    f_start to f_max over warmup_steps, then constant f_min multiplier."""
    def schedule(step):
        frac = jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0)
        mult = jnp.where(step < warmup_steps,
                         f_start + (f_max - f_start) * frac, f_min)
        return base_lr * mult
    return schedule


def make_optimizer(lr: float = 1e-5, weight_decay: float = 1e-4,
                   b1: float = 0.9, b2: float = 0.95,
                   warmup_steps: int = 0, grad_clip: float = 0.0,
                   force_finite: bool = True):
    """AdamW ≡ the reference's FusedAdam with fp32 master weights
    (imaginaire/utils/fused_adam.py); optax keeps moments in fp32.
    grad_clip + force_finite ≡ the GradClip callback's clip_grad_norm_ with
    nan_to_num (rcm/callbacks/grad_clip.py:27-61)."""
    parts = []
    if force_finite:
        parts.append(optax.stateless(lambda g, p: jax.tree.map(
            lambda x: jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0), g)))
    if grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    sched = lambda_linear_schedule(lr, warmup_steps) if warmup_steps else lr
    parts.append(optax.adamw(sched, b1=b1, b2=b2, weight_decay=weight_decay))
    return optax.chain(*parts)


def make_sla_train_step(cfg_student: WanConfig, cfg_teacher: WanConfig,
                        teacher_params, optimizer, loss_scale: float = 1.0,
                        p_mean: float = 0.0, p_std: float = 1.6,
                        t_scaling: float = 1000.0):
    """White-box SLA finetuning exactly as t2v_model_sla.py:300-336:
    draw RF time ~ LogNormal, noise the latents, regress the sparse student's
    velocity onto the frozen dense teacher's velocity at the same input."""
    import functools
    from turbodiffusion_tpu.training.timesteps import LogNormal

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, batch, key):
        x0 = batch["latents"].astype(jnp.float32)
        emb = batch["t5_text_embeddings"]
        B = x0.shape[0]
        k_t, k_eps = jax.random.split(key)
        rf_t = LogNormal(p_mean, p_std)(k_t, (B, 1))
        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        t5 = rf_t[:, :, None, None, None]
        xt = (1.0 - t5) * x0 + t5 * eps
        tt = (rf_t * t_scaling).astype(jnp.float32)

        v_teacher = jax.lax.stop_gradient(
            wan_forward(teacher_params, cfg_teacher, xt, tt, emb)
        ).astype(jnp.float32)

        def loss_fn(p):
            v = wan_forward(p, cfg_student, xt, tt, emb).astype(jnp.float32)
            return loss_scale * jnp.mean((v - v_teacher) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def train_step(state, batch, key):
        batch = {k: v for k, v in batch.items() if hasattr(v, "dtype")}
        state, loss = _step(state, batch, key)
        return state, {"loss": loss}
    return train_step


def sla_finetune_loss(params, cfg: WanConfig, batch, key):
    """White-box SLA loss: student (sparse attention) regresses the dense
    teacher's velocity. batch: {'latents', 'teacher_velocity',
    't5_text_embeddings', 'timesteps'} (t2v_model_sla.py:300-336)."""
    x = batch["latents"]
    t = batch["timesteps"]          # (B, 1) in [0, 1000]
    v_pred = wan_forward(params, cfg, x, t, batch["t5_text_embeddings"])
    target = batch["teacher_velocity"].astype(jnp.float32)
    return jnp.mean((v_pred - target) ** 2)


def make_train_step(cfg: WanConfig, optimizer):
    @jax.jit
    def _step(state: TrainState, batch, key):
        loss, grads = jax.value_and_grad(sla_finetune_loss)(
            state.params, cfg, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def train_step(state, batch, key):
        batch = {k: v for k, v in batch.items() if hasattr(v, "dtype")}
        state, loss = _step(state, batch, key)
        return state, {"loss": loss}
    return train_step
