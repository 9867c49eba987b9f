"""Guidance deltas and sigma schedulers for the LTX-2 pipelines.

Behavioral reference: ltx_core/components/guiders.py (CFG, CFG-Star
rescaling, STG, APG adaptive projected guidance, the multi-modal
combination) and ltx_core/components/schedulers.py (LinearQuadratic, Beta).
Functional JAX rewrites: a guider is `delta(cond, uncond) -> correction`
added to the conditioned prediction; the stateful APG momentum variant
threads its running average explicitly (no module state — scan-friendly).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _projection_coef(to_project, project_onto):
    """<a, b> / (|b|^2 + eps) per batch element (guiders.py:projection_coef)."""
    B = to_project.shape[0]
    a = to_project.reshape(B, -1).astype(jnp.float32)
    b = project_onto.reshape(B, -1).astype(jnp.float32)
    dot = jnp.sum(a * b, axis=1, keepdims=True)
    sq = jnp.sum(b * b, axis=1, keepdims=True) + 1e-8
    coef = dot / sq
    return coef.reshape(B, *([1] * (to_project.ndim - 1)))


def cfg_delta(cond, uncond, scale: float):
    """(scale - 1) * (cond - uncond) (CFGGuider)."""
    return (scale - 1.0) * (cond - uncond)


def cfg_star_delta(cond, uncond, scale: float):
    """CFG-Star: rescale uncond onto cond's direction before the delta
    (CFGStarRescalingGuider)."""
    rescaled_neg = _projection_coef(cond, uncond) * uncond
    return (scale - 1.0) * (cond - rescaled_neg)


def stg_delta(pos_denoised, perturbed_denoised, scale: float):
    """Spatio-temporal guidance: scale * (pos - perturbed) (STGGuider)."""
    return scale * (pos_denoised - perturbed_denoised)


def apg_delta(cond, uncond, scale: float, eta: float = 1.0,
              norm_threshold: float = 0.0, running_avg=None,
              momentum: float = 0.0):
    """Adaptive projected guidance (LtxAPGGuider / LegacyStatefulAPGGuider).

    Decomposes (cond - uncond) into components parallel/orthogonal to cond;
    eta weights the parallel part. momentum != 0 threads an explicit running
    average (pass the previous `running_avg`, get the new one back).

    Returns (delta, new_running_avg)."""
    guidance = cond - uncond
    if momentum != 0.0:
        running_avg = (guidance if running_avg is None
                       else momentum * running_avg + guidance)
        guidance = running_avg
    if norm_threshold > 0.0:
        gnorm = jnp.sqrt(jnp.sum(
            guidance.astype(jnp.float32) ** 2, axis=tuple(
                range(guidance.ndim - 3, guidance.ndim)), keepdims=True))
        guidance = guidance * jnp.minimum(1.0, norm_threshold / gnorm
                                          ).astype(guidance.dtype)
    coef = _projection_coef(guidance, cond)
    g_parallel = coef * cond
    g_orth = guidance - g_parallel
    g_apg = g_parallel * eta + g_orth
    # stateless variant multiplies by (scale-1); the stateful legacy one by
    # scale — expose the stateless convention, matching LtxAPGGuider
    factor = scale if momentum != 0.0 else (scale - 1.0)
    return g_apg * factor, running_avg


def multimodal_guidance(cond, uncond_text, uncond_perturbed, uncond_modality,
                        cfg_scale: float = 1.0, stg_scale: float = 0.0,
                        modality_scale: float = 1.0,
                        rescale_scale: float = 0.0):
    """MultiModalGuider.calculate: CFG + STG + modality-CFG deltas with
    optional std-ratio rescaling (guiders.py MultiModalGuider)."""
    pred = (cond
            + (cfg_scale - 1.0) * (cond - uncond_text)
            + stg_scale * (cond - uncond_perturbed)
            + (modality_scale - 1.0) * (cond - uncond_modality))
    if rescale_scale != 0.0:
        factor = jnp.std(cond.astype(jnp.float32)) / \
            jnp.std(pred.astype(jnp.float32))
        factor = rescale_scale * factor + (1.0 - rescale_scale)
        pred = pred * factor.astype(pred.dtype)
    return pred


def should_skip_step(step: int, skip_step: int) -> bool:
    """MultiModalGuider.should_skip_step."""
    if skip_step == 0:
        return False
    return step % (skip_step + 1) != 0


# ---------------------------------------------------------------------------
# Sigma schedulers (schedulers.py)
# ---------------------------------------------------------------------------

def linear_quadratic_sigmas(steps: int, threshold_noise: float = 0.025,
                            linear_steps: Optional[int] = None) -> np.ndarray:
    """LinearQuadraticScheduler.execute: linear ramp to threshold_noise,
    quadratic tail, then 1 - schedule (descending sigmas, len steps+1)."""
    if steps == 1:
        return np.asarray([1.0, 0.0], np.float32)
    if linear_steps is None:
        linear_steps = steps // 2
    linear = [i * threshold_noise / linear_steps for i in range(linear_steps)]
    diff = linear_steps - threshold_noise * steps
    quad_steps = steps - linear_steps
    quad = []
    if quad_steps > 0:
        qc = diff / (linear_steps * quad_steps ** 2)
        lc = threshold_noise / linear_steps - 2 * diff / (quad_steps ** 2)
        const = qc * (linear_steps ** 2)
        quad = [qc * i * i + lc * i + const
                for i in range(linear_steps, steps)]
    sched = linear + quad + [1.0]
    return np.asarray([1.0 - x for x in sched], np.float32)


def _flux_time_shift(mu: float, sigma: float, t: np.ndarray) -> np.ndarray:
    return math.exp(mu) / (math.exp(mu) + (1.0 / t - 1.0) ** sigma)


def beta_sigmas(steps: int, alpha: float = 0.6, beta: float = 0.6,
                shift: float = 2.37,
                timesteps_length: int = 10000) -> np.ndarray:
    """BetaScheduler.execute (arXiv 2407.12173): timestep indices from the
    beta-distribution quantile function over flux-shifted sigmas. May return
    fewer than steps+1 entries after dedup (same caveat as the reference)."""
    from scipy.stats import beta as beta_dist
    timesteps = np.arange(1, timesteps_length + 1) / timesteps_length
    model_sigmas = _flux_time_shift(shift, 1.0, timesteps)
    total = len(model_sigmas) - 1
    ts = 1.0 - np.linspace(0, 1, steps, endpoint=False)
    idx = np.rint(beta_dist.ppf(ts, alpha, beta) * total).tolist()
    idx = list(dict.fromkeys(idx))
    return np.asarray([float(model_sigmas[int(t)]) for t in idx] + [0.0],
                      np.float32)
