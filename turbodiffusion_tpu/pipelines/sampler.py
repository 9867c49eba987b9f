"""rCM consistency sampling (TrigFlow -> RectifiedFlow).

Behavioral reference: inference/wan2.1_t2v_infer.py:111-139 (T2V SDE loop) and
wan2.2_i2v_infer.py:174-210 (I2V with ODE option and two-expert boundary).

TPU-first: the whole 1-4 step loop is a single jitted function — steps unroll
at trace time (num_steps is static), so XLA fuses the noise updates into the
surrounding DiT dispatch instead of relaunching Python per step.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from turbodiffusion_tpu.config import GenerationConfig


def rcm_timesteps(num_steps: int, sigma_max: float,
                  mid_t: Sequence[float] = (1.5, 1.4, 1.0)):
    """TrigFlow schedule converted to RectifiedFlow time
    (wan2.1_t2v_infer.py:113-122): t = [atan(sigma_max), *mid_t, 0], then
    t <- sin(t) / (cos(t) + sin(t)). Computed in numpy fp64 (as the
    reference does) so the schedule constant-folds under jit."""
    import numpy as _np
    ts = _np.asarray([math.atan(sigma_max), *list(mid_t)[: num_steps - 1], 0.0],
                     _np.float64)
    ts = _np.sin(ts) / (_np.cos(ts) + _np.sin(ts))
    return ts.astype(_np.float32)


def rcm_sample(
    denoise_fn: Callable,
    init_noise: jnp.ndarray,
    key: jax.Array,
    num_steps: int = 4,
    sigma_max: float = 80.0,
    mid_t: Sequence[float] = (1.5, 1.4, 1.0),
    ode: bool = False,
) -> jnp.ndarray:
    """Run the 1-4 step rCM sampler.

    denoise_fn(x, t_scalar, step_index) -> velocity prediction, fp32.
    init_noise: (B, C, T, H, W) standard normal, fp32.
    SDE update (wan2.1_t2v_infer.py:134-139):
        x <- (1 - t_next) * (x - t_cur * v) + t_next * fresh_noise
    ODE update (wan2.2_i2v_infer.py:202-210):
        x <- x - (t_cur - t_next) * v
    """
    t_steps = rcm_timesteps(num_steps, sigma_max, mid_t)
    x = init_noise.astype(jnp.float32) * t_steps[0]
    for i in range(num_steps):
        t_cur, t_next = t_steps[i], t_steps[i + 1]
        v = denoise_fn(x, t_cur, i).astype(jnp.float32)
        if ode:
            x = x - (t_cur - t_next) * v
        else:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, jnp.float32)
            x = (1.0 - t_next) * (x - t_cur * v) + t_next * noise
    return x


def latent_shape(gen: GenerationConfig, latent_ch: int = 16,
                 spatial_factor: int = 8, temporal_factor: int = 4,
                 width: Optional[int] = None, height: Optional[int] = None):
    """(C, T_lat, H_lat, W_lat) for a generation request
    (wan2.1_t2v_infer.py:95-100; VAE factors rcm/tokenizers/wan2pt1.py:708-740)."""
    from turbodiffusion_tpu.config import VIDEO_RES_SIZE_INFO
    if width is None or height is None:
        width, height = VIDEO_RES_SIZE_INFO[gen.resolution][gen.aspect_ratio]
    t_lat = 1 + (gen.num_frames - 1) // temporal_factor
    return (latent_ch, t_lat, height // spatial_factor, width // spatial_factor)
