"""Bidirectional joint audio-video consistency sampling for LTX-2.

Reference: ltx_distillation/inference/bidirectional_pipeline.py:46-155 —
1-4 step joint AV sampling with optional CFG and euler / trig-recorrupt /
RF re-noise stepping; student sigmas from trig timesteps [pi/2,1.5,1.4,1.0,0]
or scheduler-snapped lists (run_av_inference_eval.py:98-109).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from turbodiffusion_tpu.models.ltx import ltx2_sigmas


def trig_student_sigmas(num_steps: int = 4,
                        mid_t: Sequence[float] = (1.5, 1.4, 1.0)
                        ) -> np.ndarray:
    """RF sigmas from trig timesteps [pi/2, 1.5, 1.4, 1.0, 0]
    (run_av_inference_eval.py:98-109)."""
    ts = np.asarray([math.pi / 2, *list(mid_t)[: num_steps - 1], 0.0])
    return (np.sin(ts) / (np.cos(ts) + np.sin(ts))).astype(np.float32)


def bidirectional_av_sample(
    generator: Callable,
    video_noise: jnp.ndarray,
    audio_noise: jnp.ndarray,
    key: jax.Array,
    sigmas: Optional[np.ndarray] = None,
    num_steps: int = 4,
    mode: str = "trig",                  # "euler" | "trig" | "rf"
    video_guidance_scale: float = 1.0,
    uncond_generator: Optional[Callable] = None,
):
    """generator(video, audio, sigma_scalar) -> (video_x0, audio_x0).

    Stepping modes (bidirectional_pipeline.py:91-155):
      euler: x += (x - x0)/sigma * (sigma_next - sigma)
      trig:  x0 re-corrupted at trig(next): cos(t)x0 + sin(t)eps
      rf:    x = (1 - s_next) x0 + s_next eps
    """
    if sigmas is None:
        sigmas = trig_student_sigmas(num_steps)
    video = video_noise.astype(jnp.float32)
    audio = audio_noise.astype(jnp.float32)

    for i in range(len(sigmas) - 1):
        s, s_next = float(sigmas[i]), float(sigmas[i + 1])
        v_x0, a_x0 = generator(video, audio, s)
        if uncond_generator is not None and video_guidance_scale > 1.0:
            v_un, a_un = uncond_generator(video, audio, s)
            v_x0 = v_un + video_guidance_scale * (v_x0 - v_un)
            a_x0 = a_un + video_guidance_scale * (a_x0 - a_un)
        v_x0, a_x0 = v_x0.astype(jnp.float32), a_x0.astype(jnp.float32)

        if s_next <= 0:
            video, audio = v_x0, a_x0
            break
        if mode == "euler":
            video = video + (video - v_x0) / s * (s_next - s)
            audio = audio + (audio - a_x0) / s * (s_next - s)
        else:
            key, kv, ka = jax.random.split(key, 3)
            nv = jax.random.normal(kv, video.shape, jnp.float32)
            na = jax.random.normal(ka, audio.shape, jnp.float32)
            if mode == "trig":
                t = math.atan(s_next / (1 - s_next))
                video = math.cos(t) * v_x0 + math.sin(t) * nv
                audio = math.cos(t) * a_x0 + math.sin(t) * na
            else:  # rf re-noise
                video = (1 - s_next) * v_x0 + s_next * nv
                audio = (1 - s_next) * a_x0 + s_next * na
    return video, audio
