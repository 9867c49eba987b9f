"""Teacher sampling: flow-matching Euler and UniPC multistep.

Reference: rcm/samplers/euler.py (FlowEulerSampler, timestep-shifted linear
sigmas) and rcm/samplers/unipc.py (FlowUniPCMultistepSampler, bh2
predictor-corrector from diffusers) — used for teacher reference sampling
and the synthetic-dataset builder (rcm/datasets/build_synthetic_dataset.py;
t2v_model_distill_rcm.py:796-874).

Functional: the whole sampling loop unrolls under one jit; all solver
coefficients depend only on the (static) sigma schedule and are computed in
numpy at trace time. Flow-matching parameterization: alpha_t = 1 - sigma,
sigma_t = sigma (unipc.py:111-112); x0 = x_t - sigma * v (:114-142).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import numpy as np


def shifted_linear_sigmas(num_steps: int, shift: float = 3.0,
                          sigma_max: float = 1.0, sigma_min: float = 0.0
                          ) -> np.ndarray:
    """linspace sigmas + timestep shift (euler.py:16-21), with the terminal
    0 appended (the reference treats past-the-end as 0, euler.py:26-29)."""
    sigmas = np.linspace(sigma_max, sigma_min, num_steps + 1)[:-1]
    if shift > 0:
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    return np.concatenate([sigmas, [0.0]]).astype(np.float64)


def euler_sample(velocity_fn: Callable, init_noise, num_steps: int = 100,
                 shift: float = 3.0, num_train_timesteps: int = 1000):
    """Flow-matching Euler: x <- x + v * (sigma_next - sigma)
    (euler.py:23-31). velocity_fn(x, t_B1 in [0,1000]) -> v."""
    sigmas = shifted_linear_sigmas(num_steps, shift)
    x = init_noise.astype(jnp.float32)
    for i in range(num_steps):
        t = jnp.full((x.shape[0], 1), sigmas[i] * num_train_timesteps,
                     jnp.float32)
        v = velocity_fn(x, t).astype(jnp.float32)
        x = x + v * float(sigmas[i + 1] - sigmas[i])
    return x


def _lam(sigma: float, eps: float = 1e-7) -> float:
    return math.log(max(1.0 - sigma, eps)) - math.log(max(sigma, eps))


def unipc_sample(velocity_fn: Callable, init_noise, num_steps: int = 50,
                 shift: float = 5.0, order: int = 2,
                 num_train_timesteps: int = 1000):
    """Flow-matching UniPC-p (bh2) with corrector
    (unipc.py:144-383,412-463). order <= 2."""
    assert order in (1, 2)
    sigmas = shifted_linear_sigmas(num_steps, shift)

    def x0_of(x, sigma):
        t = jnp.full((x.shape[0], 1), sigma * num_train_timesteps, jnp.float32)
        v = velocity_fn(x, t).astype(jnp.float32)
        return x - float(sigma) * v

    def phis(h):
        hh = -h
        h_phi_1 = math.expm1(hh)
        B_h = math.expm1(hh)  # bh2 (unipc.py:233-236)
        return hh, h_phi_1, B_h

    def uni_p(x, m0, s0, s_t, m1=None, s1=None):
        """Predictor (unipc.py:144-258). m*: x0-predictions."""
        h = _lam(s_t) - _lam(s0)
        hh, h_phi_1, B_h = phis(h)
        a_t, sg_t, sg_s0 = 1.0 - s_t, max(s_t, 1e-7), max(s0, 1e-7)
        x_t = (sg_t / sg_s0) * x - a_t * h_phi_1 * m0
        if m1 is not None:
            rk = (_lam(s1) - _lam(s0)) / h
            D1 = (m1 - m0) / rk
            x_t = x_t - a_t * B_h * 0.5 * D1   # order-2 simplification (:245)
        return x_t

    def uni_c(x_last, x_pred, m0, model_t, s0, s_t, c_order, m1=None, s1=None):
        """Corrector (unipc.py:259-383). x_last at s0; model_t = x0-pred at
        the predicted x_pred (s_t)."""
        h = _lam(s_t) - _lam(s0)
        hh, h_phi_1, B_h = phis(h)
        a_t, sg_t, sg_s0 = 1.0 - s_t, max(s_t, 1e-7), max(s0, 1e-7)
        x_t_ = (sg_t / sg_s0) * x_last - a_t * h_phi_1 * m0
        if c_order == 1 or m1 is None:
            rhos_c = [0.5]
            corr = 0.0
        else:
            rk = (_lam(s1) - _lam(s0)) / h
            # R = [[1, 1], [rk, 1]], b per unipc.py:240-249
            h_phi_k = h_phi_1 / hh - 1
            b1 = h_phi_k * 1 / B_h
            h_phi_k2 = h_phi_k / hh - 0.5
            b2 = h_phi_k2 * 2 / B_h
            R = np.array([[1.0, 1.0], [rk, 1.0]])
            rhos_c = np.linalg.solve(R, np.array([b1, b2]))
            D1 = (m1 - m0) / rk
            corr = rhos_c[0] * D1
        D1_t = model_t - m0
        return x_t_ - a_t * B_h * (corr + float(rhos_c[-1]) * D1_t)

    x = init_noise.astype(jnp.float32)
    m_hist, s_hist = [], []
    x_last = None
    for i in range(num_steps):
        s_cur = float(sigmas[i])
        m_t = x0_of(x, s_cur)
        if x_last is not None:
            c_order = min(order, len(m_hist))
            m1 = m_hist[-2] if len(m_hist) >= 2 else None
            s1 = s_hist[-2] if len(s_hist) >= 2 else None
            x = uni_c(x_last, x, m_hist[-1], m_t, s_hist[-1], s_cur,
                      c_order, m1=m1, s1=s1)
        m_hist.append(m_t)
        s_hist.append(s_cur)
        m_hist, s_hist = m_hist[-2:], s_hist[-2:]

        s_next = float(sigmas[i + 1])
        if s_next <= 1e-7:
            x = m_t
            break
        p_order = min(order, len(m_hist))
        m1 = m_hist[-2] if (p_order >= 2 and len(m_hist) >= 2) else None
        s1 = s_hist[-2] if (p_order >= 2 and len(s_hist) >= 2) else None
        x_last = x
        x = uni_p(x, m_t, s_cur, s_next, m1=m1, s1=s1)
    return x
