"""Guiders + sigma schedulers (ltx_core/components/{guiders,schedulers}.py
semantics), verified against independent numpy re-derivations."""

import numpy as np
import jax.numpy as jnp

from turbodiffusion_tpu.pipelines.guiders import (
    apg_delta, beta_sigmas, cfg_delta, cfg_star_delta,
    linear_quadratic_sigmas, multimodal_guidance, should_skip_step,
    stg_delta)


def _rand(rng, *s):
    return jnp.asarray(rng.randn(*s).astype(np.float32))


def test_cfg_and_stg_deltas():
    rng = np.random.RandomState(0)
    c, u = _rand(rng, 2, 4, 8, 8), _rand(rng, 2, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(cfg_delta(c, u, 3.0)),
                               2.0 * np.asarray(c - u), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(stg_delta(c, u, 0.5)),
                               0.5 * np.asarray(c - u), rtol=1e-6)
    assert float(jnp.abs(cfg_delta(c, u, 1.0)).max()) == 0.0


def test_cfg_star_projects_uncond():
    """uncond parallel to cond => delta vanishes (the rescaling removes the
    parallel offset entirely)."""
    rng = np.random.RandomState(1)
    c = _rand(rng, 1, 4, 8, 8)
    u = 2.5 * c
    d = cfg_star_delta(c, u, 4.0)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-4)
    # and for generic uncond matches the formula
    u2 = _rand(rng, 1, 4, 8, 8)
    cf, uf = np.asarray(c).reshape(1, -1), np.asarray(u2).reshape(1, -1)
    coef = (cf * uf).sum() / ((uf * uf).sum() + 1e-8)
    want = 3.0 * (np.asarray(c) - coef * np.asarray(u2))
    np.testing.assert_allclose(np.asarray(cfg_star_delta(c, u2, 4.0)), want,
                               rtol=1e-4, atol=1e-5)


def test_apg_decomposition_and_momentum():
    rng = np.random.RandomState(2)
    c, u = _rand(rng, 1, 4, 6, 6), _rand(rng, 1, 4, 6, 6)
    # eta=1, no threshold: reduces to plain CFG
    d, avg = apg_delta(c, u, scale=3.0, eta=1.0)
    np.testing.assert_allclose(np.asarray(d), 2.0 * np.asarray(c - u),
                               rtol=1e-4, atol=1e-5)
    assert avg is None
    # eta=0 removes the parallel component
    d0, _ = apg_delta(c, u, scale=3.0, eta=0.0)
    cf = np.asarray(c).reshape(-1)
    df = np.asarray(d0).reshape(-1)
    assert abs(np.dot(cf, df)) / (np.linalg.norm(cf) * np.linalg.norm(df)) \
        < 1e-3
    # momentum accumulates: second call uses m*avg + g
    d1, avg1 = apg_delta(c, u, scale=2.0, eta=1.0, momentum=0.5)
    np.testing.assert_allclose(np.asarray(avg1), np.asarray(c - u), rtol=1e-6)
    d2, avg2 = apg_delta(c, u, scale=2.0, eta=1.0, momentum=0.5,
                         running_avg=avg1)
    np.testing.assert_allclose(np.asarray(avg2),
                               1.5 * np.asarray(c - u), rtol=1e-6)


def test_multimodal_guidance_combination():
    rng = np.random.RandomState(3)
    c = _rand(rng, 1, 4, 8, 8)
    ut, up, um = (_rand(rng, 1, 4, 8, 8) for _ in range(3))
    pred = multimodal_guidance(c, ut, up, um, cfg_scale=2.0, stg_scale=0.5,
                               modality_scale=1.5)
    want = (np.asarray(c) + 1.0 * np.asarray(c - ut)
            + 0.5 * np.asarray(c - up) + 0.5 * np.asarray(c - um))
    np.testing.assert_allclose(np.asarray(pred), want, rtol=1e-5, atol=1e-5)
    assert should_skip_step(1, 1) and not should_skip_step(0, 1)
    assert not should_skip_step(7, 0)


def test_linear_quadratic_sigmas():
    s = linear_quadratic_sigmas(8, threshold_noise=0.025)
    assert len(s) == 9
    assert s[0] == 1.0 and s[-1] == 0.0
    assert np.all(np.diff(s) < 0)          # strictly decreasing
    # linear segment: constant decrement threshold/linear_steps
    d = -np.diff(s[:4])
    np.testing.assert_allclose(d, 0.025 / 4, rtol=1e-5)
    assert len(linear_quadratic_sigmas(1)) == 2


def test_beta_sigmas():
    s = beta_sigmas(10)
    assert s[-1] == 0.0
    assert np.all(np.diff(s) <= 0)
    assert 0.9 < s[0] <= 1.0
