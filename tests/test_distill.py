"""rCM distillation tests on the tiny model (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.config import wan_test_config
from turbodiffusion_tpu.models.wan import init_wan_params
from turbodiffusion_tpu.training import distill as D
from turbodiffusion_tpu.training.timesteps import (
    ema_beta, power_ema_gamma, rf_to_trig_time, trig_to_rf_time,
    trigflow_scaling)
from turbodiffusion_tpu.training.train_step import make_optimizer


CFG = wan_test_config()
DCFG = D.DistillConfig(student_update_freq=3, max_simulation_steps_fake=2,
                       teacher_guidance=1.0, ema_rate=0.15)


@pytest.fixture(scope="module")
def setup():
    teacher = init_wan_params(jax.random.PRNGKey(0), CFG)
    # nonzero head so velocities are nontrivial
    teacher["head"]["head"]["w"] = jnp.ones_like(
        teacher["head"]["head"]["w"]) * 0.01
    opt = make_optimizer(lr=1e-4)
    state = D.create_distill_state(teacher, opt, DCFG, with_fake=True)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (2, 16, 2, 4, 4)),
        "t5_text_embeddings": jax.random.normal(
            jax.random.PRNGKey(2), (2, CFG.text_len, CFG.text_dim)),
    }
    return state, batch, opt


def test_trigflow_scaling_identities():
    """c_skip/c_out/c_in/c_noise (denoiser_scaling.py:19-30); at trig time of
    rf t, c_noise*1e-3 recovers the RF time."""
    t = jnp.asarray([[0.5]])
    trig = rf_to_trig_time(t)
    c_skip, c_out, c_in, c_noise = trigflow_scaling(trig, 1000.0)
    np.testing.assert_allclose(np.asarray(c_noise).item() / 1000.0, 0.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_skip), np.asarray(c_in), rtol=1e-6)
    # rf->trig->rf roundtrip
    np.testing.assert_allclose(np.asarray(trig_to_rf_time(trig)).item(), 0.5, rtol=1e-5)


def test_denoise_f_prediction_consistency(setup):
    """F = (cos t * xt - x0)/sin t must invert: x0 = cos t*xt - sin t*F
    (t2v_model_distill_rcm.py:417-420)."""
    state, batch, _ = setup
    xt = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 2, 4, 4))
    t = jnp.full((2, 1), 0.9)
    x0, F = D.denoise(state.teacher, CFG, xt, t, batch["t5_text_embeddings"],
                      DCFG)
    t5 = t[:, :, None, None, None]
    np.testing.assert_allclose(
        np.asarray(jnp.cos(t5) * xt - jnp.sin(t5) * F), np.asarray(x0),
        rtol=1e-4, atol=1e-5)


def test_student_jvp_tangent_finite(setup):
    state, batch, _ = setup
    xt = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 2, 4, 4))
    t = jnp.full((2, 1), 0.8)
    t_xt = jnp.ones_like(xt) * 0.1
    t_t = jnp.ones_like(t) * 0.2
    F, tF = D.student_F_and_tangent(state.student, CFG, xt, t_xt, t, t_t,
                                    batch["t5_text_embeddings"], DCFG)
    assert np.isfinite(np.asarray(F)).all()
    assert np.isfinite(np.asarray(tF)).all()
    assert np.abs(np.asarray(tF)).max() > 0


def test_backward_simulation_shapes(setup):
    state, batch, _ = setup
    out = D.backward_simulation(state.student, CFG, DCFG,
                                batch["t5_text_embeddings"], (2, 16, 2, 4, 4),
                                n_steps=2, key=jax.random.PRNGKey(5),
                                with_grad=False)
    assert out.shape == (2, 16, 2, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_phase_schedule():
    """iteration 0 student, then student_update_freq-1... pattern
    (t2v_model_distill_rcm.py:294-299)."""
    phases = [D.is_student_phase(i, DCFG, has_fake=True) for i in range(7)]
    assert phases == [True, False, False, True, False, False, True]
    assert D.effective_iteration(6, DCFG, True) == 2
    # without fake score: always student
    assert all(D.is_student_phase(i, DCFG, has_fake=False) for i in range(5))


def test_full_train_steps_student_and_critic(setup):
    state, batch, opt = setup
    step = D.make_distill_steps(CFG, DCFG, opt, with_fake=True)
    s0 = jax.tree.leaves(state.student)[0].copy()
    f0 = jax.tree.leaves(state.fake_score)[0].copy()

    state, m = step(state, batch, jax.random.PRNGKey(6))   # iter 0: student
    assert np.isfinite(float(m["loss"]))
    state, m = step(state, batch, jax.random.PRNGKey(7))   # iter 1: critic
    assert np.isfinite(float(m["loss_critic"]))

    s1 = jax.tree.leaves(state.student)[0]
    f1 = jax.tree.leaves(state.fake_score)[0]
    assert np.abs(np.asarray(s1) - np.asarray(s0)).max() > 0
    assert np.abs(np.asarray(f1) - np.asarray(f0)).max() > 0
    # teacher untouched
    assert state.teacher is not None


def test_ema_beta_schedule():
    gamma = power_ema_gamma(0.15)
    assert gamma > 0
    assert ema_beta(0, gamma) == 0.0
    b10, b1000 = ema_beta(10, gamma), ema_beta(1000, gamma)
    assert 0 < b10 < b1000 < 1.0


def test_dcm_loss_runs(setup):
    state, batch, _ = setup
    dcfg = D.DistillConfig(cm_type="dcm", teacher_guidance=1.0)
    loss = D.dcm_loss(state.student, state.teacher, CFG, dcfg,
                      batch["latents"], batch["t5_text_embeddings"], None,
                      jax.random.PRNGKey(8), 0)
    assert np.isfinite(float(loss))
