"""Teacher sampler tests: convergence on an analytic flow-matching problem.

For a Gaussian-to-point flow with target x0*, the exact velocity field is
v(x, sigma) = (x - x0*) / sigma (RF: x_sigma = (1-sigma) x0 + sigma eps).
Both samplers must recover x0*; UniPC must beat Euler at equal step counts
on a nonlinear velocity field.
"""

import jax
import jax.numpy as jnp
import numpy as np

from turbodiffusion_tpu.pipelines.teacher_samplers import (
    euler_sample, shifted_linear_sigmas, unipc_sample)

X0 = 0.37


def _oracle(x, t_B1):
    sigma = t_B1[0, 0] / 1000.0
    return (x - X0) / jnp.maximum(sigma, 1e-6)


def test_sigma_schedule_shift():
    """shift*s/(1+(shift-1)s) applied to linspace (euler.py:16-21)."""
    s = shifted_linear_sigmas(4, shift=3.0)
    assert s[0] == 1.0 and s[-1] == 0.0
    raw = np.linspace(1, 0, 5)[:-1]
    np.testing.assert_allclose(s[:-1], 3 * raw / (1 + 2 * raw), rtol=1e-6)


def test_euler_recovers_target():
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 4, 4))
    out = euler_sample(_oracle, noise, num_steps=100, shift=3.0)
    np.testing.assert_allclose(np.asarray(out), X0, atol=0.02)


def test_unipc_recovers_target():
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 4, 4))
    out = unipc_sample(_oracle, noise, num_steps=30, shift=5.0)
    np.testing.assert_allclose(np.asarray(out), X0, atol=0.02)


def test_unipc_beats_euler_on_nonlinear_field():
    """Probability-flow ODE of an RF between N(0,1) and N(mu, 0.2^2):
    x0-prediction is the posterior mean — nonlinear in sigma. Compare both
    solvers at 8 steps against a 400-step Euler ground truth."""
    mu, s0 = 0.8, 0.2

    def velocity(x, t_B1):
        sigma = jnp.maximum(t_B1[0, 0] / 1000.0, 1e-6)
        a = 1.0 - sigma
        var = (a * s0) ** 2 + sigma ** 2
        x0_hat = (a * s0 ** 2 * x + sigma ** 2 * mu * 0 + mu * sigma ** 2 * 0
                  + mu * sigma ** 2) / var * 1.0
        # posterior mean of x0 given x_t: (a*s0^2*x + sigma^2*mu) / var... for
        # x_t = a x0 + sigma eps, x0|x_t ~ N((a s0^2 x + sigma^2 mu)/var, .)
        x0_hat = (a * s0 ** 2 * x + sigma ** 2 * mu) / var
        return (x - x0_hat) / sigma

    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
    truth = euler_sample(velocity, noise, num_steps=400, shift=3.0)
    e8 = euler_sample(velocity, noise, num_steps=8, shift=3.0)
    u8 = unipc_sample(velocity, noise, num_steps=8, shift=3.0)
    err_e = np.abs(np.asarray(e8 - truth)).mean()
    err_u = np.abs(np.asarray(u8 - truth)).mean()
    assert err_u < err_e, (err_u, err_e)
    assert err_u < 0.1
