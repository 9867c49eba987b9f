"""Winograd F(2,3) conv kernel vs the direct-conv reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.ops.conv_pallas import conv3x3_fused_ref
from turbodiffusion_tpu.ops.winograd import (
    from_quad, to_quad, wino_conv, wino_weights)


def _mk(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


def test_quad_roundtrip():
    x = _mk(jax.random.PRNGKey(0), (2, 3, 8, 12, 5))
    q = to_quad(x)
    assert q.shape == (4, 6, 5, 7, 5)
    # interior of the quad layout reconstructs x (strip the pad)
    y = from_quad(q, 2)  # (2, 3, 10, 14, 5) padded-ish
    np.testing.assert_array_equal(np.asarray(y)[:, :, 1:9, 1:13], x)


@pytest.mark.parametrize("kt,C,O,pre,res", [
    (1, 96, 96, "none", False),
    (3, 96, 96, "none", False),
    (3, 96, 96, "norm_silu", True),
    (3, 128, 256, "norm_silu", False),
    (1, 192, 96, "none", True),
    # O=192: BO must divide O (BO=128 left channels 128..191 unwritten
    # before the divisor fix — caught on-chip, relerr 1.46)
    (3, 96, 192, "norm_silu", False),
])
def test_wino_conv_matches_direct(kt, C, O, pre, res):
    keys = jax.random.split(jax.random.PRNGKey(1), 5)
    T_out = 2
    H, W = 8, 16
    x = _mk(keys[0], (1, T_out + kt - 1, H, W, C))
    w = _mk(keys[1], (kt, 3, 3, C, O)) * 0.1
    b = _mk(keys[2], (O,))
    gamma = None if pre == "none" else _mk(keys[3], (C,))
    residual = _mk(keys[4], (1, T_out, H, W, O)) if res else None

    got = wino_conv(x, w, b, gamma=gamma, residual=residual, pre=pre,
                    interpret=True)
    want = conv3x3_fused_ref(x, w, b, gamma=gamma, residual=residual,
                             pre=pre)
    assert got.shape == want.shape
    assert _rel_err(got, want) < 0.03, _rel_err(got, want)


def test_wino_weights_identity():
    # center-tap identity conv: the kernel must reproduce the input exactly
    # (transform coefficients are exact in fp32)
    C = 96
    w = jnp.zeros((1, 3, 3, C, C), jnp.float32).at[0, 1, 1].set(jnp.eye(C))
    wt = wino_weights(w)
    assert wt.shape == (16, C, C)
    x = _mk(jax.random.PRNGKey(2), (1, 2, 8, 16, C))
    y = wino_conv(x, w.astype(jnp.bfloat16), jnp.zeros((C,)),
                  interpret=True)
    assert _rel_err(y, x) < 1e-2
