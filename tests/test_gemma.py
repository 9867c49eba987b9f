"""Gemma-3 feature extractor + embeddings connector tests."""

import jax
import jax.numpy as jnp
import numpy as np

from turbodiffusion_tpu.models.gemma import (
    connector_apply, gemma3_encode, gemma_test_config, init_connector_params,
    init_gemma_params, trim_padded)


CFG = gemma_test_config()


def test_gemma_encode_shapes_and_causality():
    params = init_gemma_params(jax.random.PRNGKey(0), CFG)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, CFG.vocab_size)
    mask = jnp.ones((1, 8), jnp.int32)
    out = gemma3_encode(params, ids, mask, CFG)
    assert out.shape == (1, 8, CFG.hidden_size)
    assert np.isfinite(np.asarray(out)).all()
    # causality: token 0 features unchanged when later tokens change
    ids2 = ids.at[0, 5:].set(7)
    out2 = gemma3_encode(params, ids2, mask, CFG)
    np.testing.assert_allclose(np.asarray(out[0, :5]), np.asarray(out2[0, :5]),
                               rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(out[0, 5:]) - np.asarray(out2[0, 5:])).max() > 1e-5


def test_connector_registers_replace_padding():
    D, H, Dh, R = CFG.hidden_size, 2, 16, 4
    params = init_connector_params(jax.random.PRNGKey(0), D, H, Dh,
                                   num_registers=R, dtype=jnp.float32)
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, 8, D))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 1, 0, 0]], jnp.int32)
    out, out_mask = connector_apply(params, hidden, mask, H, Dh,
                                    num_registers=R)
    assert out.shape == hidden.shape
    assert np.asarray(out_mask).min() == 1  # all positions valid afterwards
    assert np.isfinite(np.asarray(out)).all()


def test_trim_padded():
    enc = jnp.arange(8.0).reshape(1, 4, 2)
    mask = jnp.asarray([[0, 1, 1, 0]])
    t, m = trim_padded(enc, mask)
    assert t.shape == (1, 2, 2) and m is None
    np.testing.assert_allclose(np.asarray(t[0, 0]), [2.0, 3.0])
