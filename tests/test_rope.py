"""RoPE tests: rotate-half + channel permutation == reference interleaved."""

import jax
import jax.numpy as jnp
import numpy as np

from turbodiffusion_tpu.models.rope import (
    apply_rope, apply_rope_interleaved, permute_qk_linear,
    rope_channel_permutation, rope_freqs_3d)


def test_rotate_half_equals_interleaved_after_permutation():
    B, L, H, D = 2, 24, 3, 24
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, H, D))
    freqs = rope_freqs_3d(2, 4, 3, D)
    perm = np.asarray(rope_channel_permutation(D, 1))  # within one head
    ref = apply_rope_interleaved(x, freqs)
    fast = apply_rope(x[..., perm], freqs)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref)[..., perm],
                               rtol=1e-5, atol=1e-6)


def test_scores_invariant_under_permutation():
    """q·k after rotate-half rope on permuted channels equals q·k after
    interleaved rope on original channels — the correctness condition for
    the weight-permutation trick."""
    B, L, H, D = 1, 16, 2, 12
    kq, kk = jax.random.split(jax.random.PRNGKey(1))
    q = jax.random.normal(kq, (B, L, H, D))
    k = jax.random.normal(kk, (B, L, H, D))
    freqs = rope_freqs_3d(2, 2, 4, D)
    perm = np.asarray(rope_channel_permutation(D, 1))

    s_ref = jnp.einsum("blhd,bmhd->bhlm", apply_rope_interleaved(q, freqs),
                       apply_rope_interleaved(k, freqs))
    s_fast = jnp.einsum("blhd,bmhd->bhlm", apply_rope(q[..., perm], freqs),
                        apply_rope(k[..., perm], freqs))
    np.testing.assert_allclose(np.asarray(s_fast), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-5)


def test_permute_qk_linear_matches_activation_permutation():
    D_model, H, Dh = 24, 2, 12
    w = jax.random.normal(jax.random.PRNGKey(2), (D_model, D_model))
    b = jax.random.normal(jax.random.PRNGKey(3), (D_model,))
    x = jax.random.normal(jax.random.PRNGKey(4), (5, D_model))
    perm = np.asarray(rope_channel_permutation(Dh, H))
    p2 = permute_qk_linear({"w": w, "b": b}, Dh, H)
    y_ref = (x @ w + b)[:, perm]
    y_fast = x @ p2["w"] + p2["b"]
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_freqs_3d_axis_split():
    """head_dim split: dim_h = dim_w = d//6*2, dim_t = rest
    (wan2pt1.py:60-64); t-angles vary only with t, etc."""
    T, Hh, W, D = 3, 2, 2, 24
    freqs = np.asarray(rope_freqs_3d(T, Hh, W, D)).reshape(T, Hh, W, D // 2)
    dim_h = D // 6 * 2
    dim_t = D - 2 * dim_h
    # temporal part constant across h, w
    np.testing.assert_allclose(freqs[:, 0, 0, :dim_t // 2],
                               freqs[:, 1, 1, :dim_t // 2])
    # spatial-h part constant across t, w
    sl = slice(dim_t // 2, dim_t // 2 + dim_h // 2)
    np.testing.assert_allclose(freqs[0, :, 0, sl], freqs[2, :, 1, sl])
    # position 0 has zero angle everywhere
    np.testing.assert_allclose(freqs[0, 0, 0], 0.0)
