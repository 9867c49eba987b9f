"""Equivalence tests for the fused norm/modulate/RoPE Pallas kernels
(ops/fused_norm.py) against the exact unfused chains they replace — the
JVP-test pattern from the reference (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.models import layers as L
from turbodiffusion_tpu.models.rope import apply_rope, rope_freqs_3d
from turbodiffusion_tpu.ops.fused_norm import (
    _mln_pallas, _rmsrope_pallas, modulated_layer_norm_ref, rope_cos_sin_full,
    rmsnorm_rope_ref)

B, T, H_SP, W_SP = 1, 2, 4, 6
SEQ = T * H_SP * W_SP * 11  # 528 — exercises a non-multiple-of-block_l tail
DIM, HEADS, DH = 256, 2, 128


@pytest.fixture
def data():
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (B, SEQ, DIM), jnp.bfloat16)
    e = jax.random.normal(ks[1], (B, 6, DIM), jnp.float32)
    w = 1.0 + 0.1 * jax.random.normal(ks[2], (DIM,), jnp.bfloat16)
    bias = 0.1 * jax.random.normal(ks[3], (DIM,), jnp.bfloat16)
    return x, e, w, bias


def test_mln_ref_matches_unfused_chain(data):
    """The _ref function reproduces wan_block's exact cast chain."""
    x, e, _, _ = data
    e0, e1 = e[:, 0:1], e[:, 1:2]
    unfused = (L.layer_norm(x, eps=1e-6).astype(jnp.float32)
               * (1 + e1) + e0).astype(x.dtype)
    fused = modulated_layer_norm_ref(x, e1, e0, eps=1e-6)
    np.testing.assert_array_equal(np.asarray(unfused, jnp.float32),
                                  np.asarray(fused, jnp.float32))


def test_mln_pallas_interpret_matches_ref(data):
    x, e, w, bias = data
    e0, e1 = e[:, 0], e[:, 1]
    ref = modulated_layer_norm_ref(x, e1, e0, eps=1e-6)
    out = _mln_pallas(x, e1, e0, None, None, 1e-6, interpret=True,
                      block_l=128)
    np.testing.assert_allclose(np.asarray(out, jnp.float32),
                               np.asarray(ref, jnp.float32), atol=2e-2)


def test_mln_pallas_affine_no_mod(data):
    """norm3 mode: affine LayerNorm without modulation."""
    x, _, w, bias = data
    ref = L.layer_norm(x, eps=1e-6, scale=w, bias=bias)
    out = _mln_pallas(x, None, None, w, bias, 1e-6, interpret=True,
                      block_l=128)
    np.testing.assert_allclose(np.asarray(out, jnp.float32),
                               np.asarray(ref, jnp.float32), atol=2e-2)


def test_rmsrope_ref_matches_unfused_chain(data):
    """rmsnorm_rope_ref == rms_norm (full-dim) + apply_rope composition."""
    x, _, w, _ = data
    freqs = rope_freqs_3d(T, H_SP, W_SP * 11, DH)
    unfused = apply_rope(
        L.rms_norm(x, w, eps=1e-5).reshape(B, SEQ, HEADS, DH), freqs)
    cosF, sinF = rope_cos_sin_full(freqs)
    fused = rmsnorm_rope_ref(x, w, cosF, sinF, eps=1e-5)
    np.testing.assert_allclose(np.asarray(unfused, jnp.float32),
                               np.asarray(fused, jnp.float32), atol=1e-6)


def test_rmsrope_pallas_interpret_matches_ref(data):
    x, _, w, _ = data
    freqs = rope_freqs_3d(T, H_SP, W_SP * 11, DH)
    cosF, sinF = rope_cos_sin_full(freqs)
    ref = rmsnorm_rope_ref(x, w, cosF, sinF, eps=1e-5)
    out = _rmsrope_pallas(x, w, cosF, sinF, 1e-5, HEADS, interpret=True,
                          block_l=128)
    np.testing.assert_allclose(
        np.asarray(out.reshape(B, SEQ, HEADS, DH), jnp.float32),
        np.asarray(ref, jnp.float32), atol=2e-2)


def test_rmsrope_pallas_norm_only(data):
    """Cross-attention Q mode: RMSNorm without rope."""
    x, _, w, _ = data
    ref = L.rms_norm(x, w, eps=1e-5)
    out = _rmsrope_pallas(x, w, None, None, 1e-5, HEADS, interpret=True,
                          block_l=128)
    np.testing.assert_allclose(np.asarray(out, jnp.float32),
                               np.asarray(ref, jnp.float32), atol=2e-2)


def test_mln_quant_out_matches_quantize_rows():
    """quant_out=True emits the same int8/scales as LN followed by the
    standalone row quantizer (the fusion it replaces)."""
    import numpy as _np
    from turbodiffusion_tpu.ops.fused_norm import (
        _mln_pallas, modulated_layer_norm_ref)
    B, L, D = 1, 192, 128
    rng = _np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    ms = jnp.asarray(rng.randn(B, D), jnp.float32)
    mb = jnp.asarray(rng.randn(B, D), jnp.float32)

    xq, rs = _mln_pallas(x, ms, mb, None, None, 1e-6, interpret=True,
                         quant_out=True)
    y = modulated_layer_norm_ref(x, ms[:, None], mb[:, None], None, None,
                                 1e-6).astype(jnp.float32)
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    want_q = jnp.round(y / scale)
    _np.testing.assert_allclose(_np.asarray(rs), _np.asarray(scale),
                                rtol=1e-5)
    # int8 rounding boundaries: allow off-by-one on ties
    diff = _np.abs(_np.asarray(xq, _np.int32) - _np.asarray(want_q, _np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01

    # dequantized product is close to the float LN output
    deq = _np.asarray(xq, _np.float32) * _np.asarray(rs)
    _np.testing.assert_allclose(deq, _np.asarray(y), atol=float(
        _np.abs(_np.asarray(y)).max()) / 100)


def test_fused_norm_kernels_differentiable():
    """Reverse-mode through the Pallas fused norms (custom_vjp with
    jnp-recompute backward) == grads through the reference chain. Training
    traverses these on TPU — the kernels themselves have no autodiff rules
    (pltpu.roll), so this wrapper is what keeps TPU training alive."""
    import numpy as _np
    from turbodiffusion_tpu.ops.fused_norm import (
        modulated_layer_norm, modulated_layer_norm_ref, rmsnorm_rope,
        rmsnorm_rope_ref)
    r = _np.random.RandomState(0)
    B, L, D = 1, 64, 128
    x = jnp.asarray(r.randn(B, L, D), jnp.float32)
    ms = jnp.asarray(r.randn(B, 1, D), jnp.float32)
    mb = jnp.asarray(r.randn(B, 1, D), jnp.float32)
    g1 = jax.grad(lambda x_: jnp.sum(
        modulated_layer_norm(x_, ms, mb, interpret=True) ** 2))(x)
    g2 = jax.grad(lambda x_: jnp.sum(
        modulated_layer_norm_ref(x_, ms, mb) ** 2))(x)
    _np.testing.assert_allclose(_np.asarray(g1), _np.asarray(g2),
                                rtol=1e-4, atol=1e-4)

    w = jnp.asarray(r.randn(D), jnp.float32)
    cos = jnp.asarray(r.randn(L, D), jnp.float32)
    sin = jnp.asarray(r.randn(L, D), jnp.float32)
    g1, gw1 = jax.grad(lambda x_, w_: jnp.sum(
        rmsnorm_rope(x_, w_, cos, sin, num_heads=1, interpret=True) ** 2),
        argnums=(0, 1))(x, w)
    g2, gw2 = jax.grad(lambda x_, w_: jnp.sum(
        rmsnorm_rope_ref(x_, w_, cos, sin) ** 2), argnums=(0, 1))(x, w)
    _np.testing.assert_allclose(_np.asarray(g1), _np.asarray(g2),
                                rtol=1e-4, atol=1e-4)
    _np.testing.assert_allclose(_np.asarray(gw1), _np.asarray(gw2),
                                rtol=1e-4, atol=1e-4)
