"""Forward-mode (JVP) attention: fused kernel vs jax.jvp over the jnp
reference — the reference's own test pattern
(rcm/networks/wan2pt1_jvp_test.py:93-129, rtol 1e-3 on the tangent).

sCM distillation needs tangents through flash attention every student step;
round 1 fell back to dense jnp attention there. These tests pin the fused
one-pass (o, do) Pallas kernel (interpret mode on CPU), the sparse
LUT-gather tangent, and the model-level jvp_mode dispatch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.config import AttentionConfig
from turbodiffusion_tpu.ops.attention import (
    dense_attention_ref, get_block_map, sla_attention, sparse_attention_ref)
from turbodiffusion_tpu.ops.flash_jvp_pallas import (
    _flash_jvp_dense_pallas, _sparse_jvp_gather, flash_jvp_ref)


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def _qkv_and_tangents(key, B=1, L=192, Lk=None, H=2, D=64):
    Lk = L if Lk is None else Lk
    ks = jax.random.split(key, 6)
    q, dq = _rand(ks[0], B, L, H, D), _rand(ks[1], B, L, H, D)
    k, dk = _rand(ks[2], B, Lk, H, D), _rand(ks[3], B, Lk, H, D)
    v, dv = _rand(ks[4], B, Lk, H, D), _rand(ks[5], B, Lk, H, D)
    return q, k, v, dq, dk, dv


def test_flash_jvp_ref_matches_autodiff():
    """flash_jvp_ref math == jax.jvp through plain softmax attention."""
    q, k, v, dq, dk, dv = _qkv_and_tangents(jax.random.PRNGKey(0))
    scale = q.shape[-1] ** -0.5
    o_ref, do_ref = jax.jvp(
        lambda q_, k_, v_: dense_attention_ref(q_, k_, v_),
        (q, k, v), (dq, dk, dv))
    o, do = flash_jvp_ref(q, k, v, dq, dk, dv, scale)
    np.testing.assert_allclose(o, o_ref, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(do, do_ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("L,Lk", [(192, 192), (512, 320)])
def test_dense_jvp_kernel_matches_ref(L, Lk):
    """The fused Pallas (o, do) kernel (interpret) == autodiff tangents,
    including ragged KV lengths (padding masked inside the kernel)."""
    q, k, v, dq, dk, dv = _qkv_and_tangents(jax.random.PRNGKey(1), L=L, Lk=Lk)
    scale = q.shape[-1] ** -0.5
    o_ref, do_ref = jax.jvp(
        lambda q_, k_, v_: dense_attention_ref(q_, k_, v_),
        (q, k, v), (dq, dk, dv))
    o, do = _flash_jvp_dense_pallas(q, k, v, dq, dk, dv, scale=scale,
                                    interpret=True)
    np.testing.assert_allclose(o, o_ref, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(do, do_ref, rtol=1e-3, atol=1e-4)


def test_sparse_jvp_gather_matches_ref():
    """Sparse LUT-gather tangent == jax.jvp through the masked reference."""
    bq = bk = 64
    q, k, v, dq, dk, dv = _qkv_and_tangents(jax.random.PRNGKey(2), L=256)
    scale = q.shape[-1] ** -0.5
    _, lut, _ = get_block_map(q, k, 0.5, bq, bk)
    o_ref, do_ref = jax.jvp(
        lambda q_, k_, v_: sparse_attention_ref(q_, k_, v_, lut, bq, bk),
        (q, k, v), (dq, dk, dv))
    o, do = _sparse_jvp_gather(q, k, v, dq, dk, dv, lut, scale=scale,
                               block_q=bq, block_k=bk)
    np.testing.assert_allclose(o, o_ref, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(do, do_ref, rtol=1e-3, atol=1e-4)


def test_custom_jvp_wrappers_dispatch():
    """jax.jvp through the public wrappers (CPU: ref tangent path) matches
    autodiff; primal-only calls are unaffected."""
    from turbodiffusion_tpu.ops.flash_jvp_pallas import (
        flash_attention_jvp, sparse_attention_jvp)
    q, k, v, dq, dk, dv = _qkv_and_tangents(jax.random.PRNGKey(3))
    o_ref, do_ref = jax.jvp(
        lambda q_, k_, v_: dense_attention_ref(q_, k_, v_),
        (q, k, v), (dq, dk, dv))
    o, do = jax.jvp(lambda q_, k_, v_: flash_attention_jvp(q_, k_, v_),
                    (q, k, v), (dq, dk, dv))
    np.testing.assert_allclose(o, o_ref, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(do, do_ref, rtol=1e-3, atol=1e-4)
    # primal-only
    np.testing.assert_allclose(flash_attention_jvp(q, k, v), o_ref,
                               rtol=1e-3, atol=1e-5)

    bq = bk = 64
    _, lut, _ = get_block_map(q, k, 0.5, bq, bk)
    o_ref, do_ref = jax.jvp(
        lambda q_, k_, v_: sparse_attention_ref(q_, k_, v_, lut, bq, bk),
        (q, k, v), (dq, dk, dv))
    o, do = jax.jvp(
        lambda q_, k_, v_: sparse_attention_jvp(q_, k_, v_, lut, bq, bk),
        (q, k, v), (dq, dk, dv))
    np.testing.assert_allclose(o, o_ref, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(do, do_ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("backend", ["dense", "sla"])
def test_sla_attention_jvp_mode(backend):
    """Model-level dispatch: cfg.jvp_mode routes through forward-mode-safe
    wrappers and matches jax.jvp over the reference-impl config."""
    from turbodiffusion_tpu.ops.attention import attention
    q, k, v, dq, dk, dv = _qkv_and_tangents(jax.random.PRNGKey(4), L=256)
    D = q.shape[-1]
    proj = {"w": jnp.zeros((D, D), jnp.float32) + 0.01 * jnp.eye(D),
            "b": jnp.zeros((D,), jnp.float32)}
    ref_cfg = AttentionConfig(backend=backend, sla_topk=0.5, block_q=64,
                              block_k=64, use_reference_impl=True)
    jvp_cfg = dataclasses.replace(ref_cfg, use_reference_impl=False,
                                  jvp_mode=True)
    o_ref, do_ref = jax.jvp(
        lambda q_, k_, v_: attention(q_, k_, v_, ref_cfg, proj),
        (q, k, v), (dq, dk, dv))
    o, do = jax.jvp(
        lambda q_, k_, v_: attention(q_, k_, v_, jvp_cfg, proj),
        (q, k, v), (dq, dk, dv))
    np.testing.assert_allclose(o, o_ref, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(do, do_ref, rtol=1e-3, atol=1e-4)


def test_sparse_jvp_pallas_kernel_matches_ref():
    """The Pallas sparse JVP kernel (grouped gather of packed K|V|dK|dV,
    one-pass (o, do)) == jax.jvp through the masked reference. Ragged
    sequence tail + padded LUT entries (sel not a multiple of GROUP)."""
    from turbodiffusion_tpu.ops.flash_jvp_pallas import (
        _flash_jvp_sparse_pallas)

    bq = bk = 128
    q, k, v, dq, dk, dv = _qkv_and_tangents(jax.random.PRNGKey(4), L=520)
    scale = q.shape[-1] ** -0.5
    _, lut, _ = get_block_map(q, k, 0.6, bq, bk)   # sel=3 -> GROUP pad
    o_ref, do_ref = jax.jvp(
        lambda q_, k_, v_: sparse_attention_ref(q_, k_, v_, lut, bq, bk),
        (q, k, v), (dq, dk, dv))
    o, do = _flash_jvp_sparse_pallas(q, k, v, dq, dk, dv, lut, scale=scale,
                                     block_q=bq, block_k=bk, interpret=True)
    np.testing.assert_allclose(o, o_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(do, do_ref, rtol=1e-3, atol=1e-3)


def test_sparse_jvp_pallas_wide_lut():
    """sel_pad > 128 lanes: the sparse JVP kernel's wide-LUT SMEM row ring
    (the _lut_ring 4D layout + (idx//128, rem) indexing) vs jax.jvp through
    the masked reference. At the real topk=0.1 training geometry the JVP
    LUT stays <= 128 lanes, so this branch was untested (ADVICE r3 #2);
    mirrors test_sparse_fwd_wide_lut. On-chip validation: the 81f bench
    runs exercise only the narrow branch — wide remains interpret-only."""
    from turbodiffusion_tpu.ops.flash_jvp_pallas import (
        _flash_jvp_sparse_pallas)

    bq = bk = 64
    nK, sel = 130, 129                        # pads past one 128-lane tile
    L, Lk = 64, nK * bk
    q, k, v, dq, dk, dv = _qkv_and_tangents(jax.random.PRNGKey(11), L=L,
                                            Lk=Lk, H=1, D=16)
    scale = q.shape[-1] ** -0.5
    lut = jnp.argsort(
        jax.random.normal(jax.random.PRNGKey(12), (1, 1, 1, nK)), axis=-1
    )[..., :sel].astype(jnp.int32)
    o_ref, do_ref = jax.jvp(
        lambda q_, k_, v_: sparse_attention_ref(q_, k_, v_, lut, bq, bk,
                                                scale=scale),
        (q, k, v), (dq, dk, dv))
    o, do = _flash_jvp_sparse_pallas(q, k, v, dq, dk, dv, lut, scale=scale,
                                     block_q=bq, block_k=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(do), np.asarray(do_ref),
                               rtol=2e-3, atol=2e-3)
