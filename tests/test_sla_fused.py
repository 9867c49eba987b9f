"""Tests for the fused SLA front-end (ops/sla_fused.py + sla_attention_fused).

Strategy (the reference's equivalence-test pattern, SURVEY.md §4): each fused
kernel vs its jnp reference in interpret mode, plus a full-coverage
(topk=1.0) fused-vs-dense attention test — with every block selected the
sparse traversal must reproduce dense softmax attention up to int8 noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.config import AttentionConfig
from turbodiffusion_tpu.models.layers import rms_norm
from turbodiffusion_tpu.models.rope import rope_freqs_3d
from turbodiffusion_tpu.ops.attention import dense_attention_ref, sla_attention_fused
from turbodiffusion_tpu.ops.fused_norm import rope_cos_sin_full, rmsnorm_rope_ref
from turbodiffusion_tpu.ops.sla_fused import (
    block_map_from_pooled, head_planes, head_planes_ref, subquant_planes,
    unfold_quant)

B, L, H, DH = 1, 520, 2, 128  # L deliberately not a block multiple
HD = H * DH


@pytest.fixture
def data():
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (B, L, HD), jnp.bfloat16)
    w = 1.0 + 0.1 * jax.random.normal(ks[1], (HD,), jnp.bfloat16)
    freqs = rope_freqs_3d(2, 13, 20, DH)
    cosF, sinF = rope_cos_sin_full(freqs)
    return x, w, cosF, sinF


def test_head_planes_all_outputs(data):
    x, w, cosF, sinF = data
    pad_to = 1024
    cosP = jnp.pad(cosF, ((0, pad_to - L), (0, 0)))
    sinP = jnp.pad(sinF, ((0, pad_to - L), (0, 0)))
    out = head_planes(x, w, cosP, sinP, num_heads=H, eps=1e-5, pool=128,
                      quant=True, bf16_out=True, pad_to=pad_to,
                      interpret=True)
    ref = head_planes_ref(x, w, cosF, sinF, num_heads=H, eps=1e-5, pool=128)
    np.testing.assert_allclose(
        np.asarray(out["bf16"][:, :, :L], jnp.float32),
        np.asarray(ref["bf16"], jnp.float32), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out["pooled"], jnp.float32),
        np.asarray(ref["pooled"], jnp.float32), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out["scale"][:, :, :L]), np.asarray(ref["scale"]),
        rtol=2e-2)
    # int8 values within 1 ulp of the reference quantization
    assert np.abs(np.asarray(out["i8"][:, :, :L], np.int32)
                  - np.asarray(ref["i8"], np.int32)).max() <= 2


def test_head_planes_fold_only(data):
    """V mode: no norm, no rope — pure fold + quant."""
    x, _, _, _ = data
    out = head_planes(x, num_heads=H, quant=True, bf16_out=True,
                      pad_to=1024, interpret=True)
    ref = jnp.swapaxes(x.reshape(B, L, H, DH), 1, 2)
    np.testing.assert_array_equal(
        np.asarray(out["bf16"][:, :, :L], jnp.float32),
        np.asarray(ref, jnp.float32))


def test_head_planes_light_pass_tl512(data):
    """K/V-style light passes (not quant+bf16 together) take 512-row tiles
    (TDX_HP_TL512 default-on); equivalence vs the reference at TL=512."""
    x, w, cosF, sinF = data
    pad_to = 1024
    cosP = jnp.pad(cosF, ((0, pad_to - L), (0, 0)))
    sinP = jnp.pad(sinF, ((0, pad_to - L), (0, 0)))
    ref = head_planes_ref(x, w, cosF, sinF, num_heads=H, eps=1e-5, pool=128)
    # bf16+pool, no quant (the K pass shape)
    out = head_planes(x, w, cosP, sinP, num_heads=H, eps=1e-5, pool=128,
                      quant=False, bf16_out=True, pad_to=pad_to,
                      interpret=True)
    np.testing.assert_allclose(
        np.asarray(out["bf16"][:, :, :L], jnp.float32),
        np.asarray(ref["bf16"], jnp.float32), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out["pooled"], jnp.float32),
        np.asarray(ref["pooled"], jnp.float32), atol=2e-2)
    # quant-only (no bf16 plane) — also a light pass
    out_q = head_planes(x, w, cosP, sinP, num_heads=H, eps=1e-5,
                        quant=True, bf16_out=False, pad_to=pad_to,
                        interpret=True)
    assert np.abs(np.asarray(out_q["i8"][:, :, :L], np.int32)
                  - np.asarray(ref["i8"], np.int32)).max() <= 2
    np.testing.assert_allclose(
        np.asarray(out_q["scale"][:, :, :L]), np.asarray(ref["scale"]),
        rtol=2e-2)


def test_block_map_k_mean(data):
    """k_mean recovered from pooled blocks == full-tensor mean."""
    x, w, cosF, sinF = data
    ref = head_planes_ref(x, w, cosF, sinF, num_heads=H, eps=1e-5, pool=128)
    _, _, k_mean = block_map_from_pooled(ref["pooled"], ref["pooled"], L,
                                         128, 0.5)
    full_mean = jnp.mean(ref["bf16"].astype(jnp.float32), axis=2,
                         keepdims=True)
    np.testing.assert_allclose(np.asarray(k_mean), np.asarray(full_mean),
                               atol=2e-3)


def test_subquant_planes(data):
    x, _, _, _ = data
    planes = jnp.swapaxes(x.reshape(B, L, H, DH), 1, 2)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 1024 - L), (0, 0)))
    mu = jnp.mean(planes.astype(jnp.float32), axis=2, keepdims=True)
    i8, sc = subquant_planes(planes, mu, interpret=True)
    deq = np.asarray(i8, np.float32) * np.asarray(sc)
    ref = np.asarray(planes, np.float32) - np.asarray(mu)
    np.testing.assert_allclose(deq, ref, atol=np.abs(ref).max() / 100)


def test_unfold_quant(data):
    x, _, _, _ = data
    planes = jnp.swapaxes(x.reshape(B, L, H, DH), 1, 2)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 1024 - L), (0, 0)))
    i8, sc = unfold_quant(planes, L, interpret=True)
    assert i8.shape == (B, L, HD)
    deq = np.asarray(i8, np.float32) * np.asarray(sc)
    np.testing.assert_allclose(deq, np.asarray(x, np.float32),
                               atol=float(jnp.abs(x).max()) / 80)


def test_unfold_quant_wide():
    """Wide-model (H*Dh > 4096) two-pass path: per-token scales across all
    heads, per-head int8 writes (the 14B O-projection feed; the one-pass
    kernel VMEM-stack-OOMs at H=40)."""
    Hw, Dh, Lw = 40, 128, 512
    x = jax.random.normal(jax.random.PRNGKey(3), (1, Lw, Hw * Dh),
                          jnp.bfloat16)
    planes = jnp.swapaxes(x.reshape(1, Lw, Hw, Dh), 1, 2)
    i8, sc = unfold_quant(planes, Lw - 8, interpret=True)
    assert i8.shape == (1, Lw - 8, Hw * Dh)
    deq = np.asarray(i8, np.float32) * np.asarray(sc)
    np.testing.assert_allclose(deq, np.asarray(x[:, :Lw - 8], np.float32),
                               atol=float(jnp.abs(x).max()) / 80)


@pytest.mark.parametrize("v_quant", ["row", "channel"])
def test_fused_full_coverage_matches_dense(data, v_quant):
    """topk=1.0: every K block selected => fused SageSLA == dense softmax
    attention on the normed+roped tensors, up to int8 quantization noise.
    v_quant="channel" exercises the descriptor-minimal kernel (per-block K
    scales in SMEM + per-channel V folded at the finalize)."""
    x, w, cosF, sinF = data
    kx = jax.random.split(jax.random.PRNGKey(7), 3)
    q_proj = jax.random.normal(kx[0], (B, L, HD), jnp.bfloat16)
    k_proj = jax.random.normal(kx[1], (B, L, HD), jnp.bfloat16)
    v_proj = jax.random.normal(kx[2], (B, L, HD), jnp.bfloat16)

    cfg = AttentionConfig(backend="sagesla", sla_topk=1.0, block_q=128,
                          block_k=128, linear_branch=False,
                          v_quant=v_quant)
    o_planes = sla_attention_fused(
        q_proj, k_proj, v_proj, w, w, (cosF, sinF), None, cfg,
        num_heads=H, eps=1e-5, interpret=True)
    out = jnp.swapaxes(o_planes[:, :, :L], 1, 2)     # (B, L, H, DH)

    q = rmsnorm_rope_ref(q_proj, w, cosF, sinF, eps=1e-5)
    k = rmsnorm_rope_ref(k_proj, w, cosF, sinF, eps=1e-5)
    v = v_proj.reshape(B, L, H, DH)
    # dense ref wants (B, L, H, D)
    ref = dense_attention_ref(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32))
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    rel = err.max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.06, rel


def test_fused_grad_matches_dense_chain(data):
    """value_and_grad through sla_attention_fused (custom_vjp: fused fwd,
    composable recompute bwd). At topk=1.0 the composable sparse path equals
    dense attention, so grads must match the dense rmsnorm+rope+attention
    chain up to the fwd's int8 noise entering the loss cotangent."""
    x, w, cosF, sinF = data
    kx = jax.random.split(jax.random.PRNGKey(9), 3)
    q_proj = jax.random.normal(kx[0], (B, L, HD), jnp.bfloat16)
    k_proj = jax.random.normal(kx[1], (B, L, HD), jnp.bfloat16)
    v_proj = jax.random.normal(kx[2], (B, L, HD), jnp.bfloat16)
    cfg = AttentionConfig(backend="sagesla", sla_topk=1.0, block_q=128,
                          block_k=128, linear_branch=False)

    def fused_loss(q_, k_, v_, w_):
        o = sla_attention_fused(q_, k_, v_, w_, w_, (cosF, sinF), None, cfg,
                                num_heads=H, eps=1e-5, interpret=True)
        return jnp.sum(o[:, :, :L].astype(jnp.float32) ** 2)

    def dense_loss(q_, k_, v_, w_):
        q = rmsnorm_rope_ref(q_, w_, cosF, sinF, eps=1e-5)
        k = rmsnorm_rope_ref(k_, w_, cosF, sinF, eps=1e-5)
        v = v_.reshape(B, L, H, DH)
        o = dense_attention_ref(q.astype(jnp.float32),
                                k.astype(jnp.float32),
                                v.astype(jnp.float32))
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g1 = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(q_proj, k_proj, v_proj,
                                                    w)
    g2 = jax.grad(dense_loss, argnums=(0, 1, 2, 3))(q_proj, k_proj, v_proj,
                                                    w)
    for a, b, name in zip(g1, g2, ["dq", "dk", "dv", "dw"]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        assert np.isfinite(a).all(), name
        assert np.abs(a - b).max() / scale < 0.15, (
            name, np.abs(a - b).max() / scale)


def test_fused_grad_sparse_qkv_fused_runs(data):
    """Sparse coverage + fused-QKV input: grads exist, are finite, and the
    padded rows [L, Lp) contribute nothing (their cotangents are sliced
    away by the consumer)."""
    x, w, cosF, sinF = data
    kx = jax.random.split(jax.random.PRNGKey(10), 1)[0]
    qkv = jax.random.normal(kx, (B, L, 3 * HD), jnp.bfloat16)
    proj_l = {"w": jnp.zeros((DH, DH), jnp.float32),
              "b": jnp.zeros((DH,), jnp.float32)}
    cfg = AttentionConfig(backend="sagesla", sla_topk=0.5, block_q=128,
                          block_k=128, linear_branch=True)

    def loss(qkv_, pl_):
        o = sla_attention_fused(qkv_, None, None, w, w, (cosF, sinF), pl_,
                                cfg, num_heads=H, eps=1e-5, qkv_fused=True,
                                interpret=True)
        return jnp.sum(o[:, :, :L].astype(jnp.float32) ** 2)

    g_qkv, g_pl = jax.grad(loss, argnums=(0, 1))(qkv, proj_l)
    assert np.isfinite(np.asarray(g_qkv, np.float32)).all()
    assert float(jnp.abs(g_qkv).max()) > 0
    assert np.isfinite(np.asarray(g_pl["w"], np.float32)).all()


def test_fused_with_linear_branch_zero_proj(data):
    """Zero proj_l => linear branch contributes exactly its bias (zero)."""
    x, w, cosF, sinF = data
    kx = jax.random.split(jax.random.PRNGKey(8), 3)
    q_proj = jax.random.normal(kx[0], (B, L, HD), jnp.bfloat16)
    k_proj = jax.random.normal(kx[1], (B, L, HD), jnp.bfloat16)
    v_proj = jax.random.normal(kx[2], (B, L, HD), jnp.bfloat16)
    proj_l = {"w": jnp.zeros((DH, DH), jnp.float32),
              "b": jnp.zeros((DH,), jnp.float32)}

    base = AttentionConfig(backend="sagesla", sla_topk=0.5, block_q=128,
                           block_k=128, linear_branch=False)
    with_lin = AttentionConfig(backend="sagesla", sla_topk=0.5, block_q=128,
                               block_k=128, linear_branch=True)
    o1 = sla_attention_fused(q_proj, k_proj, v_proj, w, w, (cosF, sinF),
                             None, base, num_heads=H, eps=1e-5,
                             interpret=True)
    o2 = sla_attention_fused(q_proj, k_proj, v_proj, w, w, (cosF, sinF),
                             proj_l, with_lin, num_heads=H, eps=1e-5,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(o1[:, :, :L], np.float32),
                               np.asarray(o2[:, :, :L], np.float32),
                               atol=1e-6)


def test_fused_wide_dim5120_matches_dense():
    """14B-width (H*Dh = 5120 > 4096) fused front-end: row_rms_inv pre-pass
    + head-group tiling must reproduce the composable chain. The gate at
    models/wan.py:57-60 routes 14B inference through this path; until r4 it
    had no equivalence test (VERDICT r3 missing #1). topk=1.0 => the fused
    SageSLA output must match dense softmax attention on the normed+roped
    tensors up to int8 noise."""
    Hw, Dh = 40, 128
    HDw = Hw * Dh
    Lw = 256
    ks = jax.random.split(jax.random.PRNGKey(21), 4)
    q_proj = jax.random.normal(ks[0], (B, Lw, HDw), jnp.bfloat16)
    k_proj = jax.random.normal(ks[1], (B, Lw, HDw), jnp.bfloat16)
    v_proj = jax.random.normal(ks[2], (B, Lw, HDw), jnp.bfloat16)
    w = 1.0 + 0.1 * jax.random.normal(ks[3], (HDw,), jnp.bfloat16)
    freqs = rope_freqs_3d(2, 8, 16, Dh)
    cosF, sinF = rope_cos_sin_full(freqs)

    cfg = AttentionConfig(backend="sagesla", sla_topk=1.0, block_q=128,
                          block_k=128, linear_branch=False,
                          v_quant="channel")
    o_planes = sla_attention_fused(
        q_proj, k_proj, v_proj, w, w, (cosF, sinF), None, cfg,
        num_heads=Hw, eps=1e-5, interpret=True)
    out = jnp.swapaxes(o_planes[:, :, :Lw], 1, 2)    # (B, L, H, Dh)

    q = rmsnorm_rope_ref(q_proj, w, cosF, sinF, eps=1e-5)
    k = rmsnorm_rope_ref(k_proj, w, cosF, sinF, eps=1e-5)
    v = v_proj.reshape(B, Lw, Hw, Dh)
    ref = dense_attention_ref(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32))
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    rel = err.max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.06, rel


def test_fused_full_coverage_block_q512_merged_pool(data):
    """block_q=512 (the long-L gather-byte halver): Q-side pooling runs at
    256 in head_planes and adjacent pooled rows are merged count-weighted in
    _sla_attention_fused_impl. At topk=1.0 the result must still equal dense
    attention (the merge only affects selection, and full coverage makes
    selection irrelevant); L=520 exercises the ragged-tail count weighting
    (block 1 has 8 valid rows) and the padded odd pooled-row count."""
    x, w, cosF, sinF = data
    kx = jax.random.split(jax.random.PRNGKey(11), 3)
    q_proj = jax.random.normal(kx[0], (B, L, HD), jnp.bfloat16)
    k_proj = jax.random.normal(kx[1], (B, L, HD), jnp.bfloat16)
    v_proj = jax.random.normal(kx[2], (B, L, HD), jnp.bfloat16)

    cfg = AttentionConfig(backend="sagesla", sla_topk=1.0, block_q=512,
                          block_k=256, linear_branch=False,
                          v_quant="channel")
    o_planes = sla_attention_fused(
        q_proj, k_proj, v_proj, w, w, (cosF, sinF), None, cfg,
        num_heads=H, eps=1e-5, interpret=True)
    out = jnp.swapaxes(o_planes[:, :, :L], 1, 2)

    q = rmsnorm_rope_ref(q_proj, w, cosF, sinF, eps=1e-5)
    k = rmsnorm_rope_ref(k_proj, w, cosF, sinF, eps=1e-5)
    v = v_proj.reshape(B, L, H, DH)
    ref = dense_attention_ref(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32))
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    rel = err.max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.06, rel


def test_merged_pool_equals_direct_wide_pool():
    """The count-weighted merge of two 256-row pooled means equals pooling
    at 512 directly (selection statistics identical up to fp noise)."""
    from turbodiffusion_tpu.ops.attention import _sla_attention_fused_impl  # noqa: F401
    L_, Dh_ = 520, 32
    x = jax.random.normal(jax.random.PRNGKey(3), (1, L_, Dh_), jnp.float32)
    planes = x[:, None]                       # (1, 1, L, Dh)

    def pooled(pool):
        nP = -(-L_ // pool)
        cnt = jnp.clip(L_ - jnp.arange(nP) * pool, 0, pool).astype(jnp.float32)
        pad = nP * pool - L_
        xp = jnp.pad(planes, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return (jnp.sum(xp.reshape(1, 1, nP, pool, Dh_), axis=3)
                / cnt[None, None, :, None]), cnt

    p256, c256 = pooled(256)
    p512, _ = pooled(512)
    # the merge formula from _sla_attention_fused_impl
    f = 2
    nP = p256.shape[2]
    nPp = -(-nP // f) * f
    cnt = jnp.clip(L_ - jnp.arange(nPp) * 256, 0, 256).astype(jnp.float32)
    pq = jnp.pad(p256, ((0, 0), (0, 0), (0, nPp - nP), (0, 0)))
    pq = pq * cnt[None, None, :, None]
    pq = pq.reshape(1, 1, nPp // f, f, Dh_).sum(3)
    csum = jnp.maximum(cnt.reshape(nPp // f, f).sum(1), 1.0)
    merged = pq / csum[None, None, :, None]
    np.testing.assert_allclose(np.asarray(merged), np.asarray(p512),
                               rtol=1e-5, atol=1e-5)


def test_fused_linear_epilogue_matches_composable(data, monkeypatch):
    """The linear branch fused into the pack producer + VT sparse epilogue
    (TDX_LIN_FUSED=1, the default) vs the standalone
    linear_projected_planes path (TDX_LIN_FUSED=0), RANDOM proj_l. The two
    differ only in quantization noise feeding phi: the fused path recovers
    phi(q) from int8 q rows and phi(k)^T v from int8 V (exact channel-scale
    fold), the composable path uses the bf16 planes."""
    x, w, cosF, sinF = data
    kx = jax.random.split(jax.random.PRNGKey(21), 5)
    q_proj = jax.random.normal(kx[0], (B, L, HD), jnp.bfloat16)
    k_proj = jax.random.normal(kx[1], (B, L, HD), jnp.bfloat16)
    v_proj = jax.random.normal(kx[2], (B, L, HD), jnp.bfloat16)
    proj_l = {"w": 0.3 * jax.random.normal(kx[3], (DH, DH), jnp.float32),
              "b": 0.1 * jax.random.normal(kx[4], (DH,), jnp.float32)}
    cfg = AttentionConfig(backend="sagesla", sla_topk=0.5, block_q=128,
                          block_k=128, linear_branch=True,
                          v_quant="channel")

    def run():
        o = sla_attention_fused(q_proj, k_proj, v_proj, w, w, (cosF, sinF),
                                proj_l, cfg, num_heads=H, eps=1e-5,
                                interpret=True)
        return np.asarray(o[:, :, :L], np.float32)

    monkeypatch.setenv("TDX_LIN_FUSED", "1")
    o_fused = run()
    monkeypatch.setenv("TDX_LIN_FUSED", "0")
    o_split = run()
    assert np.isfinite(o_fused).all()
    scale = np.abs(o_split).max()
    rel = np.abs(o_fused - o_split).max() / scale
    assert rel < 0.03, rel
