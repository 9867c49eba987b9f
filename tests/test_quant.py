"""W8A8 quantization tests: quantizer fidelity, GEMM reference, Pallas parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.ops.quant import (
    int8_block_matmul_ref, int8_linear_block, int8_linear_postscale,
    linear_maybe_quant, quantize_activation_block, quantize_int8_block,
    quantize_int8_postscale, quantize_linear_params, quantize_wan_blocks)


def test_block_quant_dequant_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (200, 300))
    q, s = quantize_int8_block(w)
    deq = np.asarray(q, np.float32)
    sr = np.repeat(np.repeat(np.asarray(s), 128, 0), 128, 1)[:200, :300]
    rel = np.abs(deq * sr - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # 1/127 per-block relative error bound


def test_block_gemm_ref_close_to_float():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (64, 256))
    w = jax.random.normal(kw, (256, 128))
    wq, ws = quantize_int8_block(w)
    xq, xs = quantize_activation_block(x)
    y = int8_block_matmul_ref(xq[:64, :256], xs, wq, ws)
    ref = np.asarray(x) @ np.asarray(w)
    rel = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_postscale_close_to_float():
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (10, 64, 256))
    w = jax.random.normal(kw, (256, 128))
    b = jax.random.normal(jax.random.PRNGKey(3), (128,))
    wq, ws = quantize_int8_postscale(w)
    y = int8_linear_postscale(x, wq, ws, bias=b)
    ref = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    rel = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_int8_linear_block_matches_ref_path():
    """linear_maybe_quant block path == Int8Linear.forward semantics
    (ops/core.py:405-412) within quantization tolerance."""
    kx, kw = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(kx, (2, 32, 256))
    w = jax.random.normal(kw, (256, 192))
    p = quantize_linear_params({"w": w, "b": jnp.zeros((192,))}, mode="block")
    y = linear_maybe_quant(p, x)
    ref = np.asarray(x) @ np.asarray(w)
    rel = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_quantize_wan_blocks_skips_proj_l():
    from turbodiffusion_tpu.config import AttentionConfig, wan_test_config
    from turbodiffusion_tpu.models.wan import init_wan_params
    cfg = wan_test_config(attention=AttentionConfig(backend="sla",
                                                    sla_topk=0.5,
                                                    block_q=8, block_k=8))
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    blocks = quantize_wan_blocks(params["blocks"], mode="postscale")
    assert "w_int8" in blocks["self_attn"]["qkv"]  # fused QKV by default
    assert "q" not in blocks["self_attn"]
    assert "w_int8" in blocks["ffn"]["fc1"]
    assert "w" in blocks["self_attn"]["proj_l"]  # untouched

    unfused = quantize_wan_blocks(params["blocks"], mode="postscale",
                                  fuse_qkv=False)
    assert "w_int8" in unfused["self_attn"]["q"]  # checkpoint-export layout


def test_quantized_wan_forward_close_to_float():
    from turbodiffusion_tpu.config import wan_test_config
    from turbodiffusion_tpu.models.wan import init_wan_params, wan_forward
    cfg = wan_test_config()
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    params["head"]["head"]["w"] = jnp.ones_like(params["head"]["head"]["w"]) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 2, 4, 4))
    t = jnp.full((1, 1), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim))
    ref = wan_forward(params, cfg, x, t, ctx)

    qparams = dict(params)
    qparams["blocks"] = quantize_wan_blocks(params["blocks"], mode="postscale")
    out = wan_forward(qparams, cfg, x, t, ctx)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err.max() / (np.abs(np.asarray(ref)).max() + 1e-8)
    assert rel < 0.15, rel  # accumulated per-layer quant noise stays bounded


def test_postscale_pallas_gemm_matches_xla_path():
    """Pallas fused-epilogue GEMM (interpret) == the XLA int8-dot epilogue
    composition, including bias and fused gelu."""
    from turbodiffusion_tpu.ops.quant import (
        int8_gemm_postscale_pallas, quantize_rows_int8)
    kx, kw = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.normal(kx, (200, 256), jnp.bfloat16)  # non-multiple M tail
    w = jax.random.normal(kw, (256, 384))
    b = jax.random.normal(jax.random.PRNGKey(6), (384,))
    wq, ws = quantize_int8_postscale(w)
    xq, rs = quantize_rows_int8(x)

    ref = (jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
        * rs * ws[None, :] + b[None, :])
    ref_gelu = jax.nn.gelu(ref, approximate=True)

    out = int8_gemm_postscale_pallas(xq, rs, wq, ws, bias=b, has_bias=True,
                                     out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)

    outg = int8_gemm_postscale_pallas(xq, rs, wq, ws, bias=b, has_bias=True,
                                      act="gelu_tanh", out_dtype=jnp.float32,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(ref_gelu),
                               rtol=1e-5, atol=1e-4)


def test_rowquant_pallas_matches_jnp():
    from turbodiffusion_tpu.ops.quant import (
        quantize_rows_int8, quantize_rows_int8_pallas)
    x = jax.random.normal(jax.random.PRNGKey(7), (200, 256), jnp.bfloat16)
    xq_ref, rs_ref = quantize_rows_int8(x)
    xq, rs = quantize_rows_int8_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rs_ref), rtol=1e-6)
    # round-to-nearest ties may differ by 1 ulp between lowerings
    assert np.abs(np.asarray(xq, np.int32) -
                  np.asarray(xq_ref, np.int32)).max() <= 1


def test_postscale_pallas_gate_residual_epilogue():
    """The fused `residual + out * gate` epilogue (the AdaLN-gated
    transformer residual) == the unfused composition."""
    from turbodiffusion_tpu.ops.quant import (
        int8_gemm_postscale_pallas, quantize_rows_int8)
    kx, kw = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(kx, (200, 256), jnp.bfloat16)
    w = jax.random.normal(kw, (256, 384))
    b = jax.random.normal(jax.random.PRNGKey(8), (384,))
    gate = jax.random.normal(jax.random.PRNGKey(9), (384,), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(10), (200, 384), jnp.float32)
    wq, ws = quantize_int8_postscale(w)
    xq, rs = quantize_rows_int8(x)

    base = (jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
        * rs * ws[None, :] + b[None, :])
    want = base * gate[None, :] + res

    out = int8_gemm_postscale_pallas(xq, rs, wq, ws, bias=b, has_bias=True,
                                     out_dtype=jnp.float32, interpret=True,
                                     gate=gate, residual=res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_ffn_int8_chain_matches_unfused():
    """fc1 quant-out epilogue + fc2 blockscale GEMM == quantize-between
    reference within int8 resolution (the chain replaces the standalone
    quantize_rows over the FFN hidden)."""
    from turbodiffusion_tpu.ops.quant import (
        _pick_bn_div, int8_gemm_blockact_pallas,
        int8_gemm_postscale_qout_pallas, quantize_int8_postscale,
        quantize_rows_int8)

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    M, K, N = 256, 256, 768          # N has BN divisor 384
    assert _pick_bn_div(N) == 768 or _pick_bn_div(N) >= 384
    x = jax.random.normal(ks[0], (M, K), jnp.float32)
    w1 = jax.random.normal(ks[1], (K, N), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[2], (N, K), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[3], (N,), jnp.float32) * 0.1

    w1q, w1s = quantize_int8_postscale(w1)
    w2q, w2s = quantize_int8_postscale(w2)
    xq, xs = quantize_rows_int8(x)

    # unfused reference: dequant fc1, gelu, requantize per row, fc2
    h = jax.nn.gelu((xq.astype(jnp.float32) * xs) @ (
        w1q.astype(jnp.float32) * w1s[None, :]) + b1, approximate=True)
    hq_ref, hs_ref = quantize_rows_int8(h)
    y_ref = (hq_ref.astype(jnp.float32) * hs_ref) @ (
        w2q.astype(jnp.float32) * w2s[None, :])

    BN = _pick_bn_div(N)
    hq, hs = int8_gemm_postscale_qout_pallas(
        xq, xs, w1q, w1s, bias=b1, act="gelu_tanh", has_bias=True,
        interpret=True)
    assert hs.shape == (M, N // BN)
    y = int8_gemm_blockact_pallas(hq, hs, w2q, w2s, bk=BN, interpret=True,
                                  out_dtype=jnp.float32)

    # block scales are finer than the reference's per-row scale, so the
    # chain should be at least as accurate vs the fp32 ideal
    y_fp = h @ (w2q.astype(jnp.float32) * w2s[None, :])
    err_chain = float(jnp.abs(y - y_fp).mean())
    err_ref = float(jnp.abs(y_ref - y_fp).mean())
    assert err_chain < err_ref * 1.2 + 1e-5, (err_chain, err_ref)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_fp),
                               atol=float(jnp.abs(y_fp).max()) * 0.05)


def test_ffn_chain_gate_residual_epilogue():
    from turbodiffusion_tpu.ops.quant import (
        int8_gemm_blockact_pallas, quantize_int8_postscale)
    rng = jax.random.split(jax.random.PRNGKey(1), 4)
    M, K, N = 128, 256, 256
    hq = jax.random.randint(rng[0], (M, K), -127, 128, jnp.int8)
    hs = jax.random.uniform(rng[1], (M, K // 128), jnp.float32, 0.01, 0.02)
    w, ws = quantize_int8_postscale(
        jax.random.normal(rng[2], (K, N), jnp.float32) * 0.05)
    gate = jax.random.normal(rng[3], (N,), jnp.float32)
    res = jnp.ones((M, N), jnp.float32)

    base = int8_gemm_blockact_pallas(hq, hs, w, ws, bk=128, interpret=True,
                                     out_dtype=jnp.float32)
    fused = int8_gemm_blockact_pallas(hq, hs, w, ws, bk=128, interpret=True,
                                      out_dtype=jnp.float32,
                                      gate=gate, residual=res)
    np.testing.assert_allclose(np.asarray(fused),
                               np.asarray(base * gate[None, :] + res),
                               rtol=1e-5, atol=1e-5)


def test_weight_resident_gemms_match_tiled():
    """r5 weight-resident GEMM variants (grid over M only, (K, N) weight in
    VMEM — engaged at M>=4096 when the weight fits the budget) must match
    the tiled kernels bit-for-bit-ish on both the qout (int8+scales out)
    and blockact (per-K-block rescale) paths."""
    import os
    from turbodiffusion_tpu.ops.quant import (
        int8_gemm_blockact_pallas, int8_gemm_postscale_qout_pallas)

    M, K, N = 4608, 256, 896        # M >= 4096 engages the wres path
    rng = np.random.default_rng(5)
    xq = rng.integers(-127, 128, (M, K), dtype=np.int8)
    rs = rng.random((M, 1), dtype=np.float32) * 0.01 + 0.001
    wq = rng.integers(-127, 128, (K, N), dtype=np.int8)
    cs = rng.random((N,), dtype=np.float32) * 0.01
    b = rng.standard_normal((N,)).astype(np.float32)

    def both(fn, *args, **kw):
        os.environ["TDX_GEMM_WRES"] = "0"
        try:
            tiled = fn(*args, **kw)
        finally:
            os.environ["TDX_GEMM_WRES"] = "1"
        wres = fn(*args, **kw)
        return tiled, wres

    (yt, st), (yw, sw) = both(
        int8_gemm_postscale_qout_pallas, jnp.asarray(xq), jnp.asarray(rs),
        jnp.asarray(wq), jnp.asarray(cs), bias=jnp.asarray(b),
        act="gelu_tanh", has_bias=True, interpret=True)
    np.testing.assert_allclose(np.asarray(sw), np.asarray(st),
                               rtol=1e-6, atol=0)
    np.testing.assert_array_equal(np.asarray(yw), np.asarray(yt))

    xs = rng.random((M, K // 128), dtype=np.float32) * 0.01
    gate = rng.standard_normal((N,)).astype(np.float32)
    res = rng.standard_normal((M, N)).astype(np.float32)
    ot, ow = both(
        int8_gemm_blockact_pallas, jnp.asarray(xq), jnp.asarray(xs),
        jnp.asarray(wq), jnp.asarray(cs), bias=jnp.asarray(b),
        act=None, has_bias=True, bk=128, out_dtype=jnp.float32,
        gate=jnp.asarray(gate), residual=jnp.asarray(res), interpret=True)
    np.testing.assert_allclose(np.asarray(ow), np.asarray(ot),
                               rtol=1e-5, atol=1e-5)


def test_weight_resident_postscale_matches_tiled():
    """The plain postscale GEMM's weight-resident path (QKV/O projections
    at long-M inference) must match the tiled kernel."""
    import os
    from turbodiffusion_tpu.ops.quant import int8_gemm_postscale_pallas

    M, K, N = 4608, 256, 640
    rng = np.random.default_rng(9)
    xq = rng.integers(-127, 128, (M, K), dtype=np.int8)
    rs = rng.random((M, 1), dtype=np.float32) * 0.01 + 0.001
    wq = rng.integers(-127, 128, (K, N), dtype=np.int8)
    cs = rng.random((N,), dtype=np.float32) * 0.01
    b = rng.standard_normal((N,)).astype(np.float32)
    gate = rng.standard_normal((N,)).astype(np.float32)
    res = rng.standard_normal((M, N)).astype(np.float32)

    kw = dict(bias=jnp.asarray(b), act="gelu_tanh", has_bias=True,
              out_dtype=jnp.float32, gate=jnp.asarray(gate),
              residual=jnp.asarray(res), interpret=True)
    os.environ["TDX_GEMM_WRES"] = "0"
    try:
        tiled = int8_gemm_postscale_pallas(
            jnp.asarray(xq), jnp.asarray(rs), jnp.asarray(wq),
            jnp.asarray(cs), **kw)
    finally:
        os.environ["TDX_GEMM_WRES"] = "1"
    wres = int8_gemm_postscale_pallas(
        jnp.asarray(xq), jnp.asarray(rs), jnp.asarray(wq),
        jnp.asarray(cs), **kw)
    np.testing.assert_allclose(np.asarray(wres), np.asarray(tiled),
                               rtol=1e-5, atol=1e-5)


def test_weight_resident_grouped_n(monkeypatch):
    """Multi-group wres path (n_g > 1, the 14B shapes): shrink the VMEM cap
    so grouping engages at test size, including a ragged last group."""
    import turbodiffusion_tpu.ops.quant as Q

    M, K, N = 4224, 256, 1152      # BN=512 -> 3 chunks; ragged group tail
    monkeypatch.setattr(Q, "_WRES_CAP", K * 512)   # 1 chunk per group
    rng = np.random.default_rng(11)
    xq = rng.integers(-127, 128, (M, K), dtype=np.int8)
    rs = rng.random((M, 1), dtype=np.float32) * 0.01 + 0.001
    wq = rng.integers(-127, 128, (K, N), dtype=np.int8)
    cs = rng.random((N,), dtype=np.float32) * 0.01
    res = rng.standard_normal((M, N)).astype(np.float32)

    wres = Q.int8_gemm_postscale_pallas(
        jnp.asarray(xq), jnp.asarray(rs), jnp.asarray(wq), jnp.asarray(cs),
        out_dtype=jnp.float32, residual=jnp.asarray(res), interpret=True)
    ref = (np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
           ).astype(np.float32) * rs * cs[None, :] + res
    np.testing.assert_allclose(np.asarray(wres), ref, rtol=1e-5, atol=1e-4)

    xs = rng.random((M, K // 128), dtype=np.float32) * 0.01
    wres_b = Q.int8_gemm_blockact_pallas(
        jnp.asarray(xq), jnp.asarray(xs), jnp.asarray(wq), jnp.asarray(cs),
        bk=128, out_dtype=jnp.float32, interpret=True)
    acc = np.zeros((M, N), np.float32)
    for kb in range(K // 128):
        acc += (np.asarray(xq[:, kb*128:(kb+1)*128], np.int32)
                @ np.asarray(wq[kb*128:(kb+1)*128], np.int32)
                ).astype(np.float32) * xs[:, kb:kb+1]
    np.testing.assert_allclose(np.asarray(wres_b), acc * cs[None, :],
                               rtol=1e-5, atol=1e-4)

    # qout with N=896*2 chunks split across groups
    N2 = 1792
    wq2 = rng.integers(-127, 128, (K, N2), dtype=np.int8)
    cs2 = rng.random((N2,), dtype=np.float32) * 0.01
    monkeypatch.setattr(Q, "_WRES_CAP", K * 896)
    y8, ysc = Q.int8_gemm_postscale_qout_pallas(
        jnp.asarray(xq), jnp.asarray(rs), jnp.asarray(wq2),
        jnp.asarray(cs2), interpret=True)
    deq = np.asarray(y8, np.float32).reshape(M, 2, 896) * \
        np.asarray(ysc)[:, :, None]
    full = (np.asarray(xq, np.int32) @ np.asarray(wq2, np.int32)
            ).astype(np.float32) * rs * cs2[None, :]
    np.testing.assert_allclose(deq.reshape(M, N2), full,
                               rtol=0.02, atol=np.abs(full).max() * 0.02)
