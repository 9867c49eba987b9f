"""Gemma-3 checkpoint plumbing: HF-layout weight import, multi-layer
feature extraction, connector import (diffusers layout), tokenizer
fallback, and LoRA fusing / fp8 loading.

Import mappings are validated against synthesized reference-layout state
dicts (the same trick tests/test_cli.py uses for Wan) plus independent
numpy re-derivations of the reference math:
  - base_encoder.py:158-215 (_norm_and_concat_padded_batch)
  - diffusers GEGLU (ff.net.0.proj chunks to [value | gate])
  - fuse_loras.py:44-100 (delta = strength * B @ A)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from turbodiffusion_tpu.models.gemma import (
    Gemma3Config, connector_apply, connector_params_from_state_dict,
    gemma3_encode, gemma_feature_extract, gemma_params_from_state_dict,
    gemma_test_config, gemma_tokenize, init_feature_extractor_params)


def _hf_gemma_sd(cfg: Gemma3Config, rng, prefix="model."):
    """Synthesize an HF Gemma3 text-model state dict (torch (out, in))."""
    D, F = cfg.hidden_size, cfg.intermediate_size
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    sd = {prefix + "embed_tokens.weight":
          rng.randn(cfg.vocab_size, D).astype(np.float32),
          prefix + "norm.weight": rng.randn(D).astype(np.float32)}
    for i in range(cfg.num_layers):
        b = f"{prefix}layers.{i}."
        sd[b + "input_layernorm.weight"] = rng.randn(D).astype(np.float32)
        sd[b + "self_attn.q_proj.weight"] = rng.randn(H * Dh, D).astype(np.float32)
        sd[b + "self_attn.k_proj.weight"] = rng.randn(KV * Dh, D).astype(np.float32)
        sd[b + "self_attn.v_proj.weight"] = rng.randn(KV * Dh, D).astype(np.float32)
        sd[b + "self_attn.o_proj.weight"] = rng.randn(D, H * Dh).astype(np.float32)
        sd[b + "self_attn.q_norm.weight"] = rng.randn(Dh).astype(np.float32)
        sd[b + "self_attn.k_norm.weight"] = rng.randn(Dh).astype(np.float32)
        sd[b + "post_attention_layernorm.weight"] = rng.randn(D).astype(np.float32)
        sd[b + "pre_feedforward_layernorm.weight"] = rng.randn(D).astype(np.float32)
        sd[b + "mlp.gate_proj.weight"] = rng.randn(F, D).astype(np.float32)
        sd[b + "mlp.up_proj.weight"] = rng.randn(F, D).astype(np.float32)
        sd[b + "mlp.down_proj.weight"] = rng.randn(D, F).astype(np.float32)
        sd[b + "post_feedforward_layernorm.weight"] = rng.randn(D).astype(np.float32)
    return sd


@pytest.mark.parametrize("prefix", ["model.", "language_model.model."])
def test_gemma_import_and_encode(prefix):
    cfg = gemma_test_config()
    rng = np.random.RandomState(0)
    sd = _hf_gemma_sd(cfg, rng, prefix=prefix)
    params = gemma_params_from_state_dict(sd, cfg, dtype=jnp.float32)
    # spot-check the transpose convention
    np.testing.assert_allclose(
        np.asarray(params["blocks"][0]["attn"]["q"]),
        sd[prefix + "layers.0.self_attn.q_proj.weight"].T)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 8)), jnp.int32)
    mask = jnp.asarray([[0, 0, 1, 1, 1, 1, 1, 1],
                        [0, 0, 0, 0, 1, 1, 1, 1]], jnp.int32)
    out = gemma3_encode(params, ids, mask, cfg)
    assert out.shape == (2, 8, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()
    hiddens = gemma3_encode(params, ids, mask, cfg, all_hidden_states=True)
    assert len(hiddens) == cfg.num_layers + 1
    np.testing.assert_allclose(np.asarray(hiddens[-1]), np.asarray(out))


def test_feature_extract_matches_reference_math():
    """gemma_feature_extract == an independent numpy re-derivation of
    _norm_and_concat_padded_batch + aggregate_embed (left padding)."""
    cfg = gemma_test_config()
    rng = np.random.RandomState(1)
    B, T, D, NL = 2, 8, cfg.hidden_size, 3
    hiddens = [rng.randn(B, T, D).astype(np.float32) for _ in range(NL)]
    mask = np.asarray([[0, 0, 1, 1, 1, 1, 1, 1],
                       [0, 0, 0, 0, 1, 1, 1, 1]], np.int32)
    fe = init_feature_extractor_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
    fe = {"aggregate_embed": jnp.asarray(
        rng.randn(D * NL, D).astype(np.float32))}
    got = np.asarray(gemma_feature_extract(
        fe, [jnp.asarray(h) for h in hiddens], jnp.asarray(mask)))

    # numpy reference (base_encoder.py:158-215, padding_side="left")
    x = np.stack(hiddens, axis=-1)                       # (B,T,D,L)
    seq = mask.sum(1)
    valid = np.arange(T)[None, :] >= (T - seq[:, None])
    m = valid[:, :, None, None]
    eps = 1e-6
    masked = np.where(m, x, 0.0)
    mean = masked.sum((1, 2), keepdims=True) / (
        (seq * D).reshape(B, 1, 1, 1) + eps)
    xmin = np.where(m, x, np.inf).min((1, 2), keepdims=True)
    xmax = np.where(m, x, -np.inf).max((1, 2), keepdims=True)
    normed = 8 * (x - mean) / (xmax - xmin + eps)
    normed = np.where(m, normed, 0.0).reshape(B, T, D * NL)
    want = normed @ np.asarray(fe["aggregate_embed"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_connector_import_reference_layout():
    """Synthesized Embeddings1DConnector sd (attn1.to_* biased linears +
    q/k RMS norms + ff.net GELU-tanh MLP + learnable_registers) imports and
    runs; the FF mapping matches net.2(gelu_tanh(net.0.proj(x)))."""
    dim, heads, dh, inner_ff = 32, 2, 16, 128
    rng = np.random.RandomState(2)
    sd = {"learnable_registers": rng.rand(8, 32).astype(np.float32) * 2 - 1}
    for i in range(2):
        b = f"transformer_1d_blocks.{i}."
        for nm in ("to_q", "to_k", "to_v"):
            sd[b + f"attn1.{nm}.weight"] = rng.randn(
                heads * dh, dim).astype(np.float32)
            sd[b + f"attn1.{nm}.bias"] = rng.randn(
                heads * dh).astype(np.float32)
        sd[b + "attn1.to_out.0.weight"] = rng.randn(
            dim, heads * dh).astype(np.float32)
        sd[b + "attn1.to_out.0.bias"] = rng.randn(dim).astype(np.float32)
        sd[b + "attn1.q_norm.weight"] = rng.randn(
            heads * dh).astype(np.float32)
        sd[b + "attn1.k_norm.weight"] = rng.randn(
            heads * dh).astype(np.float32)
        sd[b + "ff.net.0.proj.weight"] = rng.randn(
            inner_ff, dim).astype(np.float32)
        sd[b + "ff.net.0.proj.bias"] = rng.randn(inner_ff).astype(np.float32)
        sd[b + "ff.net.2.weight"] = rng.randn(
            dim, inner_ff).astype(np.float32)
        sd[b + "ff.net.2.bias"] = rng.randn(dim).astype(np.float32)
    p = connector_params_from_state_dict(sd, num_layers=2, dtype=jnp.float32)
    assert p["registers"].shape == (8, 32)

    # FF mapping: fc2(gelu_tanh(fc1(x))) == net.2(gelu_tanh(net.0.proj(x)))
    from turbodiffusion_tpu.models.gemma import _lin_b
    x = rng.randn(3, dim).astype(np.float32)
    b0 = "transformer_1d_blocks.0."
    h = x @ sd[b0 + "ff.net.0.proj.weight"].T + sd[b0 + "ff.net.0.proj.bias"]
    g = 0.5 * h * (1 + np.tanh(np.sqrt(2 / np.pi)
                               * (h + 0.044715 * h ** 3)))
    want = g @ sd[b0 + "ff.net.2.weight"].T + sd[b0 + "ff.net.2.bias"]
    ff = p["blocks"][0]["ff"]
    got = np.asarray(_lin_b(ff["fc2"], jax.nn.gelu(
        _lin_b(ff["fc1"], jnp.asarray(x)), approximate=True)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    hid = jnp.asarray(rng.randn(1, 16, dim), jnp.float32)
    mask = jnp.ones((1, 16), jnp.int32).at[0, :5].set(0)
    out, out_mask = connector_apply(p, hid, mask, heads, dh,
                                    num_registers=8)
    assert out.shape == (1, 16, dim)
    assert np.isfinite(np.asarray(out)).all()
    assert int(np.asarray(out_mask).sum()) == 16   # registers fill padding


def test_gemma_tokenizer_fallback_left_pads():
    ids, mask = gemma_tokenize(["hello world", "a"], None, max_length=6)
    assert ids.shape == mask.shape == (2, 6)
    assert mask[0].tolist() == [0, 0, 0, 0, 1, 1]   # left padded
    assert mask[1].tolist() == [0, 0, 0, 0, 0, 1]
    ids2, _ = gemma_tokenize(["hello world"], None, max_length=6)
    np.testing.assert_array_equal(ids[0], ids2[0])  # deterministic


# ---------------------------------------------------------------------------
# LoRA fusing + fp8
# ---------------------------------------------------------------------------

def test_apply_loras_matches_direct_math():
    from turbodiffusion_tpu.utils.lora import apply_loras
    rng = np.random.RandomState(3)
    w = rng.randn(8, 6).astype(np.float32)
    base = {"blocks.0.q.weight": w,
            "blocks.0.k.weight": rng.randn(8, 6).astype(np.float32)}
    a1, b1 = rng.randn(2, 6).astype(np.float32), rng.randn(8, 2).astype(np.float32)
    a2, b2 = rng.randn(2, 6).astype(np.float32), rng.randn(8, 2).astype(np.float32)
    loras = [({"blocks.0.q.lora_A.weight": a1,
               "blocks.0.q.lora_B.weight": b1}, 0.5),
             ({"blocks.0.q.lora_A.weight": a2,
               "blocks.0.q.lora_B.weight": b2}, 2.0)]
    out = apply_loras(base, loras)
    want = w + 0.5 * (b1 @ a1) + 2.0 * (b2 @ a2)
    np.testing.assert_allclose(out["blocks.0.q.weight"], want, rtol=1e-5)
    np.testing.assert_allclose(out["blocks.0.k.weight"],
                               base["blocks.0.k.weight"])


def test_apply_loras_fp8_stochastic_round():
    ml_dtypes = pytest.importorskip("ml_dtypes")
    from turbodiffusion_tpu.utils.lora import apply_loras
    rng = np.random.RandomState(4)
    w32 = rng.randn(8, 6).astype(np.float32)
    w8 = w32.astype(ml_dtypes.float8_e4m3fn)
    a = rng.randn(2, 6).astype(np.float32)
    b = rng.randn(8, 2).astype(np.float32)
    base = {"q.weight": w8}
    out = apply_loras(base, [({"q.lora_A.weight": a,
                               "q.lora_B.weight": b}, 1.0)])
    got = out["q.weight"]
    assert got.dtype == np.dtype(ml_dtypes.bfloat16)
    exact = w8.astype(np.float32) + b @ a
    # stochastic rounding is within 1 bf16 ULP of the exact sum
    err = np.abs(got.astype(np.float32) - exact)
    ulp = np.maximum(np.abs(exact) * 2 ** -7, 1e-30)
    assert (err <= ulp + 1e-7).all()
    # no-delta fp8 weights pass through unchanged by default
    out2 = apply_loras({"k.weight": w8}, [])
    assert out2["k.weight"].dtype == w8.dtype


def test_stochastic_round_unbiased():
    from turbodiffusion_tpu.utils.lora import stochastic_round_bf16
    x = np.full((20000,), 1.0 + 2 ** -9, np.float32)
    r = stochastic_round_bf16(x, seed=0).astype(np.float32)
    # bf16 has a 7-bit mantissa: neighbors of 1 + 2^-9 are 1.0 and 1 + 2^-7;
    # rounds to one of them with mean close to the true value
    assert set(np.unique(r)).issubset({1.0, 1.0 + 2 ** -7})
    assert abs(r.mean() - (1.0 + 2 ** -9)) < 1e-4
