"""3D video RoPE for the Wan DiT.

Reference: VideoRopePosition3DEmb (rcm/networks/wan2pt1.py:45-137) and
rope_apply (:156-178), which uses flash-attn's interleaved rotary embedding.

head_dim d is split d = dim_t + dim_h + dim_w with dim_h = dim_w = d//6*2 and
dim_t = d - 2*dim_h (:60-64). Frequencies are concatenated [t, h, w] along the
last axis and applied with *interleaved* pairing: pairs are (x[..., 2i],
x[..., 2i+1]).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_freqs_3d(
    T: int,
    H: int,
    W: int,
    head_dim: int,
    h_extrapolation_ratio: float = 1.0,
    w_extrapolation_ratio: float = 1.0,
    t_extrapolation_ratio: float = 1.0,
) -> jnp.ndarray:
    """Returns angles of shape (T*H*W, head_dim//2), fp32.

    Matches generate_embeddings (wan2pt1.py:87-137): per-axis NTK-scaled theta
    10000, outer(position, freq), concatenated [t | h | w].
    """
    dim = head_dim
    dim_h = dim // 6 * 2
    dim_w = dim_h
    dim_t = dim - 2 * dim_h
    assert dim == dim_h + dim_w + dim_t

    h_ntk = h_extrapolation_ratio ** (dim_h / (dim_h - 2))
    w_ntk = w_extrapolation_ratio ** (dim_w / (dim_w - 2))
    t_ntk = t_extrapolation_ratio ** (dim_t / (dim_t - 2))

    def axis_freqs(n, d, theta):
        rng = jnp.arange(0, d, 2, dtype=jnp.float32)[: d // 2] / d
        inv = 1.0 / jnp.power(theta, rng)
        return jnp.outer(jnp.arange(n, dtype=jnp.float32), inv)  # (n, d//2)

    freqs_t = axis_freqs(T, dim_t, 10000.0 * t_ntk)  # (T, dim_t//2)
    freqs_h = axis_freqs(H, dim_h, 10000.0 * h_ntk)  # (H, dim_h//2)
    freqs_w = axis_freqs(W, dim_w, 10000.0 * w_ntk)  # (W, dim_w//2)

    # Broadcast each axis table over the (T, H, W) grid then flatten to L.
    ft = jnp.broadcast_to(freqs_t[:, None, None, :], (T, H, W, dim_t // 2))
    fh = jnp.broadcast_to(freqs_h[None, :, None, :], (T, H, W, dim_h // 2))
    fw = jnp.broadcast_to(freqs_w[None, None, :, :], (T, H, W, dim_w // 2))
    freqs = jnp.concatenate([ft, fh, fw], axis=-1)
    return freqs.reshape(T * H * W, dim // 2)


def apply_rope_interleaved(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Interleaved rotary embedding — exact reference semantics
    (rope_apply, wan2pt1.py:156-178; flash-attn interleaved=True).

    x: (B, L, n_heads, head_dim); freqs: (L, head_dim//2) angles.
    Pairing is interleaved: (x[..., 2i], x[..., 2i+1]) rotated by freqs[..., i].

    NOTE: the (..., D//2, 2) reshape produces a pathological TPU layout
    (2-wide minor dim); the model uses the rotate-half variant below with a
    one-time weight permutation instead. This version is kept as the
    reference for tests and converters.
    """
    B, L, N, D = x.shape
    cos = jnp.cos(freqs).astype(jnp.float32)  # (L, D//2)
    sin = jnp.sin(freqs).astype(jnp.float32)
    xf = x.astype(jnp.float32).reshape(B, L, N, D // 2, 2)
    x_even, x_odd = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out_even = x_even * c - x_odd * s
    out_odd = x_even * s + x_odd * c
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(B, L, N, D)
    return out.astype(x.dtype)


def apply_rope(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half rotary embedding — the TPU fast path.

    Mathematically identical to `apply_rope_interleaved` *when the head
    channels have been permuted even-first* (see `rope_channel_permutation`):
    attention scores q·k are invariant to any fixed permutation applied to
    both q and k, so the model applies the permutation once to the Q/K
    projection weights at load time and uses this layout-friendly rotation
    (two contiguous half-lane slices instead of a 2-wide minor dim).

    x: (B, L, n_heads, head_dim) permuted even-first; freqs: (L, D//2).
    """
    B, L, N, D = x.shape
    cos = jnp.cos(freqs).astype(jnp.float32)[None, :, None, :]  # (1,L,1,D/2)
    sin = jnp.sin(freqs).astype(jnp.float32)[None, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : D // 2], xf[..., D // 2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def rope_channel_permutation(head_dim: int, num_heads: int) -> jnp.ndarray:
    """Permutation taking reference interleaved channel order to the
    rotate-half order, replicated per head: within each head,
    [0, 2, 4, ..., 1, 3, 5, ...].

    Apply to the *output* channels of the Q/K projection weights and the
    norm_q/norm_k scales (importer) — softmax scores are unchanged because
    q and k receive the same permutation.
    """
    half = head_dim // 2
    per_head = jnp.concatenate([jnp.arange(half) * 2, jnp.arange(half) * 2 + 1])
    offsets = jnp.arange(num_heads)[:, None] * head_dim
    return (per_head[None, :] + offsets).reshape(-1)


def permute_qk_linear(p: dict, head_dim: int, num_heads: int,
                      inverse: bool = False) -> dict:
    """Permute a Q/K projection's output channels into rotate-half order
    (or back, with inverse=True)."""
    perm = rope_channel_permutation(head_dim, num_heads)
    if inverse:
        perm = jnp.argsort(perm)
    out = dict(p)
    if "w" in p:
        out["w"] = p["w"][:, perm]
    if "w_int8" in p:
        scale = p["scale"]
        if scale.ndim == 1:
            # postscale layout: per-column scales permute with the columns
            out["w_int8"] = p["w_int8"][:, perm]
            out["scale"] = scale[perm]
        elif head_dim % 128 == 0:
            # each head spans whole 128-col quant blocks; the within-head
            # permutation never crosses a scale block
            out["w_int8"] = p["w_int8"][:, perm]
        else:
            # heads straddle quant blocks: dequantize, permute, requantize
            from turbodiffusion_tpu.ops.quant import quantize_int8_block
            K, N = p["w_int8"].shape
            sr = jnp.repeat(jnp.repeat(scale, 128, 0), 128, 1)[:K, :N]
            w = p["w_int8"].astype(jnp.float32) * sr
            q, s = quantize_int8_block(w[:, perm])
            out["w_int8"], out["scale"] = q, s
    if p.get("b") is not None:
        out["b"] = p["b"][perm]
    return out


# ---------------------------------------------------------------------------
# LTX-2 fractional rope (TurboT2AV)
# ---------------------------------------------------------------------------

def ltx_freqs(positions, dim: int, theta: float = 10000.0,
              max_pos=(20.0, 2048.0, 2048.0)) -> jnp.ndarray:
    """LTX-2 fractional-position rope angles
    (ltx_core/model/transformer/rope.py:70-141,178-205).

    positions: (n_dims, L) float *middle* coordinates (time in seconds,
    y/x in pixels — see `ltx.video_token_positions`). The frequency ladder
    spans the FULL inner width `dim` (heads get different ladder slices —
    unlike Wan's per-head rope): per-dim ladder
    theta**linspace(0, 1, dim // (2*n_dims)) * pi/2, angle =
    ladder * (2 * pos/max_pos - 1), flattened ladder-major with the position
    dims interleaved per ladder entry; `dim % (2*n_dims)` leading channels
    are identity (zero angle).

    Returns angles (L, dim//2) for `apply_rope_interleaved` over the flat
    inner width.
    """
    import math as _math
    n_dims, L = positions.shape
    per = dim // (2 * n_dims)
    pad_half = (dim % (2 * n_dims)) // 2
    ladder = (jnp.power(jnp.float32(theta),
                        jnp.linspace(0.0, 1.0, per, dtype=jnp.float32))
              * (_math.pi / 2))                                   # (per,)
    frac = positions.astype(jnp.float32) / \
        jnp.asarray(max_pos, jnp.float32)[:, None]                # (n, L)
    scaled = 2.0 * frac - 1.0
    ang = ladder[:, None, None] * scaled[None]                    # (per,n,L)
    ang = ang.reshape(per * n_dims, L).T                          # (L, per*n)
    if pad_half:
        ang = jnp.concatenate(
            [jnp.zeros((L, pad_half), jnp.float32), ang], axis=1)
    return ang
