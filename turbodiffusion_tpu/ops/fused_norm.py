"""Fused norm/modulation/RoPE Pallas kernels — the TPU FastNorm suite.

Reference: the Triton FastNorm kernel family
(TurboT2AV/.../ltx_distillation/fast_norm_kernels.py: _modulated_rms_norm_kernel,
_modulation_kernel, _split_rope_kernel) and the Wan fp32 islands
(rcm/networks/wan2pt1.py:399-416). On GPU the reference fuses these because
Triton beats eager torch; on TPU the motivation is identical but sharper: the
unfused XLA lowering of "fp32 LayerNorm -> cast -> fp32 modulate -> cast"
materializes fp32 intermediates in HBM (measured ~2.6 ms/layer at 480p
geometry), while one Pallas pass is HBM-bandwidth bound at ~0.3 ms.

Every kernel is row-wise (no cross-row reductions), so sequence-length tails
need no masking: out-of-range rows compute garbage that is never written back.

Kernels:
  * modulated_layer_norm — LN (+optional affine) (+optional AdaLN modulate)
  * rmsnorm_rope         — per-head RMSNorm-QK + rotate-half RoPE in one pass

Each has a jnp reference (`*_ref`) replicating the exact cast chain of the
unfused path; the Pallas kernels follow the same chain so results match
bit-for-bit on identical hardware rounding.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# modulated layer norm
# ---------------------------------------------------------------------------

def modulated_layer_norm_ref(x, mod_scale=None, mod_shift=None, weight=None,
                             bias=None, eps: float = 1e-6):
    """Exact unfused semantics (wan2pt1.py:404: norm(x).float()*(1+e1)+e0).

    x: (B, L, D); mod_scale/mod_shift: (B, 1, D) or (B, D) fp32; weight/bias:
    (D,). LN stats in fp32; affine in fp32; output cast to bf16 *before* the
    fp32 modulation (matching WanLayerNorm's cast-out + re-upcast), then cast
    back to x.dtype.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    y = y.astype(x.dtype)
    if mod_scale is None:
        return y
    ms = mod_scale.reshape(x.shape[0], 1, x.shape[-1]).astype(jnp.float32)
    mb = mod_shift.reshape(x.shape[0], 1, x.shape[-1]).astype(jnp.float32)
    return (y.astype(jnp.float32) * (1.0 + ms) + mb).astype(x.dtype)


def _mln_kernel(x_ref, ms_ref, mb_ref, w_ref, b_ref, o_ref, rs_ref,
                *, eps: float, has_mod: bool, has_w: bool, has_b: bool,
                quant: bool, out_dtype):
    x = x_ref[0].astype(jnp.float32)                     # (TL, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    if has_w:
        y = y * w_ref[0].astype(jnp.float32)
    if has_b:
        y = y + b_ref[0].astype(jnp.float32)
    y = y.astype(out_dtype)                              # WanLayerNorm cast-out
    if has_mod:
        y = (y.astype(jnp.float32) * (1.0 + ms_ref[0].astype(jnp.float32))
             + mb_ref[0].astype(jnp.float32))
    if quant:
        # per-row int8 for the downstream W8A8 GEMM — saves the standalone
        # quantize_rows pass (a full HBM round trip over (L, D))
        yf = y.astype(jnp.float32)
        amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        o_ref[0] = jnp.round(yf * (1.0 / scale)).astype(jnp.int8)
        rs_ref[0] = scale
    else:
        o_ref[0] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "block_l",
                                              "quant_out"))
def _mln_pallas(x, ms, mb, w, b, eps: float, interpret: bool = False,
                block_l: int = 512, quant_out: bool = False):
    B, L, D = x.shape
    # ~10 bytes/element live in the quant path (bf16 in, f32 y, int8 out,
    # double-buffered) — cap the row block so wide models (14B: D=5120)
    # stay under the 16MB scoped-vmem limit
    TL = min(block_l, max(8, (1_200_000 // D) // 8 * 8), L)
    grid = (B, _cdiv(L, TL))
    has_mod, has_w, has_b = ms is not None, w is not None, b is not None

    specs = [pl.BlockSpec((1, TL, D), lambda b_, i: (b_, i, 0),
                          memory_space=pltpu.VMEM)]
    args = [x]
    for m in (ms, mb):
        if has_mod:
            specs.append(pl.BlockSpec((1, 1, D), lambda b_, i: (b_, 0, 0),
                                      memory_space=pltpu.VMEM))
            args.append(m.reshape(B, 1, D))
    for p, present in ((w, has_w), (b, has_b)):
        if present:
            specs.append(pl.BlockSpec((1, D), lambda b_, i: (0, 0),
                                      memory_space=pltpu.VMEM))
            args.append(p.reshape(1, D))

    def kernel(*refs):
        x_ref = refs[0]
        idx = 1
        ms_ref = mb_ref = w_ref = b_ref = None
        if has_mod:
            ms_ref, mb_ref = refs[idx], refs[idx + 1]
            idx += 2
        if has_w:
            w_ref = refs[idx]
            idx += 1
        if has_b:
            b_ref = refs[idx]
            idx += 1
        o_ref = refs[-2] if quant_out else refs[-1]
        rs_ref = refs[-1] if quant_out else None
        _mln_kernel(x_ref, ms_ref, mb_ref, w_ref, b_ref, o_ref, rs_ref,
                    eps=eps, has_mod=has_mod, has_w=has_w, has_b=has_b,
                    quant=quant_out, out_dtype=x.dtype)

    o_spec = pl.BlockSpec((1, TL, D), lambda b_, i: (b_, i, 0),
                          memory_space=pltpu.VMEM)
    if quant_out:
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=specs,
            out_specs=(o_spec,
                       pl.BlockSpec((1, TL, 1), lambda b_, i: (b_, i, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((B, L, D), jnp.int8),
                       jax.ShapeDtypeStruct((B, L, 1), jnp.float32)),
            interpret=interpret,
        )(*args)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        interpret=interpret,
    )(*args)


@functools.lru_cache(maxsize=None)
def _make_mln_vjp(eps: float, has_mod: bool, has_w: bool, has_b: bool,
                  interpret: bool):
    """custom_vjp wrapper: Pallas forward, jnp-recompute backward. The
    Pallas kernels have no autodiff rules (pltpu.roll etc.), so training
    through the fused norms must not differentiate the kernel itself."""
    def ref(x, ms, mb, w, b):
        return modulated_layer_norm_ref(x, ms, mb, w, b, eps)

    @jax.custom_vjp
    def f(x, ms, mb, w, b):
        msr = None if ms is None else ms.reshape(x.shape[0], x.shape[-1]
                                                 ).astype(jnp.float32)
        mbr = None if mb is None else mb.reshape(x.shape[0], x.shape[-1]
                                                 ).astype(jnp.float32)
        return _mln_pallas(x, msr, mbr, w, b, eps, interpret=interpret)

    def fwd(x, ms, mb, w, b):
        return f(x, ms, mb, w, b), (x, ms, mb, w, b)

    def bwd(res, g):
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def modulated_layer_norm(x, mod_scale=None, mod_shift=None, weight=None,
                         bias=None, eps: float = 1e-6,
                         interpret: bool = False, force_ref: bool = False,
                         quant_out: bool = False):
    """Fused LN(+affine)(+AdaLN modulate). Pallas on TPU, jnp elsewhere.
    force_ref: forward-mode (jax.jvp) passes must use the jnp chain — the
    generic Pallas JVP rule does not cover this kernel.
    quant_out: additionally emit per-row INT8 + (B, L, 1) fp32 scales for a
    downstream W8A8 GEMM (int8_linear_prequant) — the standalone
    quantize_rows pass costs a full HBM round trip per use."""
    D = x.shape[-1]
    on_tpu = jax.default_backend() == "tpu" or interpret
    if force_ref or not on_tpu or D % 128 != 0:
        y = modulated_layer_norm_ref(x, mod_scale, mod_shift, weight,
                                     bias, eps)
        if not quant_out:
            return y
        yf = y.astype(jnp.float32)
        amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        return jnp.round(yf / scale).astype(jnp.int8), scale
    if quant_out:
        ms = None if mod_scale is None else \
            mod_scale.reshape(x.shape[0], D).astype(jnp.float32)
        mb = None if mod_shift is None else \
            mod_shift.reshape(x.shape[0], D).astype(jnp.float32)
        # inference-only fast path (no VJP defined for the int8 outputs)
        return _mln_pallas(x, ms, mb, weight, bias, eps, interpret=interpret,
                           quant_out=True)
    fn = _make_mln_vjp(eps, mod_scale is not None, weight is not None,
                       bias is not None, interpret)
    return fn(x, mod_scale, mod_shift, weight, bias)


# ---------------------------------------------------------------------------
# fused per-head RMSNorm + rotate-half RoPE
# ---------------------------------------------------------------------------

def rope_cos_sin_full(freqs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Angles (L, Dh/2) -> rotate-half tables (cosF, sinF) of shape (L, Dh):
    cosF = [cos | cos], sinF = [-sin | sin], so that
    rope(x) = x * cosF + roll(x, Dh/2) * sinF  (roll within each head)."""
    cos = jnp.cos(freqs).astype(jnp.float32)
    sin = jnp.sin(freqs).astype(jnp.float32)
    return (jnp.concatenate([cos, cos], axis=-1),
            jnp.concatenate([-sin, sin], axis=-1))


def rmsnorm_rope_ref(x, weight, cos_full, sin_full, eps: float = 1e-5):
    """Exact unfused chain: rms_norm over the FULL channel dim (WanRMSNorm is
    built with the model dim, wan2pt1.py:181-199,226-228: fp32 stats, bf16
    cast, bf16 weight mul) then rotate-half rope in fp32
    (models/rope.py:apply_rope).

    x: (B, L, H*Dh); weight: (H*Dh,); cos_full/sin_full: (L, Dh).
    Returns (B, L, H, Dh).
    """
    B, L, HD = x.shape
    Dh = cos_full.shape[-1]
    H = HD // Dh
    xf = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    y = ((xf * rms).astype(x.dtype) * weight.astype(x.dtype)
         ).reshape(B, L, H, Dh)
    yf = y.astype(jnp.float32)
    half = jnp.concatenate([yf[..., Dh // 2:], yf[..., : Dh // 2]], axis=-1)
    out = yf * cos_full[None, :, None, :] + half * sin_full[None, :, None, :]
    return out.astype(x.dtype)


def _rmsrope_kernel(x_ref, w_ref, cos_ref, sin_ref, o_ref, *, eps: float,
                    H: int, Dh: int, rope: bool):
    cosF = cos_ref[...] if rope else None                # (TL, Dh)
    sinF = sin_ref[...] if rope else None
    # RMS statistic over the FULL channel dim (WanRMSNorm(dim))
    xf = x_ref[0].astype(jnp.float32)                    # (TL, H*Dh)
    rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        y = (xf[:, sl] * rms).astype(o_ref.dtype) * w_ref[0, sl]
        if rope:
            yf = y.astype(jnp.float32)
            o = yf * cosF + pltpu.roll(yf, Dh // 2, axis=1) * sinF
            o_ref[0, :, sl] = o.astype(o_ref.dtype)
        else:
            o_ref[0, :, sl] = y


@functools.partial(jax.jit,
                   static_argnames=("eps", "num_heads", "interpret",
                                    "block_l", "width", "col_block"))
def _rmsrope_pallas(x, w, cos_full, sin_full, eps: float, num_heads: int,
                    interpret: bool = False, block_l: int = 512,
                    width: Optional[int] = None, col_block: int = 0):
    B, L, Wx = x.shape
    HD = width or Wx
    H = num_heads
    Dh = HD // H
    TL = min(block_l, max(8, (1_000_000 // HD) // 8 * 8), L)
    grid = (B, _cdiv(L, TL))
    rope = cos_full is not None

    specs = [
        # width/col_block: read columns [col_block*width, (col_block+1)*width)
        # of a wider input (a fused-QKV GEMM output) — the slice rides the
        # BlockSpec index map, i.e. for free in the DMA
        pl.BlockSpec((1, TL, HD), lambda b_, i, c=col_block: (b_, i, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, HD), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w.reshape(1, HD).astype(x.dtype)]
    if rope:
        specs += [pl.BlockSpec((TL, Dh), lambda b_, i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2
        args += [cos_full, sin_full]

    def kernel(*refs):
        x_ref, w_ref = refs[0], refs[1]
        cos_ref = refs[2] if rope else None
        sin_ref = refs[3] if rope else None
        _rmsrope_kernel(x_ref, w_ref, cos_ref, sin_ref, refs[-1], eps=eps,
                        H=H, Dh=Dh, rope=rope)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((1, TL, HD), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, HD), x.dtype),
        interpret=interpret,
    )(*args)


@functools.lru_cache(maxsize=None)
def _make_rmsrope_vjp(eps: float, num_heads: int, rope: bool,
                      interpret: bool):
    """custom_vjp wrapper: Pallas forward, jnp-recompute backward (the
    kernel's pltpu.roll has no differentiation rule). cos/sin tables are
    constants — zero cotangents."""
    def ref(x, w, cosF, sinF):
        B, L, HD = x.shape
        if not rope:
            from turbodiffusion_tpu.models.layers import rms_norm
            return rms_norm(x, w, eps=eps).reshape(B, L, num_heads,
                                                   HD // num_heads)
        return rmsnorm_rope_ref(x, w, cosF, sinF, eps)

    @jax.custom_vjp
    def f(x, w, cosF, sinF):
        out = _rmsrope_pallas(x, w, cosF, sinF, eps, num_heads,
                              interpret=interpret)
        B, L, HD = x.shape
        return out.reshape(B, L, num_heads, HD // num_heads)

    def fwd(x, w, cosF, sinF):
        return f(x, w, cosF, sinF), (x, w, cosF, sinF)

    def bwd(res, g):
        x, w, cosF, sinF = res
        _, vjp = jax.vjp(lambda x_, w_: ref(x_, w_, cosF, sinF), x, w)
        dx, dw = vjp(g)
        zc = None if cosF is None else jnp.zeros_like(cosF)
        zs = None if sinF is None else jnp.zeros_like(sinF)
        return dx, dw, zc, zs

    f.defvjp(fwd, bwd)
    return f


def rmsnorm_rope(x, weight, cos_full=None, sin_full=None, *, num_heads: int,
                 eps: float = 1e-5, interpret: bool = False,
                 force_ref: bool = False):
    """Fused RMSNorm-QK (+rotate-half RoPE). x: (B, L, H*Dh) projection
    output; returns (B, L, H, Dh). cos/sin_full from `rope_cos_sin_full`
    (None => norm only, e.g. cross-attention K).
    force_ref: forward-mode (jax.jvp) passes must use the jnp chain —
    `pltpu.roll` in the kernel has no differentiation rule."""
    B, L, HD = x.shape
    Dh = HD // num_heads
    on_tpu = jax.default_backend() == "tpu" or interpret
    if force_ref or not on_tpu or Dh % 128 != 0:
        if cos_full is None:
            from turbodiffusion_tpu.models.layers import rms_norm
            return rms_norm(x, weight, eps=eps).reshape(B, L, num_heads, Dh)
        return rmsnorm_rope_ref(x, weight, cos_full, sin_full, eps)
    fn = _make_rmsrope_vjp(eps, num_heads, cos_full is not None, interpret)
    return fn(x, weight, cos_full, sin_full)
