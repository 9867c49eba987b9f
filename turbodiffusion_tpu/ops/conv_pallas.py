"""Pallas implicit-GEMM 3x3(x kt) convolution for the Wan VAE (VERDICT r2 #2).

The decoder's XLA lowering runs its convs at ~20-25% MXU (probe_conv_mxu.py)
and spends extra time in per-tap temporal slices, 'same'-pad
materialization and unfused norm/silu glue. This kernel runs the 3D causal
conv as implicit GEMM over channels-last tiles:

  * temporal taps as BlockSpec index offsets on the (already cache-
    concatenated) T axis — no sliced copies;
  * H halos via a dedicated 2-row halo block (block shape 2, index
    (h+1)*TH/2) — input re-read is (TH+2)/TH, not 2x;
  * per (dt, dh) the three dw taps fold into ONE patch matrix
    (TH*W, 3C) dotted against a (3C, BO) weight slab — K >= 288 keeps the
    MXU K-dim busy vs 27 tiny K=C dots;
  * the pre-conv RMSNorm+SiLU (wan2pt1.py:180-215 ResidualBlock) fused into
    the tile load — norm(0)=0 keeps the zero border exact;
  * fp32 tap accumulation, bias + residual-add epilogue.

Weights arrive in torch layout (O, I, kt, kh, kw) relayouted once by the
caller to (kt, kh, kw, I, O).
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


def _norm_silu(x, gamma, cdim: int):
    """VAE RMS_norm (F.normalize * sqrt(C) * gamma) + SiLU, fp32
    (models/vae.py:_channel_rms_norm)."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    y = xf / jnp.maximum(norm, 1e-12) * (cdim ** 0.5) * gamma
    return jax.nn.silu(y)


def _conv_kernel(*refs, kt: int, TH: int, W: int, C: int, BO: int,
                 pre: str, has_res: bool, out_dtype):
    it = iter(refs)
    xs = [next(it) for _ in range(2 * kt)]   # per dt: TH-row block, 2-row halo
    w_ref = next(it)                         # (kt, 3, 3C, BO)
    b_ref = next(it)                         # (1, BO)
    g_ref = next(it) if pre == "norm_silu" else None
    res_ref = next(it) if has_res else None
    o_ref = next(it)
    patch_ref = next(it)                     # VMEM scratch (TH, W, 3C)

    acc = jnp.zeros((TH * W, BO), jnp.float32)
    for dt in range(kt):
        x0 = xs[2 * dt][0, 0]                # (TH, W+2, C)
        x1 = xs[2 * dt + 1][0, 0]            # (2,  W+2, C)
        tile = jnp.concatenate([x0, x1], axis=0)       # (TH+2, W+2, C)
        if pre == "norm_silu":
            tile = _norm_silu(tile, g_ref[0].astype(jnp.float32), C
                              ).astype(x0.dtype)
        for dh in range(3):
            rows = tile[dh:dh + TH]                    # (TH, W+2, C)
            # dw taps folded along the channel axis via scratch stores —
            # (dw, c) minor order matches the weight reshape. (A lane-dim
            # jnp.concatenate of the shifted slices is unsupported by
            # Mosaic: "offset mismatch on non-concat dimension".)
            for dw in range(3):
                patch_ref[:, :, dw * C:(dw + 1) * C] = rows[:, dw:dw + W]
            acc += jax.lax.dot(
                patch_ref[...].reshape(TH * W, 3 * C), w_ref[dt, dh],
                preferred_element_type=jnp.float32)
    out = acc + b_ref[0].astype(jnp.float32)[None, :]
    out = out.reshape(TH, W, BO)
    if has_res:
        out = out + res_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = out.astype(out_dtype)


def _pick_tiles(kt: int, W: int, C: int, O: int):
    """(TH, BO) under the 16MB scoped-VMEM limit (budget ~12MB: Mosaic's
    stack estimate exceeded a naive 11MB sum by ~1.5x before the patch
    buffer was accounted)."""
    BO = O if O <= 256 else 128
    TH = 16
    while TH > 2:
        inputs = kt * ((TH + 2) * (W + 2) * C * 2 * 2)
        patch = TH * W * 3 * C * 2
        ntmp = (TH + 2) * (W + 2) * C * 4
        wts = kt * 9 * C * BO * 2 * 2
        acc = TH * W * max(BO, 128) * 4
        outb = 2 * TH * W * max(BO, 128) * 2
        if inputs + patch + ntmp + wts + acc + outb <= 12_000_000:
            break
        TH //= 2
    return TH, BO


@functools.partial(jax.jit, static_argnames=("pre", "interpret", "out_dtype"))
def conv3x3_fused(x, w, b, gamma=None, residual=None, pre: str = "none",
                  out_dtype=None, interpret: bool = False):
    """y[b, t] = sum_dt conv2d_3x3(preop(x[b, t+dt]), w[dt]) + bias
    [+ residual].

    x: (B, T2, H, W, C) channels-last with the temporal extent already
    cache-extended (T2 = T_out + kt - 1; models/vae.py _causal_conv3d);
    w: (kt, 3, 3, C, O); b: (O,); gamma: (C,) when pre="norm_silu";
    residual: (B, T_out, H, W, O) added in the epilogue.
    Returns (B, T_out, H, W, O).
    """
    B, T2, H, W, C = x.shape
    kt, kh, kw, _, O = w.shape
    assert (kh, kw) == (3, 3)
    T_out = T2 - kt + 1
    out_dtype = out_dtype or x.dtype

    TH, BO = _pick_tiles(kt, W, C, O)
    nH = _cdiv(H, TH)
    nO = O // BO
    # zero border: 1 top row; bottom padded to nH*TH + 2 so the last halo
    # block exists; W +1 both sides. Zero rows/cols contribute exactly zero
    # even under norm_silu (norm(0) = 0, silu(0) = 0).
    xf = jnp.pad(x, ((0, 0), (0, 0), (1, nH * TH + 1 - H), (1, 1),
                     (0, 0)))
    # weights: (kt, 3, 3, C, O) -> (kt, 3, 3C, O); (dw, c) minor order
    # matches the kernel's patch concat
    wf = w.reshape(kt, 3, 3 * C, O)

    grid = (B * T_out, nH, nO)
    in_specs = []
    args = []
    for dt in range(kt):
        in_specs.append(pl.BlockSpec(
            (1, 1, TH, W + 2, C),
            lambda t, h, o, dt=dt: (t // T_out, t % T_out + dt, h, 0, 0)))
        args.append(xf)
        in_specs.append(pl.BlockSpec(
            (1, 1, 2, W + 2, C),
            lambda t, h, o, dt=dt: (t // T_out, t % T_out + dt,
                                    (h + 1) * (TH // 2), 0, 0)))
        args.append(xf)
    in_specs.append(pl.BlockSpec((kt, 3, 3 * C, BO),
                                 lambda t, h, o: (0, 0, 0, o)))
    args.append(wf)
    in_specs.append(pl.BlockSpec((1, BO), lambda t, h, o: (0, o)))
    args.append(b.reshape(1, O))
    if pre == "norm_silu":
        in_specs.append(pl.BlockSpec((1, C), lambda t, h, o: (0, 0)))
        args.append(gamma.reshape(1, C))
    has_res = residual is not None
    if has_res:
        in_specs.append(pl.BlockSpec(
            (1, 1, TH, W, BO),
            lambda t, h, o: (t // T_out, t % T_out, h, 0, o)))
        args.append(jnp.pad(residual,
                            ((0, 0), (0, 0), (0, nH * TH - H), (0, 0),
                             (0, 0))))

    out = pl.pallas_call(
        functools.partial(_conv_kernel, kt=kt, TH=TH, W=W, C=C, BO=BO,
                          pre=pre, has_res=has_res, out_dtype=out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, TH, W, BO),
            lambda t, h, o: (t // T_out, t % T_out, h, 0, o)),
        out_shape=jax.ShapeDtypeStruct((B, T_out, nH * TH, W, O), out_dtype),
        scratch_shapes=[pltpu.VMEM((TH, W, 3 * C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out[:, :, :H]


def _norm_silu_kernel(x_ref, g_ref, o_ref, *, cdim: int):
    o_ref[0] = _norm_silu(x_ref[0], g_ref[0].astype(jnp.float32), cdim
                          ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def norm_silu_pallas(x, gamma, interpret: bool = False):
    """One-pass channel-RMSNorm (F.normalize * sqrt(C) * gamma) + SiLU over
    a channels-last (..., C) tensor. The XLA lowering of this chain inside
    the VAE decode materializes fp32 intermediates across the conv
    boundary (profiled ~0.5 s of the 480p decode vs a ~20 ms HBM-bandwidth
    bound); this kernel guarantees bf16-in/bf16-out with fp32 math in VMEM.
    """
    shape = x.shape
    C = shape[-1]
    x2 = x.reshape(1, -1, C)
    M = x2.shape[1]
    TL = max(8, min(1024, (1_500_000 // C) // 8 * 8))
    nM = _cdiv(M, TL)
    out = pl.pallas_call(
        functools.partial(_norm_silu_kernel, cdim=C),
        grid=(nM,),
        in_specs=[pl.BlockSpec((1, TL, C), lambda i: (0, i, 0)),
                  pl.BlockSpec((1, C), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, TL, C), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((1, M, C), x.dtype),
        interpret=interpret,
    )(x2, gamma.reshape(1, C).astype(jnp.float32))
    return out.reshape(shape)


def conv3x3_fused_ref(x, w, b, gamma=None, residual=None, pre: str = "none"):
    """jnp reference with identical semantics."""
    B, T2, H, W, C = x.shape
    kt = w.shape[0]
    T_out = T2 - kt + 1
    if pre == "norm_silu":
        xin = _norm_silu(x, gamma.astype(jnp.float32), C).astype(x.dtype)
    else:
        xin = x
    acc = None
    for dt in range(kt):
        xs = xin[:, dt:dt + T_out].reshape(B * T_out, H, W, C)
        y = jax.lax.conv_general_dilated(
            xs, w[dt].astype(xs.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        acc = y if acc is None else acc + y
    out = acc.astype(jnp.float32) + b.astype(jnp.float32)
    out = out.reshape(B, T_out, H, W, -1)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)
