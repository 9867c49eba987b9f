"""W8A8 INT8 quantized linears.

Two layouts, mirroring the reference's two generations of kernels:

  * "block"     — per-128x128-block symmetric scales for both weight and
                  activation; per-K-block rescale accumulated in fp32. This is
                  the main repo's CuTe GEMM contract (ops/gemm/kernel.hpp:
                  417-419, ops/quant/quant.hpp:32-154) and matches the
                  `Int8Linear` checkpoint layout (ops/core.py:391-432):
                  int8 weight + fp32 scale grid [cdiv(out,128), cdiv(in,128)].
  * "postscale" — per-row activation / per-out-channel weight scales applied
                  once in the epilogue (TurboT2AV's TileLang backend,
                  tilelang_w8a8.py:16-117). K-continuous INT8 accumulation;
                  on TPU this is a single s8xs8->s32 MXU `dot_general` that
                  XLA fuses end-to-end, so it is the default fast path.

Weights here are stored (in_features, out_features); the importer transposes
torch's (out, in).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 128
INT8_MAX = 127.0


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Quantizers
# ---------------------------------------------------------------------------

def quantize_int8_block(w: jnp.ndarray, block: int = QBLOCK):
    """Per-(block x block) symmetric quant of a (K, N) weight.

    Returns (w_int8 (K, N), scale fp32 (Kb, Nb)). Mirrors the reference's
    absmax block quantizer (ops/quant/quant.hpp:122-154). Leading batch dims
    (stacked layers) are vmapped."""
    if w.ndim > 2:
        return jax.vmap(lambda x: quantize_int8_block(x, block))(w)
    K, N = w.shape
    Kb, Nb = _cdiv(K, block), _cdiv(N, block)
    wp = jnp.pad(w.astype(jnp.float32), ((0, Kb * block - K), (0, Nb * block - N)))
    wb = wp.reshape(Kb, block, Nb, block)
    amax = jnp.max(jnp.abs(wb), axis=(1, 3))                  # (Kb, Nb)
    scale = jnp.maximum(amax, 1e-8) / INT8_MAX
    q = jnp.round(wb / scale[:, None, :, None]).astype(jnp.int8)
    q = q.reshape(Kb * block, Nb * block)[:K, :N]
    return q, scale


def quantize_activation_block(x: jnp.ndarray, block: int = QBLOCK):
    """Per-(block x block) quant of activations (M, K) -> (x_q, scale (Mb,Kb))."""
    M, K = x.shape
    Mb, Kb = _cdiv(M, block), _cdiv(K, block)
    xp = jnp.pad(x.astype(jnp.float32), ((0, Mb * block - M), (0, Kb * block - K)))
    xb = xp.reshape(Mb, block, Kb, block)
    amax = jnp.max(jnp.abs(xb), axis=(1, 3))
    scale = jnp.maximum(amax, 1e-8) / INT8_MAX
    q = jnp.round(xb / scale[:, None, :, None]).astype(jnp.int8)
    return q.reshape(Mb * block, Kb * block), scale


def quantize_int8_postscale(w: jnp.ndarray):
    """Per-out-channel weight quant: (K, N) -> (w_int8, col_scale (N,)).
    Leading batch dims (stacked layers) are vmapped."""
    if w.ndim > 2:
        return jax.vmap(quantize_int8_postscale)(w)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-8) / INT8_MAX
    q = jnp.round(w.astype(jnp.float32) / scale[None, :]).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------------------
# Postscale GEMM — Pallas MXU kernel with fused dequant epilogue
# ---------------------------------------------------------------------------

def quantize_rows_int8(x2):
    """Per-row symmetric activation quant: (M, K) -> (int8 (M, K),
    row_scale fp32 (M, 1)). The x*inv product stays in the input dtype so no
    fp32 copy of the activation is materialized."""
    row_amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True).astype(jnp.float32)
    row_scale = jnp.maximum(row_amax, 1e-8) / INT8_MAX
    inv = (1.0 / row_scale).astype(x2.dtype)
    xq = jnp.clip(jnp.round((x2 * inv).astype(jnp.float32)),
                  -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return xq, row_scale


def _rowquant_kernel(x_ref, xq_ref, rs_ref):
    x = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / INT8_MAX)
    xq_ref[...] = jnp.round(x * (1.0 / scale)).astype(jnp.int8)
    rs_ref[...] = scale


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_rows_int8_pallas(x2, interpret: bool = False):
    """Pallas per-row activation quant: (M, K) -> (int8, (M,1) fp32 scales).
    XLA's reduce+round+int8-pack lowering measures ~10x off bandwidth on
    v5e; this single pass is bandwidth-bound."""
    M, K = x2.shape
    # ~10 bytes/element live (bf16 in + f32 temp + int8 out, double-buffered);
    # stay under the 16MB scoped-vmem limit. Narrow inputs take tall blocks —
    # per-grid-step overhead dominates at 64KB blocks.
    BM = max(8, min(2048, (1_200_000 // K) // 8 * 8))
    BM = min(BM, max(8, M))
    grid = (_cdiv(M, BM),)
    return pl.pallas_call(
        _rowquant_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((BM, K), lambda m: (m, 0))],
        out_specs=(pl.BlockSpec((BM, K), lambda m: (m, 0)),
                   pl.BlockSpec((BM, 1), lambda m: (m, 0))),
        out_shape=(jax.ShapeDtypeStruct((M, K), jnp.int8),
                   jax.ShapeDtypeStruct((M, 1), jnp.float32)),
        interpret=interpret,
    )(x2)


def _postscale_gemm_kernel(xq_ref, wq_ref, rs_ref, cs_ref, bias_ref,
                           gate_ref, res_ref, o_ref, acc_scr, *, n_k: int,
                           act: Optional[str], has_bias: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    acc_scr[...] += jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        # dequant epilogue in-register: rank-1 scales, bias, activation,
        # optional AdaLN gate + residual add, cast (the reference's
        # per-K-block rescale collapses to one postscale here because
        # scales are K-constant — tilelang_w8a8.py:78-117)
        out = acc_scr[...].astype(jnp.float32) * rs_ref[...] * \
            cs_ref[0][None, :]
        if has_bias:
            out = out + bias_ref[0][None, :].astype(jnp.float32)
        if act == "gelu_tanh":
            out = jax.nn.gelu(out, approximate=True)
        if gate_ref is not None:
            out = out * gate_ref[0][None, :].astype(jnp.float32)
        if res_ref is not None:
            out = out + res_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def _pick_bk(K: int, cap: int = 2048) -> int:
    """Largest multiple of 128 that divides K and is <= cap (avoids K-dim
    zero-padding, which would corrupt the int32 accumulation)."""
    if K <= cap:
        return K
    best = 128
    for m in range(1, cap // 128 + 1):
        bk = m * 128
        if K % bk == 0:
            best = bk
    return best


@functools.partial(jax.jit, static_argnames=("act", "has_bias", "out_dtype",
                                              "interpret"))
def int8_gemm_postscale_pallas(xq, row_scale, wq, col_scale, bias=None,
                               act: Optional[str] = None,
                               has_bias: bool = False,
                               out_dtype=jnp.bfloat16,
                               interpret: bool = False,
                               gate=None, residual=None):
    """W8A8 GEMM: out = act((xq @ wq) * row_scale * col_scale + bias)
    [* gate] [+ residual].

    xq: (M, K) int8; row_scale: (M, 1) fp32; wq: (K, N) int8;
    col_scale: (N,) fp32. One MXU s8xs8->s32 pass with everything else fused
    into the epilogue — the TPU analog of the reference's CuTe GEMM
    (ops/gemm/kernel.hpp:417-419) / TileLang postscale (tilelang_w8a8.py).
    gate: optional (N,) per-column multiplier (an AdaLN gate at batch 1);
    residual: optional (M, N) tensor added after the gate — fusing the
    transformer residual add here saves a full write+read of the GEMM
    output per projection.
    """
    M, K = xq.shape
    N = wq.shape[1]
    assert K % 128 == 0, f"K={K} must be a lane multiple"
    if M >= 4096 and _wres_on() and _wres_viable(K, N, min(512, N)):
        return _postscale_wres(xq, row_scale, wq, col_scale, bias, act,
                               has_bias, out_dtype, interpret, gate,
                               residual)
    # N-tile: 1024 on wide weights (14B 5120x5120 projections measured
    # 15.01 -> 14.87 s end-to-end vs BN 512 — fewer weight revisits per
    # M-row and deeper MXU pipelining), 512 otherwise; TDX_PS_BN overrides.
    import os as _os
    BM = min(1024, max(8, M))
    BN0 = int(_os.environ.get("TDX_PS_BN", "0")) or \
        (1024 if N >= 4096 else 512)
    BN = min(BN0, N)
    BK = _pick_bk(K)
    n_k = K // BK
    grid = (_cdiv(M, BM), _cdiv(N, BN), n_k)
    cparams = dict(dimension_semantics=("parallel", "parallel",
                                        "arbitrary"))
    if BN > 512:
        cparams["vmem_limit_bytes"] = 64 * 1024 * 1024

    in_specs = [
        pl.BlockSpec((BM, BK), lambda m, n, k: (m, k)),
        pl.BlockSpec((BK, BN), lambda m, n, k: (k, n)),
        pl.BlockSpec((BM, 1), lambda m, n, k: (m, 0)),
        pl.BlockSpec((1, BN), lambda m, n, k: (0, n)),
    ]
    args = [xq, wq, row_scale, col_scale.reshape(1, N)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, BN), lambda m, n, k: (0, n)))
        args.append(bias.reshape(1, N).astype(jnp.float32))
    has_gate = gate is not None
    if has_gate:
        in_specs.append(pl.BlockSpec((1, BN), lambda m, n, k: (0, n)))
        args.append(gate.reshape(1, N).astype(jnp.float32))
    has_res = residual is not None
    if has_res:
        in_specs.append(pl.BlockSpec((BM, BN), lambda m, n, k: (m, n)))
        args.append(residual)

    def kernel(*refs):
        idx = 4
        bias_ref = gate_ref = res_ref = None
        if has_bias:
            bias_ref = refs[idx]; idx += 1
        if has_gate:
            gate_ref = refs[idx]; idx += 1
        if has_res:
            res_ref = refs[idx]; idx += 1
        _postscale_gemm_kernel(refs[0], refs[1], refs[2], refs[3], bias_ref,
                               gate_ref, res_ref, refs[idx], refs[idx + 1],
                               n_k=n_k, act=act, has_bias=has_bias)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(**cparams),
        interpret=interpret,
    )(*args)


def _pick_bn_div(N: int, lo: int = 384, hi: int = 1024) -> int:
    """Largest lane-multiple BN in [lo, hi] that divides N (the quant-out
    epilogue's per-(row, N-tile) scales must tile N exactly so the consumer
    GEMM can rescale per K-block)."""
    best = 0
    for m in range(lo // 128, hi // 128 + 1):
        bn = m * 128
        if N % bn == 0:
            best = bn
    return best


def _postscale_gemm_qout_kernel(xq_ref, wq_ref, rs_ref, cs_ref, bias_ref,
                                o_ref, os_ref, scs_scr, acc_scr, *,
                                n_k: int, n_n: int, act: Optional[str],
                                has_bias: bool):
    n, k = pl.program_id(1), pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when((n == 0) & (k == 0))
    def _():
        scs_scr[...] = jnp.zeros_like(scs_scr)

    acc_scr[...] += jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        out = acc_scr[...].astype(jnp.float32) * rs_ref[...] * \
            cs_ref[0][None, :]
        if has_bias:
            out = out + bias_ref[0][None, :].astype(jnp.float32)
        if act == "gelu_tanh":
            out = jax.nn.gelu(out, approximate=True)
        # per-(row, N-tile) int8 quantization rides the epilogue — the
        # consumer GEMM rescales per K-block (the standalone quantize_rows
        # pass over the FFN hidden is a 0.9 GB HBM round trip at 480p).
        # Scales collect in a (BM, n_n) scratch selected by a one-hot lane
        # mask ((BM, 1) output blocks violate the TPU lane tiling) and
        # flush once on the last n tile.
        amax = jnp.max(jnp.abs(out), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) * (1.0 / INT8_MAX)
        o_ref[...] = jnp.round(out * (1.0 / scale)).astype(jnp.int8)
        lane = jax.lax.broadcasted_iota(jnp.int32, scs_scr.shape, 1)
        scs_scr[...] = jnp.where(lane == n, scale, scs_scr[...])

    @pl.when((k == n_k - 1) & (n == n_n - 1))
    def _():
        os_ref[...] = scs_scr[...]


_WRES_CAP = 24 * 1024 * 1024   # weight-resident VMEM budget (int8 bytes)


def _wres_cap() -> int:
    """Weight-resident VMEM budget. Default _WRES_CAP (24 MB); TDX_WRES_CAP
    (in MB) overrides for on-chip sweeps — e.g. 26 makes a 14B (5120, 5120)
    25 MB projection a single resident group."""
    import os
    v = os.environ.get("TDX_WRES_CAP")
    return int(float(v) * 1024 * 1024) if v else _WRES_CAP


def _wres_on() -> bool:
    import os
    return os.environ.get("TDX_GEMM_WRES", "1") != "0"


def _wres_viable(K: int, N: int, BN: int) -> bool:
    """wres only when the WHOLE weight is one resident VMEM group. With
    n_g > 1 the kernel re-streams the full (M, K) int8 activation once per
    group — at 14B (n_g 3-4, M 32760) that is ~0.5-0.7 GB of extra HBM
    traffic per GEMM, and the measured end-to-end 14B denoise regresses
    16.37 -> 20.67 s (scripts_dev/probe_gemm_14b.py history, r5). Single
    group (every 1.3B weight: <= 13.8 MB) wins: 2.057 -> 1.970 s headline."""
    n_g, _, _ = _wres_groups(K, N, BN)
    return n_g == 1


def _postscale_wres(xq, row_scale, wq, col_scale, bias, act, has_bias,
                    out_dtype, interpret, gate, residual):
    """Weight-resident postscale GEMM (see _qout_wres_kernel's rationale):
    (K, NG) weight groups in VMEM, grid (group, M-tile) with the group
    OUTER so each weight group streams once per GEMM; N walked with static
    lane slices. Engaged for the QKV/O/cross projections at long-M
    inference shapes; the tiled kernel re-fetched the weights once per
    1024-row M-tile (at 14B: 78 MB x 32 tiles = 2.5 GB per QKV call)."""
    M, K = xq.shape
    N = wq.shape[1]
    BN = min(512, N)
    n_g, nn_g, NG = _wres_groups(K, N, BN)
    BM = min(512, max(8, M))
    in_specs = [
        pl.BlockSpec((BM, K), lambda g, m: (m, 0)),
        pl.BlockSpec((K, NG), lambda g, m: (0, g)),
        pl.BlockSpec((BM, 1), lambda g, m: (m, 0)),
        pl.BlockSpec((1, NG), lambda g, m: (0, g)),
    ]
    args = [xq, wq, row_scale, col_scale.reshape(1, N)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, NG), lambda g, m: (0, g)))
        args.append(bias.reshape(1, N).astype(jnp.float32))
    has_gate = gate is not None
    if has_gate:
        in_specs.append(pl.BlockSpec((1, NG), lambda g, m: (0, g)))
        args.append(gate.reshape(1, N).astype(jnp.float32))
    has_res = residual is not None
    if has_res:
        in_specs.append(pl.BlockSpec((BM, NG), lambda g, m: (m, g)))
        args.append(residual)

    def kernel(*refs):
        idx = 4
        bias_ref = gate_ref = res_ref = None
        if has_bias:
            bias_ref = refs[idx]; idx += 1
        if has_gate:
            gate_ref = refs[idx]; idx += 1
        if has_res:
            res_ref = refs[idx]; idx += 1
        o_ref = refs[idx]
        x = refs[0][...]
        for n in range(nn_g):
            lo, hi = n * BN, (n + 1) * BN
            acc = jax.lax.dot_general(
                x, refs[1][:, lo:hi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * refs[2][...] * \
                refs[3][0, lo:hi][None, :]
            if has_bias:
                out = out + bias_ref[0, lo:hi][None, :]
            if act == "gelu_tanh":
                out = jax.nn.gelu(out, approximate=True)
            if gate_ref is not None:
                out = out * gate_ref[0, lo:hi][None, :]
            if res_ref is not None:
                out = out + res_ref[:, lo:hi].astype(jnp.float32)
            o_ref[:, lo:hi] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n_g, _cdiv(M, BM)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, NG), lambda g, m: (m, g)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

def _qout_wres_kernel(xq_ref, wq_ref, rs_ref, cs_ref, bias_ref, o_ref,
                      os_ref, *, nn_g: int, BN: int, act: Optional[str],
                      has_bias: bool):
    """Weight-resident qout GEMM: an (K, NG) weight GROUP lives in VMEM and
    the grid runs (group, M-tile) with the group dim OUTER, so each weight
    group streams from HBM once per GEMM — consecutive M-tiles revisit the
    same block and Pallas skips the copy. At fc1's 1.3B shape (M=32760,
    K=1536, N=8960, BM=512) the old tiled kernel re-fetched the 13.1 MB
    weight 64x (~840 MB of weight traffic against a 1.15 ms compute floor);
    at the 14B shapes (70+ MB weights) the groups keep the working set
    under the VMEM cap while x re-streams only n_g times. N is walked with
    static lane slices inside the program."""
    x = xq_ref[...]
    scs = []
    for n in range(nn_g):
        acc = jax.lax.dot_general(
            x, wq_ref[:, n * BN:(n + 1) * BN], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * rs_ref[...] * \
            cs_ref[0, n * BN:(n + 1) * BN][None, :]
        if has_bias:
            out = out + bias_ref[0, n * BN:(n + 1) * BN][None, :]
        if act == "gelu_tanh":
            out = jax.nn.gelu(out, approximate=True)
        amax = jnp.max(jnp.abs(out), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) * (1.0 / INT8_MAX)
        o_ref[:, n * BN:(n + 1) * BN] = jnp.round(
            out * (1.0 / scale)).astype(jnp.int8)
        scs.append(scale)
    os_ref[0] = jnp.concatenate(scs, axis=1)


def _wres_groups(K: int, N: int, BN: int):
    """(n_g, nn_g, NG): split N into n_g groups of nn_g BN-chunks so one
    (K, NG) int8 weight group fits the VMEM budget. The last group may
    overhang N — Pallas masks the out-of-bounds block region."""
    n_n = _cdiv(N, BN)
    nn_g = max(1, min(n_n, _wres_cap() // (K * BN)))
    n_g = _cdiv(n_n, nn_g)
    return n_g, nn_g, nn_g * BN


def _qout_wres(xq, row_scale, wq, col_scale, bias, act, has_bias, BN,
               interpret):
    M, K = xq.shape
    N = wq.shape[1]
    n_n = N // BN
    n_g, nn_g, NG = _wres_groups(K, N, BN)
    BM = min(512, max(8, M))
    in_specs = [
        pl.BlockSpec((BM, K), lambda g, m: (m, 0)),
        pl.BlockSpec((K, NG), lambda g, m: (0, g)),
        pl.BlockSpec((BM, 1), lambda g, m: (m, 0)),
        pl.BlockSpec((1, NG), lambda g, m: (0, g)),
    ]
    args = [xq, wq, row_scale, col_scale.reshape(1, N)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, NG), lambda g, m: (0, g)))
        args.append(bias.reshape(1, N).astype(jnp.float32))

    def kernel(*refs):
        bias_ref = refs[4] if has_bias else None
        _qout_wres_kernel(refs[0], refs[1], refs[2], refs[3], bias_ref,
                          refs[-2], refs[-1], nn_g=nn_g, BN=BN, act=act,
                          has_bias=has_bias)

    # scales ride a (n_g, M, nn_g) layout: a (BM, nn_g) 2D block would
    # violate Mosaic's last-dim tiling rule when nn_g isn't the full array
    # dim (the 14B fc1 grouping); the per-group planes fold on the host
    # (a few KB).
    y, ys3 = pl.pallas_call(
        kernel,
        grid=(n_g, _cdiv(M, BM)),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((BM, NG), lambda g, m: (m, g)),
                   pl.BlockSpec((1, BM, nn_g), lambda g, m: (g, m, 0))),
        out_shape=(jax.ShapeDtypeStruct((M, N), jnp.int8),
                   jax.ShapeDtypeStruct((n_g, M, nn_g), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    ys = jnp.moveaxis(ys3, 0, 1).reshape(M, n_g * nn_g)[:, :n_n]
    return y, ys


@functools.partial(jax.jit, static_argnames=("act", "has_bias", "interpret"))
def int8_gemm_postscale_qout_pallas(xq, row_scale, wq, col_scale, bias=None,
                                    act: Optional[str] = None,
                                    has_bias: bool = False,
                                    interpret: bool = False):
    """W8A8 GEMM whose epilogue emits INT8 + per-(row, BN-block) fp32 scales
    for a downstream blockscale GEMM (int8_gemm_blockact_pallas) with
    bk = _pick_bn_div(N). Returns (y_int8 (M, N), y_scale (M, N // BN))."""
    M, K = xq.shape
    N = wq.shape[1]
    assert K % 128 == 0
    BN = _pick_bn_div(N)
    assert BN, f"N={N} has no lane-multiple divisor in [384, 1024]"
    if M >= 4096 and _wres_on() and _wres_viable(K, N, BN):
        return _qout_wres(xq, row_scale, wq, col_scale, bias, act,
                          has_bias, BN, interpret)
    # M-tile: 1024 at long-M shapes (the 14B fc1 streams its 70 MB weight
    # once per M-tile — 512-row tiles made it weight-fetch-bound, 74% MXU;
    # 1024 measured 16.4 -> 15.0 s on the 14B denoise with the vmem limit
    # raised to match); 512 keeps the worst narrow case (BN 896 +
    # double-buffered int8 ins) under the default 16 MB scoped-vmem limit.
    # TDX_QOUT_BM overrides for sweeps.
    import os as _os
    BM0 = int(_os.environ.get("TDX_QOUT_BM", "0")) or \
        (1024 if M >= 16384 else 512)
    BM = min(BM0, max(8, M))
    BK = _pick_bk(K)
    n_k = K // BK
    grid = (_cdiv(M, BM), N // BN, n_k)
    cparams = dict(dimension_semantics=("parallel", "arbitrary",
                                        "arbitrary"))
    if BM > 512:
        cparams["vmem_limit_bytes"] = 64 * 1024 * 1024

    in_specs = [
        pl.BlockSpec((BM, BK), lambda m, n, k: (m, k)),
        pl.BlockSpec((BK, BN), lambda m, n, k: (k, n)),
        pl.BlockSpec((BM, 1), lambda m, n, k: (m, 0)),
        pl.BlockSpec((1, BN), lambda m, n, k: (0, n)),
    ]
    args = [xq, wq, row_scale, col_scale.reshape(1, N)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, BN), lambda m, n, k: (0, n)))
        args.append(bias.reshape(1, N).astype(jnp.float32))

    n_n = N // BN

    def kernel(*refs):
        bias_ref = refs[4] if has_bias else None
        _postscale_gemm_qout_kernel(refs[0], refs[1], refs[2], refs[3],
                                    bias_ref, refs[-4], refs[-3], refs[-2],
                                    refs[-1], n_k=n_k, n_n=n_n, act=act,
                                    has_bias=has_bias)

    y, ys = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((BM, BN), lambda m, n, k: (m, n)),
                   pl.BlockSpec((BM, n_n), lambda m, n, k: (m, 0))),
        out_shape=(jax.ShapeDtypeStruct((M, N), jnp.int8),
                   jax.ShapeDtypeStruct((M, n_n), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((BM, n_n), jnp.float32),
                        pltpu.VMEM((BM, BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(**cparams),
        interpret=interpret,
    )(*args)
    return y, ys


def _blockact_gemm_kernel(xq_ref, wq_ref, xs_ref, cs_ref, bias_ref,
                          gate_ref, res_ref, o_ref, acc_scr, *, n_k: int,
                          act: Optional[str], has_bias: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    prod = jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # per-K-block activation rescale (the producer's per-(row, tile) scale),
    # accumulated in fp32 — the reference CuTe GEMM's per-K-block pattern
    # (ops/gemm/kernel.hpp:417-419) with a rank-1 scale. The whole (BM, n_k)
    # scale stripe is resident; column k is selected with a one-hot lane
    # mask (dynamic lane indexing is unsupported).
    lane = jax.lax.broadcasted_iota(jnp.int32, xs_ref.shape, 1)
    xsel = jnp.sum(jnp.where(lane == k, xs_ref[...], 0.0), axis=1,
                   keepdims=True)
    acc_scr[...] += prod.astype(jnp.float32) * xsel

    @pl.when(k == n_k - 1)
    def _():
        out = acc_scr[...] * cs_ref[0][None, :]
        if has_bias:
            out = out + bias_ref[0][None, :].astype(jnp.float32)
        if act == "gelu_tanh":
            out = jax.nn.gelu(out, approximate=True)
        if gate_ref is not None:
            out = out * gate_ref[0][None, :].astype(jnp.float32)
        if res_ref is not None:
            out = out + res_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def _blockact_wres_kernel(xq_ref, wq_ref, xs_ref, cs_ref, bias_ref,
                          gate_ref, res_ref, o_ref, *, n_k: int, bk: int,
                          act: Optional[str], has_bias: bool):
    """Weight-resident blockact GEMM (see _qout_wres_kernel): a (K, NG)
    weight group in VMEM, grid (group, M-tile) with the group OUTER, K
    walked with static slices — the per-K-block activation scale is a
    static column slice of xs, no one-hot mask."""
    acc = None
    for kb in range(n_k):
        prod = jax.lax.dot_general(
            xq_ref[:, kb * bk:(kb + 1) * bk],
            wq_ref[kb * bk:(kb + 1) * bk, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        term = prod.astype(jnp.float32) * xs_ref[:, kb:kb + 1]
        acc = term if acc is None else acc + term
    out = acc * cs_ref[0][None, :]
    if has_bias:
        out = out + bias_ref[0][None, :].astype(jnp.float32)
    if act == "gelu_tanh":
        out = jax.nn.gelu(out, approximate=True)
    if gate_ref is not None:
        out = out * gate_ref[0][None, :].astype(jnp.float32)
    if res_ref is not None:
        out = out + res_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _blockact_wres(xq, x_scale, wq, col_scale, bias, act, has_bias, bk,
                   out_dtype, interpret, gate, residual):
    M, K = xq.shape
    N = wq.shape[1]
    n_k = K // bk
    n_g, _, NG = _wres_groups(K, N, 128)
    BM = min(512, max(8, M))
    in_specs = [
        pl.BlockSpec((BM, K), lambda g, m: (m, 0)),
        pl.BlockSpec((K, NG), lambda g, m: (0, g)),
        pl.BlockSpec((BM, n_k), lambda g, m: (m, 0)),
        pl.BlockSpec((1, NG), lambda g, m: (0, g)),
    ]
    args = [xq, wq, x_scale, col_scale.reshape(1, N)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, NG), lambda g, m: (0, g)))
        args.append(bias.reshape(1, N).astype(jnp.float32))
    has_gate = gate is not None
    if has_gate:
        in_specs.append(pl.BlockSpec((1, NG), lambda g, m: (0, g)))
        args.append(gate.reshape(1, N).astype(jnp.float32))
    has_res = residual is not None
    if has_res:
        in_specs.append(pl.BlockSpec((BM, NG), lambda g, m: (m, g)))
        args.append(residual)

    def kernel(*refs):
        idx = 4
        bias_ref = gate_ref = res_ref = None
        if has_bias:
            bias_ref = refs[idx]; idx += 1
        if has_gate:
            gate_ref = refs[idx]; idx += 1
        if has_res:
            res_ref = refs[idx]; idx += 1
        _blockact_wres_kernel(refs[0], refs[1], refs[2], refs[3], bias_ref,
                              gate_ref, res_ref, refs[idx], n_k=n_k, bk=bk,
                              act=act, has_bias=has_bias)

    return pl.pallas_call(
        kernel,
        grid=(n_g, _cdiv(M, BM)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, NG), lambda g, m: (m, g)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("act", "has_bias", "out_dtype",
                                              "interpret", "bk"))
def int8_gemm_blockact_pallas(xq, x_scale, wq, col_scale, bias=None,
                              act: Optional[str] = None,
                              has_bias: bool = False, bk: int = 512,
                              out_dtype=jnp.bfloat16,
                              interpret: bool = False,
                              gate=None, residual=None):
    """W8A8 GEMM over a per-(row, K-block)-scaled int8 activation:
    out = act(sum_kb (xq_kb @ wq_kb) * xs[m, kb] * col_scale + bias)
    [* gate] [+ residual].

    xq: (M, K) int8; x_scale: (M, K // bk) fp32 (the quant-out producer's
    scales); wq: (K, N) int8; col_scale (N,)."""
    M, K = xq.shape
    N = wq.shape[1]
    assert K % bk == 0 and bk % 128 == 0
    n_k = K // bk
    if M >= 4096 and _wres_on() and _wres_viable(K, N, 128):
        return _blockact_wres(xq, x_scale, wq, col_scale, bias, act,
                              has_bias, bk, out_dtype, interpret, gate,
                              residual)
    BM = min(1024, max(8, M))
    BN = min(512, N)
    grid = (_cdiv(M, BM), _cdiv(N, BN), n_k)

    in_specs = [
        pl.BlockSpec((BM, bk), lambda m, n, k: (m, k)),
        pl.BlockSpec((bk, BN), lambda m, n, k: (k, n)),
        pl.BlockSpec((BM, n_k), lambda m, n, k: (m, 0)),
        pl.BlockSpec((1, BN), lambda m, n, k: (0, n)),
    ]
    args = [xq, wq, x_scale, col_scale.reshape(1, N)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, BN), lambda m, n, k: (0, n)))
        args.append(bias.reshape(1, N).astype(jnp.float32))
    has_gate = gate is not None
    if has_gate:
        in_specs.append(pl.BlockSpec((1, BN), lambda m, n, k: (0, n)))
        args.append(gate.reshape(1, N).astype(jnp.float32))
    has_res = residual is not None
    if has_res:
        in_specs.append(pl.BlockSpec((BM, BN), lambda m, n, k: (m, n)))
        args.append(residual)

    def kernel(*refs):
        idx = 4
        bias_ref = gate_ref = res_ref = None
        if has_bias:
            bias_ref = refs[idx]; idx += 1
        if has_gate:
            gate_ref = refs[idx]; idx += 1
        if has_res:
            res_ref = refs[idx]; idx += 1
        _blockact_gemm_kernel(refs[0], refs[1], refs[2], refs[3], bias_ref,
                              gate_ref, res_ref, refs[idx], refs[idx + 1],
                              n_k=n_k, act=act, has_bias=has_bias)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)


def int8_linear_prequant(xq, row_scale, p, act: Optional[str] = None,
                         gate=None, residual=None):
    """Postscale W8A8 linear over a pre-quantized activation (xq int8 with
    (…,1) fp32 row scales) — used when the producer kernel already emitted
    int8 (e.g. the fused SLA unfold). gate/residual fuse the transformer
    `residual + out * gate` into the GEMM epilogue (batch-1 gates)."""
    shape = xq.shape
    b = p.get("b")
    N = p["w_int8"].shape[1]
    res2 = None if residual is None else residual.reshape(-1, N)
    y = int8_gemm_postscale_pallas(
        xq.reshape(-1, shape[-1]), row_scale.reshape(-1, 1),
        p["w_int8"], p["scale"], bias=b, act=act, has_bias=b is not None,
        out_dtype=jnp.bfloat16, gate=gate, residual=res2)
    return y.reshape(*shape[:-1], N)


def int8_linear_postscale(x, w_int8, col_scale, bias=None,
                          act: Optional[str] = None,
                          gate=None, residual=None):
    """y = act((rowquant(x) @ w_int8) * row_scale * col_scale + bias)
    [* gate] [+ residual]. Pallas fused-epilogue GEMM on TPU; XLA dot
    elsewhere (gate/residual applied unfused there)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    N = w_int8.shape[1]
    if jax.default_backend() == "tpu" and x2.shape[-1] % 128 == 0:
        xq, row_scale = quantize_rows_int8_pallas(x2)
        res2 = None if residual is None else residual.reshape(-1, N)
        y = int8_gemm_postscale_pallas(
            xq, row_scale, w_int8, col_scale,
            bias=bias, act=act, has_bias=bias is not None, out_dtype=x.dtype,
            gate=gate, residual=res2)
        return y.reshape(*shape[:-1], N)
    xq, row_scale = quantize_rows_int8(x2)
    acc = jax.lax.dot_general(xq, w_int8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * row_scale * col_scale[None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if act == "gelu_tanh":
        y = jax.nn.gelu(y, approximate=True)
    y = y.reshape(*shape[:-1], N).astype(x.dtype)
    if gate is not None:
        y = y * gate.reshape((1,) * (y.ndim - 1) + (-1,)).astype(y.dtype)
    if residual is not None:
        y = y + residual
    return y


# ---------------------------------------------------------------------------
# Blockwise GEMM — jnp reference + Pallas TPU kernel
# ---------------------------------------------------------------------------

def int8_block_matmul_ref(xq, xs, wq, ws, block: int = QBLOCK):
    """fp32 reference of the per-K-block-rescaled GEMM
    (ops/gemm/kernel.hpp:417-419). xq (M,K) int8, xs (Mb,Kb); wq (K,N) int8,
    ws (Kb,Nb). Returns fp32 (M, N)."""
    M, K = xq.shape
    N = wq.shape[1]
    Kb = _cdiv(K, block)
    Kp = Kb * block
    xqp = jnp.pad(xq, ((0, 0), (0, Kp - K))).astype(jnp.float32)
    wqp = jnp.pad(wq, ((0, Kp - K), (0, 0))).astype(jnp.float32)
    xqb = xqp.reshape(M, Kb, block)
    wqb = wqp.reshape(Kb, block, N)
    # per-K-block partial products, scaled then summed
    part = jnp.einsum("mbk,bkn->bmn", xqb, wqb)               # (Kb, M, N)
    sx = jnp.repeat(xs, block, axis=0)[:M]                    # (M, Kb)
    sw = jnp.repeat(ws, block, axis=1)[:, :N]                 # (Kb, N)
    scaled = part * sx.T[:, :, None] * sw[:, None, :]
    return jnp.sum(scaled, axis=0)


def _gemm_kernel(xq_ref, wq_ref, xs_ref, ws_ref, bias_ref, o_ref, acc_scr,
                 *, n_k: int, out_dtype):
    m, n, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    prod = jax.lax.dot_general(xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    # scale rows live in SMEM as full (1, 1, Kb)/(1, Kb, Nb) blocks — per-tile
    # (1,1) BlockSpecs violate Mosaic's lane tiling
    acc_scr[...] += prod.astype(jnp.float32) * (xs_ref[0, 0, k] * ws_ref[0, k, n])

    @pl.when(k == n_k - 1)
    def _():
        out = acc_scr[...]
        if bias_ref is not None:
            out = out + bias_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret", "has_bias"))
def _int8_block_matmul_pallas(xq, xs, wq, ws, bias, block: int = QBLOCK,
                              has_bias: bool = True, interpret: bool = False):
    M, K = xq.shape
    N = wq.shape[1]
    Mb, Kb, Nb = _cdiv(M, block), _cdiv(K, block), _cdiv(N, block)
    xqp = jnp.pad(xq, ((0, Mb * block - M), (0, Kb * block - K)))
    wqp = jnp.pad(wq, ((0, Kb * block - K), (0, Nb * block - N)))

    in_specs = [
        pl.BlockSpec((block, block), lambda m, n, k: (m, k)),
        pl.BlockSpec((block, block), lambda m, n, k: (k, n)),
        pl.BlockSpec((1, 1, Kb), lambda m, n, k: (m, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, Kb, Nb), lambda m, n, k: (0, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [xqp, wqp, xs.reshape(Mb, 1, Kb), ws.reshape(1, Kb, Nb)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, block), lambda m, n, k: (0, n)))
        bp = jnp.pad(bias.astype(jnp.float32), (0, Nb * block - N))
        args.append(bp.reshape(1, -1))

        def kernel(xq_ref, wq_ref, xs_ref, ws_ref, bias_ref, o_ref, acc_scr):
            _gemm_kernel(xq_ref, wq_ref, xs_ref, ws_ref, bias_ref, o_ref,
                         acc_scr, n_k=Kb, out_dtype=jnp.float32)
    else:
        def kernel(xq_ref, wq_ref, xs_ref, ws_ref, o_ref, acc_scr):
            _gemm_kernel(xq_ref, wq_ref, xs_ref, ws_ref, None, o_ref, acc_scr,
                         n_k=Kb, out_dtype=jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(Mb, Nb, Kb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, block), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mb * block, Nb * block), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, block), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out[:M, :N]


def int8_linear_block(x, w_int8, scale, bias=None, block: int = QBLOCK):
    """Dynamic-activation-quant W8A8 linear with blockwise scales
    (≡ Int8Linear.forward, ops/core.py:405-412)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    xq, xs = quantize_activation_block(x2, block)
    xq = xq[:x2.shape[0], :x2.shape[1]]
    if jax.default_backend() == "tpu":
        y = _int8_block_matmul_pallas(xq, xs, w_int8, scale,
                                      bias if bias is not None else None,
                                      block=block, has_bias=bias is not None)
    else:
        y = int8_block_matmul_ref(xq, xs, w_int8, scale, block)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
    return y.reshape(*shape[:-1], w_int8.shape[1]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Dispatch + param converters
# ---------------------------------------------------------------------------

def linear_maybe_quant(p, x, act: Optional[str] = None, gate=None,
                       residual=None):
    """Apply a linear whose params may be float, block-quant, or postscale.
    act="gelu_tanh" fuses the activation into the GEMM epilogue on the
    postscale path (a standalone gelu over the FFN hidden is a ~1.2GB HBM
    round trip at 480p). gate/residual fuse `residual + y * gate` (the
    AdaLN-gated transformer residual) into the epilogue on that path."""
    def finish(y):
        if gate is not None:
            y = y * gate.astype(y.dtype)
        if residual is not None:
            y = y + residual
        return y

    if "w" in p:
        y = jnp.matmul(x, p["w"].astype(x.dtype))
        if p.get("b") is not None:
            y = y + p["b"].astype(y.dtype)
        return finish(jax.nn.gelu(y, approximate=True)
                      if act == "gelu_tanh" else y)
    b = p.get("b")
    if p["scale"].ndim == 1:
        fuse_ok = gate is None or (gate.ndim >= 2 and gate.shape[0] == 1)
        if fuse_ok:
            g = None if gate is None else gate.reshape(-1)
            return int8_linear_postscale(x, p["w_int8"], p["scale"], bias=b,
                                         act=act, gate=g, residual=residual)
        return finish(int8_linear_postscale(x, p["w_int8"], p["scale"],
                                            bias=b, act=act))
    y = int8_linear_block(x, p["w_int8"], p["scale"], bias=b)
    return finish(jax.nn.gelu(y, approximate=True)
                  if act == "gelu_tanh" else y)


def fuse_linear_params(parts):
    """Concatenate postscale-quantized (or float) linears sharing one input
    into a single wide linear (≡ TileLang QKV fusion,
    tilelang_w8a8.py:229-258). Works on scan-stacked params."""
    first = parts[0]
    if "w" in first:
        out = {"w": jnp.concatenate([p["w"] for p in parts], axis=-1)}
        if first.get("b") is not None:
            out["b"] = jnp.concatenate([p["b"] for p in parts], axis=-1)
        return out
    assert first["scale"].ndim in (1, 2), "fusion needs postscale layout"
    out = {"w_int8": jnp.concatenate([p["w_int8"] for p in parts], axis=-1),
           "scale": jnp.concatenate([p["scale"] for p in parts], axis=-1)}
    if first.get("b") is not None:
        out["b"] = jnp.concatenate([p["b"] for p in parts], axis=-1)
    return out


def quantize_wan_blocks(blocks, mode: str = "block", fuse_qkv: bool = True):
    """Quantize every Linear inside the transformer blocks, skipping the SLA
    `proj_l` compensation projection — mirrors replace_linear_norm's
    skip_layer='proj_l' rule (inference/modify_model.py:56-81).

    fuse_qkv (postscale mode): self-attention Q/K/V collapse into one wide
    GEMM sharing a single activation quantization; the model reads the
    fused output via BlockSpec column offsets (zero-copy split)."""
    out = jax.tree.map(lambda x: x, blocks)  # shallow copy
    for attn in ("self_attn", "cross_attn"):
        for name in ("q", "k", "v", "o", "k_img", "v_img"):
            if name in out[attn]:
                out[attn][name] = quantize_linear_params(out[attn][name], mode)
    if fuse_qkv and mode == "postscale":
        sa = out["self_attn"]
        sa["qkv"] = fuse_linear_params([sa.pop("q"), sa.pop("k"),
                                        sa.pop("v")])
    for name in ("fc1", "fc2"):
        out["ffn"][name] = quantize_linear_params(out["ffn"][name], mode)
    return out


def quantize_linear_params(p, mode: str = "block"):
    """Convert {'w','b'} float linear params to a quantized layout
    (≡ Int8Linear.from_linear, ops/core.py:414-432)."""
    if "w" not in p:
        return p
    if mode == "postscale":
        q, s = quantize_int8_postscale(p["w"])
    else:
        q, s = quantize_int8_block(p["w"])
    out = {"w_int8": q, "scale": s}
    if p.get("b") is not None:
        out["b"] = p["b"]
    return out
