"""Fused Winograd F(2x2, 3x3) convolution for the Wan VAE (VERDICT r2 #2).

The 480p/81f decode is ~274 TFLOP of 3x3(x kt) convs — compute-bound at
bf16 on one v5e (197 TF/s peak => 1.4 s speed-of-light), and XLA's direct
conv runs the hot stages at only 24-40% MXU (scripts_dev/probe_conv_stage).
F(2x2, 3x3) cuts MXU multiplies 2.25x and turns each conv into clean
transform-domain GEMMs whose K folds the temporal taps (K = kt*C).

TPU-first design notes:
  * The kernel operates on a "quad" (space-to-depth) layout
    (4, B*T, H/2+1, W/2+1, C): quad q = 2*(h%2) + (w%2) of the 1-padded
    frame. Every Winograd position slice P[a][b] then becomes an OUTER-dim
    index (q) plus 0/1 row/col offsets — no sublane deinterleaves, which
    Mosaic has no fast path for.
  * Inputs are OVERLAP-TILED once per conv by an XLA gather into
    (4, BT2, nH, TH2+1, nW, TW2+1, C) — the +1 halo row/col is baked into
    the array (~1.14x inflation), so the kernel does NO staging, NO halo
    strips and NO VPU copies: every P[a][b] is a direct slice of the
    input block. (The v1/v2 kernels staged main+halo tiles into a VMEM
    scratch each step; that staging plus the in-kernel norm dominated the
    runtime — measured 11-18% wino-GEMM efficiency.)
  * Pre-op norm+SiLU (the ResidualBlock's RMSNorm, wan2pt1.py:180-215)
    runs as its own bandwidth-bound Pallas pass on the quads
    (conv_pallas.norm_silu_pallas) — norm(0)=0 keeps the zero border
    exact, so normalizing after the pad/relayout is identical.
  * U never touches HBM: unfused Winograd inflates the input 4x (16 tile
    positions per 2x2 output tile) — materializing U for the 96ch 480x832
    stage would be 3+ GB per conv. Here U lives in a (M, kt*C) VMEM scratch
    per position.
  * The Winograd row index i is the INNERMOST grid dim with an fp32
    Y-accumulator scratch: one row position per program keeps the Mosaic
    VMEM stack small (the fully-unrolled 16-dot body measured 17-20M of
    stack against the 16M limit) and shrinks the resident weight block 4x.
  * The input transform is factored (row combos R[i] shared by the 4 col
    positions) in bf16 on the VPU; the inverse transform exploits At's
    sparsity (9 of 16 positions per output sub-plane).
  * Bias + residual ride the epilogue at i==3.

Numerics: transforms are exact +/-1 sums done on bf16 inputs (VPU
upcasts internally), the GEMM is bf16 x bf16 -> fp32, matching the direct
conv's precision to ~bf16 roundoff (tested vs conv3x3_fused_ref).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2, 3x3): y = At @ [(G g Gt) * (Bt d B)] @ A
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [.5, .5, .5],
               [.5, -.5, .5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def wino_weights(w):
    """(kt, 3, 3, C, O) torch-tap layout -> (16, kt*C, O) transformed,
    position-major, temporal-fold on K."""
    kt, kh, kw, C, O = w.shape
    assert (kh, kw) == (3, 3)
    g = w.astype(jnp.float32)
    # GgGt over the spatial taps: (kt, 4, 4, C, O)
    t = jnp.einsum("ia,tabco->tibco", jnp.asarray(_G), g)
    t = jnp.einsum("jb,tibco->tijco", jnp.asarray(_G), t)
    # (i, j, kt, C, O) -> (16, kt*C, O)
    t = jnp.transpose(t, (1, 2, 0, 3, 4)).reshape(16, kt * C, O)
    return t


def to_quad(x):
    """(B, T, H, W, C) -> 1-padded quads (4, B*T, H/2+1, W/2+1, C).
    Quad q = 2*(h%2) + (w%2) over the padded frame; the 2x2 output tile at
    (th, tw) reads padded rows 2th..2th+3 = quad rows th, th+1."""
    B, T, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(B * T, (H + 2) // 2, 2, (W + 2) // 2, 2, C)
    return jnp.transpose(xp, (2, 4, 0, 1, 3, 5)).reshape(
        4, B * T, (H + 2) // 2, (W + 2) // 2, C)


def from_quad(yq, B: int):
    """(4, B*T, H2, W2, O) -> (B, T, 2*H2, 2*W2, O)."""
    _, BT, H2, W2, O = yq.shape
    y = yq.reshape(2, 2, BT, H2, W2, O)
    y = jnp.transpose(y, (2, 3, 0, 4, 1, 5))
    return y.reshape(B, BT // B, 2 * H2, 2 * W2, O)


def _norm_silu(x, gamma, cdim: int):
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    y = xf / jnp.maximum(norm, 1e-12) * (cdim ** 0.5) * gamma
    return y * jax.nn.sigmoid(y)


def _kernel(*refs, kt: int, TH2: int, TW2: int, C: int, BO: int,
            has_res: bool, out_dtype):
    """Grid (o, t, h, w, i). tiles[dt]: one overlap-tiled quad block
    (4, 1, 1, TH2+1, 1, TW2+1, C) per temporal tap — P[a][b] slices it
    directly. Each i runs the 4 column-position GEMMs of ONE Winograd row
    and accumulates the At-sparse inverse into y_ref; i==3 adds
    bias/residual and writes out."""
    it = iter(refs)
    tiles = [next(it) for _ in range(kt)]
    w_ref = next(it)                         # (4, kt*C, BO) — rows of i
    b_ref = next(it)                         # (1, BO)
    res_ref = next(it) if has_res else None  # (4, 1, TH2, TW2, BO)
    o_ref = next(it)                         # (4, 1, TH2, TW2, BO)
    u_ref = next(it)                         # scratch (TH2*TW2, kt*C) bf16
    y_ref = next(it)                         # scratch (4, TH2*TW2, BO) f32

    i = pl.program_id(4)
    M = TH2 * TW2

    @pl.when(i == 0)
    def _zero():
        y_ref[...] = jnp.zeros_like(y_ref)

    def P(dt, a, b):
        # padded-pixel (2th+a, 2tw+b) = quad (2*(a%2)+(b%2), th+a//2,
        # tw+b//2)
        return tiles[dt][2 * (a % 2) + (b % 2), 0, 0,
                         a // 2:a // 2 + TH2, 0, b // 2:b // 2 + TW2]

    for iv in range(4):
        @pl.when(i == iv)
        def _row(iv=iv):
            # row transform for this i only (Bt rows have two +/-1
            # entries): R[dt][b] = sum_a Bt[iv,a] * P[dt][a][b]
            R = []
            for dt in range(kt):
                if iv == 0:
                    R.append([P(dt, 0, b) - P(dt, 2, b) for b in range(4)])
                elif iv == 1:
                    R.append([P(dt, 1, b) + P(dt, 2, b) for b in range(4)])
                elif iv == 2:
                    R.append([P(dt, 2, b) - P(dt, 1, b) for b in range(4)])
                else:
                    R.append([P(dt, 1, b) - P(dt, 3, b) for b in range(4)])
            for j in range(4):
                for dt in range(kt):
                    Rd = R[dt]
                    # col transform: U[i][j] = sum_b Bt[j,b] * R[b]
                    if j == 0:
                        u = Rd[0] - Rd[2]
                    elif j == 1:
                        u = Rd[1] + Rd[2]
                    elif j == 2:
                        u = Rd[2] - Rd[1]
                    else:
                        u = Rd[1] - Rd[3]
                    u_ref[:, dt * C:(dt + 1) * C] = u.reshape(M, C)
                s = jax.lax.dot(u_ref[...], w_ref[j],
                                preferred_element_type=jnp.float32)
                # inverse via At sparsity: Y[a,b] += At[a,iv]At[b,j]*S
                for a in range(2):
                    ca = _AT[a, iv]
                    if ca == 0:
                        continue
                    for b2 in range(2):
                        cb = _AT[b2, j]
                        if cb == 0:
                            continue
                        qi = 2 * a + b2
                        y_ref[qi] += s if ca * cb > 0 else -s

    @pl.when(i == 3)
    def _emit():
        bias = b_ref[0].astype(jnp.float32)[None, :]
        for qi in range(4):
            y = (y_ref[qi] + bias).reshape(TH2, TW2, BO)
            if has_res:
                y = y + res_ref[qi, 0].astype(jnp.float32)
            o_ref[qi, 0] = y.astype(out_dtype)


def _tile_candidates(n: int, lo: int, hi: int):
    """Divisor-preferred tile sizes for an axis of length n, in [lo, hi],
    largest first; non-divisors allowed (the caller pads)."""
    cands = [d for d in range(hi, lo - 1, -1) if n % d == 0]
    return cands or [hi]


def _pick_tiles(kt: int, H2: int, W2: int, C: int, O: int):
    """(TH2, TW2, BO) targeting M = TH2*TW2 ~ 1k GEMM rows under a ~8.5MB
    VMEM liveness model (16MB physical; Mosaic's measured stack ran
    ~1.6x a naive model on the staged v2 kernel; v3 has no staging)."""
    if O <= 128:
        BO = O
    else:
        # BO must divide O (grid dim o covers O in BO blocks); decoder
        # widths are 96/192/384
        BO = next(c for c in (128, 96, 64, 32, 16, 8) if O % c == 0)
    BOp = max(BO, 128)

    def cost(TH2, TW2):
        M = TH2 * TW2
        tiles = kt * 4 * (TH2 + 1) * (TW2 + 1) * C * 2 * 2  # 2-buf
        rvals = 4 * kt * M * C * 2                      # R planes (one i)
        u = M * kt * C * 2
        wts = 2 * 4 * kt * C * BO * 2
        yv = (4 + 1) * M * BOp * 4
        outb = 2 * 4 * M * BOp * 2 * 2
        return tiles + rvals + u + wts + yv + outb

    best = None
    for TW2 in _tile_candidates(W2, min(W2, 32), min(W2, 144)):
        for TH2 in (16, 8, 4, 2, 1):
            if TH2 > H2:
                continue
            if cost(TH2, TW2) > 8_500_000:
                continue
            M = TH2 * TW2
            # prefer larger M; tie-break toward squarer tiles (fewer
            # overlap-halo bytes)
            key = (min(M, 2048), -abs(TH2 * 8 - TW2))
            if best is None or key > best[0]:
                best = (key, TH2, TW2)
            break
    if best is None:
        return 1, min(W2, 32), BO
    return best[1], best[2], BO


@functools.partial(jax.jit, static_argnames=("pre", "interpret", "out_dtype",
                                             "tiles"))
def wino_conv_q(xq, w, b, gamma=None, residual_q=None, pre: str = "none",
                out_dtype=None, tiles=None, interpret: bool = False):
    """Winograd conv on quads.

    xq: (4, BT2, H2p, W2p, C) from to_quad (1-padded), temporally extended
        (BT2 = B*(T_out + kt - 1));
    w:  (kt, 3, 3, C, O) tap-layout weights (transformed in here);
    residual_q: (4, B*T_out, H2, W2, O) added in the epilogue;
    pre="norm_silu": channel-RMSNorm+SiLU applied to xq first (separate
        bandwidth-bound pass; identical to pre-norm before the conv);
    tiles: optional (TH2, TW2) override;
    returns (4, B*T_out, H2, W2, O), H2 = H2p - 1.
    """
    Q, BT2, H2p, W2p, C = xq.shape
    kt, _, _, _, O = w.shape
    BT = BT2 - (kt - 1)  # treat batch folded into frames (B=1 semantics
    # for dt offsets; callers with B>1 pass per-sample)
    H2, W2 = H2p - 1, W2p - 1
    out_dtype = out_dtype or xq.dtype

    if pre == "norm_silu":
        from turbodiffusion_tpu.ops.conv_pallas import norm_silu_pallas
        xq = norm_silu_pallas(xq, gamma.reshape(-1), interpret=interpret)

    TH2, TW2, BO = _pick_tiles(kt, H2, W2, C, O)
    if tiles:
        TH2, TW2 = tiles
    nH = -(-H2 // TH2)
    nW = -(-W2 // TW2)
    nO = O // BO
    # pad so the last overlap row/col (nH*TH2, nW*TW2) exists
    padH = max(0, nH * TH2 + 1 - H2p)
    padW = max(0, nW * TW2 + 1 - W2p)
    if padH or padW:
        xq = jnp.pad(xq, ((0, 0), (0, 0), (0, padH), (0, padW), (0, 0)))

    # overlap-tile rows and cols (one XLA gather; ~(TH2+1)(TW2+1)/(TH2*TW2)
    # inflation): (4, BT2, nH, TH2+1, nW, TW2+1, C)
    ridx = jnp.arange(nH)[:, None] * TH2 + jnp.arange(TH2 + 1)[None, :]
    cidx = jnp.arange(nW)[:, None] * TW2 + jnp.arange(TW2 + 1)[None, :]
    xq_t = xq[:, :, ridx][:, :, :, :, cidx]

    wt = wino_weights(w).astype(jnp.bfloat16)

    grid = (nO, BT, nH, nW, 4)
    in_specs = []
    args = []
    for dt in range(kt):
        in_specs.append(pl.BlockSpec(
            (4, 1, 1, TH2 + 1, 1, TW2 + 1, C),
            lambda o, t, h, w_, i, dt=dt: (0, t + dt, h, 0, w_, 0, 0)))
        args.append(xq_t)
    in_specs.append(pl.BlockSpec((4, kt * C, BO),
                                 lambda o, t, h, w_, i: (i, 0, o)))
    args.append(wt)
    in_specs.append(pl.BlockSpec((1, BO), lambda o, t, h, w_, i: (0, o)))
    args.append(b.reshape(1, O))
    has_res = residual_q is not None
    if has_res:
        in_specs.append(pl.BlockSpec(
            (4, 1, TH2, TW2, BO), lambda o, t, h, w_, i: (0, t, h, w_, o)))
        args.append(jnp.pad(residual_q,
                            ((0, 0), (0, 0), (0, nH * TH2 - H2),
                             (0, nW * TW2 - W2), (0, 0))))

    out = pl.pallas_call(
        functools.partial(_kernel, kt=kt, TH2=TH2, TW2=TW2, C=C, BO=BO,
                          has_res=has_res, out_dtype=out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (4, 1, TH2, TW2, BO), lambda o, t, h, w_, i: (0, t, h, w_, o)),
        out_shape=jax.ShapeDtypeStruct((4, BT, nH * TH2, nW * TW2, O),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((TH2 * TW2, kt * C), jnp.bfloat16),
            pltpu.VMEM((4, TH2 * TW2, BO), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "parallel",
                                 "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out[:, :, :H2, :W2]


def wino_conv(x, w, b, gamma=None, residual=None, pre: str = "none",
              out_dtype=None, interpret: bool = False):
    """Standard-layout wrapper: x (B, T2, H, W, C) temporally extended ->
    (B, T_out, H, W, O). Quad relayout on both ends (XLA transposes)."""
    B, T2, H, W, C = x.shape
    kt = w.shape[0]
    xq = to_quad(x)
    rq = None
    if residual is not None:
        # residual is (B, T_out, H, W, O): quad WITHOUT padding
        Br, Tr, Hr, Wr, Or = residual.shape
        r = residual.reshape(Br * Tr, Hr // 2, 2, Wr // 2, 2, Or)
        rq = jnp.transpose(r, (2, 4, 0, 1, 3, 5)).reshape(
            4, Br * Tr, Hr // 2, Wr // 2, Or)
    yq = wino_conv_q(xq, w, b, gamma=gamma, residual_q=rq, pre=pre,
                     out_dtype=out_dtype, interpret=interpret)
    return from_quad(yq, B)
