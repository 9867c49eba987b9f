"""Probe a redesigned sparse blockscale kernel: single-pass (whole topk set
resident; no online softmax), cross-program double-buffered gather, and a
TRANSPOSED V panel so the P@V contraction also runs in the fast lane-dim
MXU form (the (1,),(0,) sublane form measured slow in probe_sparse_bottleneck).

Variants:
  sp_kv_bf16 — single-pass, packed K|V rows (one DMA/block), PV slow form
  sp_vt_bf16 — single-pass, K panel + V^T panel (two DMAs/block), PV fast form
  sp_vt_i8   — same + int8 P (static 127 scale)

Usage: PYTHONPATH=... python scripts_dev/probe_sparse_v2.py [L]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from turbodiffusion_tpu.ops.flash_pallas import _row_get, _lut_ring, _cdiv  # noqa: E402

B, H, D = 1, 12, 128
BQ, BK = 256, 256
L = int(sys.argv[1]) if len(sys.argv) > 1 else 32760
SEL = 12
N_ITERS = 30


def make_kernel(variant, n_lut_lanes):
    TILE = SEL * BK

    def kernel(lut_hbm, q_ref, qs_ref, k_hbm, vt_hbm, ksc_ref, vch_ref,
               o_ref, kbuf, vtbuf, sems, lut2_ref, lut_sem, acc_unused):
        bh, i = pl.program_id(0), pl.program_id(1)
        nQ = pl.num_programs(1)
        total = pl.num_programs(0) * nQ
        step = bh * nQ + i
        slot = jax.lax.rem(step, 2)

        def kv_dmas(dst_slot, lut_slot):
            ds = []
            for t in range(SEL):
                kb = _row_get(lut2_ref.at[lut_slot], t)
                start = pl.multiple_of(kb * BK, BK)
                ds.append(pltpu.make_async_copy(
                    k_hbm.at[bh, pl.ds(start, BK)],
                    kbuf.at[dst_slot, pl.ds(t * BK, BK)],
                    sems.at[0, dst_slot]))
                ds.append(pltpu.make_async_copy(
                    vt_hbm.at[bh, kb],
                    vtbuf.at[dst_slot, :, pl.ds(t * BK, BK)],
                    sems.at[1, dst_slot]))
            return ds

        @pl.when(step == 0)
        def _boot():
            # LUT 0 -> slot 0 (waited inline), LUT 1 -> slot 1, then KV 0
            pltpu.make_async_copy(lut_hbm.at[0, 0], lut2_ref.at[0],
                                  lut_sem.at[0]).start()
            pltpu.make_async_copy(lut_hbm.at[0, 1], lut2_ref.at[1],
                                  lut_sem.at[1]).start()
            pltpu.make_async_copy(lut_hbm.at[0, 0], lut2_ref.at[0],
                                  lut_sem.at[0]).wait()
            for d in kv_dmas(0, 0):
                d.start()

        # wait this step's KV panels
        for t in range(SEL):
            pltpu.make_async_copy(
                k_hbm.at[bh, pl.ds(0, BK)],
                kbuf.at[slot, pl.ds(t * BK, BK)], sems.at[0, slot]).wait()
            pltpu.make_async_copy(
                vt_hbm.at[bh, 0],
                vtbuf.at[slot, :, pl.ds(0, BK)], sems.at[1, slot]).wait()

        # extract this step's scale/mask rows from lut slot BEFORE it can
        # be overwritten by the step+2 LUT prefetch
        iota_bk = jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1)
        sc_parts, mk_parts = [], []
        for t in range(SEL):
            kb = _row_get(lut2_ref.at[slot], t)
            sc_parts.append(jnp.full((1, BK), ksc_ref[0, 0, kb],
                                     jnp.float32))
            mk_parts.append((iota_bk + kb * BK < L).astype(jnp.float32))
        krow = jnp.concatenate(sc_parts, axis=1)
        mrow = jnp.concatenate(mk_parts, axis=1)

        # launch next program's LUT wait + KV issue + next-next LUT start
        @pl.when(step + 1 < total)
        def _issue_next():
            nxt = step + 1
            pltpu.make_async_copy(lut_hbm.at[nxt // nQ, jax.lax.rem(nxt, nQ)],
                                  lut2_ref.at[1 - slot],
                                  lut_sem.at[1 - slot]).wait()
            for d in kv_dmas(1 - slot, 1 - slot):
                d.start()

        @pl.when(step + 2 < total)
        def _start_lut2():
            nx2 = step + 2
            pltpu.make_async_copy(lut_hbm.at[nx2 // nQ, jax.lax.rem(nx2, nQ)],
                                  lut2_ref.at[slot], lut_sem.at[slot]).start()

        qq = q_ref[0]
        qsc = qs_ref[0]
        k = kbuf[slot]                    # (TILE, D) int8
        s32 = jax.lax.dot_general(qq, k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * qsc * krow
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m) * mrow
        l = jnp.sum(p, axis=-1, keepdims=True)
        vt = vtbuf[slot]                  # (D, TILE) int8
        if variant == "sp_vt_i8":
            pi = (p * 127.0 + 0.5).astype(jnp.int8)
            pv = jax.lax.dot_general(pi, vt, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            o = pv.astype(jnp.float32) / jnp.maximum(l * 127.0, 1e-20)
        else:
            pv = jax.lax.dot_general(p.astype(jnp.bfloat16),
                                     vt.astype(jnp.bfloat16),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o = pv / jnp.maximum(l, 1e-20)
        o_ref[0] = (o * vch_ref[0]).astype(o_ref.dtype)

    return kernel


def run_variant(variant, qi, qs, kp, vtp, ksc, vch, lut_flat, lut_row, Lp):
    BH = B * H
    nQ = Lp // BQ
    TILE = SEL * BK
    q_spec = pl.BlockSpec((1, BQ, D), lambda bh, i: (bh, i, 0))
    f = pl.pallas_call(
        make_kernel(variant, lut_row[-1]),
        grid=(BH, nQ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # LUT
            q_spec,
            pl.BlockSpec((1, BQ, 1), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),                  # K panel
            pl.BlockSpec(memory_space=pl.ANY),                  # VT panel
            pl.BlockSpec((1, 1, ksc.shape[2]), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Lp, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, TILE, D), jnp.int8),                 # K slots
            pltpu.VMEM((2, D, TILE), jnp.int8),                 # VT slots
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SMEM((2, *lut_row), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((BQ, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )

    @jax.jit
    def loop(qi, qs, kp, vtp, ksc, vch, lut_flat):
        def body(i, c):
            qs2 = qs + (c * 1e-30)
            o = f(lut_flat, qi, qs2, kp, vtp, ksc, vch)
            return c + o[0, 0, 0].astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))

    float(loop(qi, qs, kp, vtp, ksc, vch, lut_flat))
    t0 = time.perf_counter()
    float(loop(qi, qs, kp, vtp, ksc, vch, lut_flat))
    dt = (time.perf_counter() - t0) / N_ITERS * 1000
    print(f"{variant:10s}: {dt:8.3f} ms/call ({dt * 120:7.1f} ms / 4-step)")


def main():
    print(f"device: {jax.devices()[0].device_kind}  L={L} SEL={SEL} "
          f"single-pass")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    Lp = -(-L // 512) * 512
    BH = B * H
    nQ, nK = Lp // BQ, Lp // BK
    qi = jax.random.randint(ks[0], (BH, Lp, D), -127, 127, jnp.int8)
    qs = jnp.abs(jax.random.normal(ks[1], (BH, Lp, 1), jnp.float32)) * .01
    kp = jax.random.randint(ks[2], (BH, Lp, D), -127, 127, jnp.int8)
    vtp = jax.random.randint(ks[2], (BH, Lp // BK, D, BK), -127, 127,
                             jnp.int8)
    ksc = jnp.abs(jax.random.normal(ks[3], (BH, 1, nK), jnp.float32)) * .01
    vch = jnp.ones((BH, 1, D), jnp.float32)
    lut = jax.random.randint(ks[0], (BH, nQ, SEL), 0, nK, jnp.int32)
    sel_pad = _cdiv(SEL, 128) * 128
    lut_flat = jnp.pad(lut, ((0, 0), (0, 0), (0, sel_pad - SEL)))
    lut_flat, lut_row = _lut_ring(lut_flat)

    for variant in ("sp_vt_bf16", "sp_vt_i8"):
        run_variant(variant, qi, qs, kp, vtp, ksc, vch, lut_flat, lut_row,
                    Lp)


if __name__ == "__main__":
    main()
