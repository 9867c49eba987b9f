"""Split the sparse blockscale kernel into DMA-only / compute-only variants
to locate the bottleneck at the headline geometry (L=32760, topk 0.1).

Variants:
  full     — the real kernel (gather + int8 QK + softmax + PV)
  nodma    — identical compute on whatever is resident in kvbuf (no gather)
  dmaonly  — the gather ring only, trivial compute touching the buffers
  nosoftmax— gather + both matmuls, softmax replaced by a plain scale

Usage: PYTHONPATH=... python scripts_dev/probe_sparse_bottleneck.py
"""

import functools
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
BQ = 256
BK = int(os.environ.get('PROBE_BK', 256))
L = int(sys.argv[1]) if len(sys.argv) > 1 else 32760
SEL = int(os.environ.get('PROBE_SEL', 12))
NBUF = 4
GROUP = int(os.environ.get('PROBE_GROUP', 6))
N_ITERS = 30


def make_kernel(variant):
    n_groups = _cdiv(SEL, GROUP)

    def kernel(lut_hbm, q_ref, qs_ref, kv_hbm, ksc_ref, vch_ref, o_ref,
               kvbuf, sems, lut2_ref, lut_sem, acc_scr):
        tile_k = GROUP * BK
        bh, i = pl.program_id(0), pl.program_id(1)
        nQ = pl.num_programs(1)
        step = bh * nQ + i
        slot_now = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _first_lut():
            pltpu.make_async_copy(lut_hbm.at[0, 0], lut2_ref.at[0],
                                  lut_sem.at[0]).start()

        @pl.when(step + 1 < pl.num_programs(0) * nQ)
        def _next_lut():
            nxt = step + 1
            pltpu.make_async_copy(
                lut_hbm.at[nxt // nQ, jax.lax.rem(nxt, nQ)],
                lut2_ref.at[1 - slot_now], lut_sem.at[1 - slot_now]).start()

        pltpu.make_async_copy(lut_hbm.at[bh, i], lut2_ref.at[slot_now],
                              lut_sem.at[slot_now]).wait()
        lut_ref = lut2_ref.at[slot_now]

        def kv_dmas(slot, g):
            ds = []
            for t in range(GROUP):
                kb = _row_get(lut_ref, g * GROUP + t)
                start = pl.multiple_of(kb * BK, BK)
                ds.append(pltpu.make_async_copy(
                    kv_hbm.at[bh, pl.ds(start, BK)],
                    kvbuf.at[slot, pl.ds(t * BK, BK)],
                    sems.at[0, slot]))
            return ds

        do_dma = variant != "nodma"
        if do_dma:
            for gg in range(NBUF - 1):
                @pl.when(gg < n_groups)
                def _start(gg=gg):
                    for d in kv_dmas(gg, gg):
                        d.start()

        m = jnp.full((BQ, 1), -1e30, jnp.float32)
        l = jnp.zeros((BQ, 1), jnp.float32)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        qq = q_ref[0]
        qsc = qs_ref[0]
        iota_bk = jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1)

        def body(g, carry):
            m, l = carry
            slot = jax.lax.rem(g, NBUF)
            if do_dma:
                @pl.when(g + NBUF - 1 < n_groups)
                def _prefetch():
                    for d in kv_dmas(jax.lax.rem(g + NBUF - 1, NBUF),
                                     g + NBUF - 1):
                        d.start()
                for d in kv_dmas(slot, g):
                    d.wait()
            k = kvbuf[slot, :, :D]
            v = kvbuf[slot, :, D:]

            if variant == "dmaonly":
                acc_scr[...] = acc_scr[...] + k[:BQ].astype(jnp.float32) \
                    + v[:BQ].astype(jnp.float32)
                return m, l + 1.0

            if variant == "pvonly":
                p = (kvbuf[slot, :BQ, :D].astype(jnp.float32)
                     * qsc).astype(jnp.bfloat16)
                pw = jnp.pad(p, ((0, 0), (0, GROUP * BK - D)))
                acc_scr[...] = acc_scr[...] + jax.lax.dot(
                    pw, v.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
                return m, l + 1.0
            s32 = jax.lax.dot_general(qq, k, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            if variant == "qkonly":
                acc_scr[...] = acc_scr[...] + \
                    s32[:, :D].astype(jnp.float32) * qsc
                return m, l + 1.0
            if variant == "nosoftmax":
                p = (s32.astype(jnp.float32) * qsc).astype(jnp.bfloat16)
                acc_scr[...] = acc_scr[...] + jax.lax.dot(
                    p, v.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
                return m, l + 1.0
            if variant == "nosoftmax_pvi8":
                p = (s32.astype(jnp.float32) * qsc + 0.5).astype(jnp.int8)
                pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.int32)
                acc_scr[...] = acc_scr[...] + pv.astype(jnp.float32)
                return m, l + 1.0
            if variant == "nosoftmax_noquant":
                p = (s32.astype(jnp.float32) * qsc).astype(jnp.int8)
                pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.int32)
                acc_scr[...] = acc_scr[...] + pv.astype(jnp.float32)
                return m, l + 1.0

            sc_parts, mk_parts = [], []
            for t in range(GROUP):
                kb = _row_get(lut_ref, g * GROUP + t)
                sc_parts.append(jnp.full((1, BK), ksc_ref[0, 0, kb],
                                         jnp.float32))
                live = jnp.logical_and(g * GROUP + t < SEL,
                                       iota_bk + kb * BK < L)
                mk_parts.append(live.astype(jnp.float32))
            krow = jnp.concatenate(sc_parts, axis=1)
            mrow = jnp.concatenate(mk_parts, axis=1)
            s = s32.astype(jnp.float32) * qsc * krow
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new) * mrow
            l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
                p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            return m_new, l_new

        m, l = jax.lax.fori_loop(0, n_groups, body, (m, l))
        o_ref[0] = ((acc_scr[...] / jnp.maximum(l, 1e-20)) * vch_ref[0]
                    ).astype(o_ref.dtype)

    return kernel


def run_variant(variant, qi, qs, kvi, ksc, vch, lut_flat, lut_row, Lp):
    BH = B * H
    nQ = Lp // BQ
    q_spec = pl.BlockSpec((1, BQ, D), lambda bh, i: (bh, i, 0))
    f = pl.pallas_call(
        make_kernel(variant),
        grid=(BH, nQ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            q_spec,
            pl.BlockSpec((1, BQ, 1), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, ksc.shape[2]), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, D), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Lp, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((NBUF, GROUP * BK, 2 * D), jnp.int8),
            pltpu.SemaphoreType.DMA((2, NBUF)),
            pltpu.SMEM((2, *lut_row), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((BQ, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    @jax.jit
    def loop(qi, qs, kvi, ksc, vch, lut_flat):
        def body(i, c):
            qs2 = qs + (c * 1e-30)
            o = f(lut_flat, qi, qs2, kvi, ksc, vch)
            return c + o[0, 0, 0].astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))

    float(loop(qi, qs, kvi, ksc, vch, lut_flat))
    t0 = time.perf_counter()
    float(loop(qi, qs, kvi, ksc, vch, lut_flat))
    dt = (time.perf_counter() - t0) / N_ITERS * 1000
    print(f"{variant:10s}: {dt:8.3f} ms/call ({dt * 120:7.1f} ms / 4-step)")


def main():
    print(f"device: {jax.devices()[0].device_kind}  L={L} SEL={SEL}")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    Lp = -(-L // 512) * 512
    BH = B * H
    nQ, nK = Lp // BQ, Lp // BK
    qi = jax.random.randint(ks[0], (BH, Lp, D), -127, 127, jnp.int8)
    qs = jnp.abs(jax.random.normal(ks[1], (BH, Lp, 1), jnp.float32)) * .01
    kvi = jax.random.randint(ks[2], (BH, Lp + BK, 2 * D), -127, 127,
                             jnp.int8)
    ksc = jnp.abs(jax.random.normal(ks[3], (BH, 1, nK), jnp.float32)) * .01
    vch = jnp.ones((BH, 1, D), jnp.float32)
    lut = jax.random.randint(ks[0], (BH, nQ, SEL), 0, nK, jnp.int32)
    n_groups = _cdiv(SEL, GROUP)
    sel_pad = _cdiv(n_groups * GROUP, 128) * 128
    lut_flat = jnp.pad(lut, ((0, 0), (0, 0), (0, sel_pad - SEL)))
    lut_flat, lut_row = _lut_ring(lut_flat)

    for variant in ("full", "qkonly", "pvonly", "nosoftmax", "nosoftmax_pvi8", "nosoftmax_noquant"):
        run_variant(variant, qi, qs, kvi, ksc, vch, lut_flat, lut_row, Lp)


if __name__ == "__main__":
    main()
