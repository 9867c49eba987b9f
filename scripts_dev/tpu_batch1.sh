#!/bin/bash
# Validation batch to run when the TPU tunnel recovers.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
echo "=== 1. cross_attention_qout compile+run at headline geometry ==="
timeout 1200 python -u - <<'PY'
import os
os.makedirs('/root/.jax_cache', exist_ok=True)
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
from turbodiffusion_tpu.ops.flash_pallas import cross_attention_qout
from turbodiffusion_tpu.utils.timing import measure_best
ks = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(ks[0], (1, 32760, 12, 128), jnp.bfloat16)
k = jax.random.normal(ks[1], (1, 512, 12, 128), jnp.bfloat16)
v = jax.random.normal(ks[2], (1, 512, 12, 128), jnp.bfloat16)
f = jax.jit(lambda q, k, v: cross_attention_qout(q, k, v))
i8, sc = f(q, k, v)
import numpy as np
print('finite scales:', bool(np.isfinite(np.asarray(jax.device_get(sc[0, :5, 0]))).all()))
dt = measure_best(f, q, k, v, n=3, iters=4)
print(f'cross_attention_qout L=32760: {dt*1e3:.2f} ms/layer')
PY
echo "=== 2. headline bench (fast) ==="
TDX_BENCH_FAST=1 timeout 2400 python -u bench.py
echo "=== 3. 14B single-chip drive ==="
timeout 3000 python -u scripts_dev/drive_14b_singlechip.py 4 --frames 81 || timeout 3000 python -u scripts_dev/drive_14b_singlechip.py 4 --frames 73
