#!/bin/bash
# Cheap kernel-level isolations for the 9-frame Internal error.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
echo "=== A. modulated_layer_norm standalone at L=14040 ==="
timeout 600 python -u - <<'PY'
import os
os.makedirs('/root/.jax_cache', exist_ok=True)
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
import jax.numpy as jnp, numpy as np
from turbodiffusion_tpu.ops.fused_norm import modulated_layer_norm
x = jax.random.normal(jax.random.PRNGKey(0), (1, 14040, 1536), jnp.bfloat16)
ms = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1536), jnp.float32)
mb = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1536), jnp.float32)
f = jax.jit(lambda x, ms, mb: jnp.sum(modulated_layer_norm(x, ms, mb).astype(jnp.float32)**2))
print('mln ok', float(jax.device_get(f(x, ms, mb))), flush=True)
PY
echo "=== B. cross-attn one-pass at Lq=14040 ==="
timeout 600 python -u - <<'PY'
import os
os.makedirs('/root/.jax_cache', exist_ok=True)
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
import jax.numpy as jnp
from turbodiffusion_tpu.ops.flash_pallas import flash_attention
ks = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(ks[0], (1, 14040, 12, 128), jnp.bfloat16)
k = jax.random.normal(ks[1], (1, 512, 12, 128), jnp.bfloat16)
v = jax.random.normal(ks[2], (1, 512, 12, 128), jnp.bfloat16)
f = jax.jit(lambda q, k, v: jnp.sum(flash_attention(q, k, v).astype(jnp.float32)**2))
print('onepass ok', float(jax.device_get(f(q, k, v))), flush=True)
PY
echo "=== C. rmsnorm_rope at L=14040 ==="
timeout 600 python -u - <<'PY'
import os
os.makedirs('/root/.jax_cache', exist_ok=True)
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
import jax.numpy as jnp
from turbodiffusion_tpu.ops.fused_norm import rmsnorm_rope, rope_cos_sin_full
from turbodiffusion_tpu.models.rope import rope_freqs_3d
x = jax.random.normal(jax.random.PRNGKey(0), (1, 14040, 1536), jnp.bfloat16)
w = jnp.ones((1536,), jnp.bfloat16)
cos, sin = rope_cos_sin_full(rope_freqs_3d(9, 30, 52, 128))
f = jax.jit(lambda x, w: jnp.sum(rmsnorm_rope(x, w, cos, sin, num_heads=12).astype(jnp.float32)**2))
print('rmsrope ok', float(jax.device_get(f(x, w))), flush=True)
PY
# (stage D, the 9f repro, lived in /tmp/scm_iso5.py — superseded by
# scripts_dev/measure_jvp_81f.py 33)
