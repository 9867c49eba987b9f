"""Drive SLA training through the public API on the real TPU.

A user-composed finetune: mid-size Wan config (head_dim 128 so the Pallas
kernels engage), make_sla_train_step, a few optimizer steps. Used to verify
the fused sparse backward + differentiable linear branch end-to-end.

Usage: python scripts_dev/drive_sla_train.py [topk]
Env:   TDX_FUSED_BWD=0 to drive the jnp gather/scatter fallback.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from turbodiffusion_tpu.config import AttentionConfig, WanConfig
from turbodiffusion_tpu.models.wan import init_wan_params
from turbodiffusion_tpu.training.train_step import (
    TrainState, make_optimizer, make_sla_train_step)

topk = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3

attn = AttentionConfig(backend="sagesla", sla_topk=topk,
                       block_q=128, block_k=128)
common = dict(dim=768, ffn_dim=2048, num_heads=6, num_layers=2, in_dim=16,
              text_dim=512, text_len=128, dtype=jnp.bfloat16)
cfg_student = WanConfig(attention=attn, **common)
cfg_teacher = WanConfig(attention=AttentionConfig(backend="dense"), **common)

params = init_wan_params(jax.random.PRNGKey(0), cfg_student)
teacher = init_wan_params(jax.random.PRNGKey(1), cfg_teacher)
# zero-init output heads emit zero velocity on both nets -> loss/grads would
# be exactly 0; nudge them (a real finetune starts from trained weights)
params["head"]["head"]["w"] = jnp.full_like(params["head"]["head"]["w"], 0.01)
teacher["head"]["head"]["w"] = jnp.full_like(
    teacher["head"]["head"]["w"], 0.02)

optimizer = make_optimizer(lr=1e-4, grad_clip=1.0)
state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
step = make_sla_train_step(cfg_student, cfg_teacher, teacher, optimizer)

# latent (1,16,5,30,26): 5*15*13 = 975 tokens -> ragged 128-block tail
batch = {
    "latents": jax.random.normal(jax.random.PRNGKey(2), (1, 16, 5, 30, 26),
                                 jnp.float32),
    "t5_text_embeddings": jax.random.normal(
        jax.random.PRNGKey(3), (1, 128, 512), jnp.bfloat16),
}

print(f"backend={jax.default_backend()} fused_bwd="
      f"{os.environ.get('TDX_FUSED_BWD', '1')} topk={topk}")
losses = []
for i in range(4):
    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.PRNGKey(10))  # fixed key
    loss = float(metrics["loss"])
    losses.append(loss)
    print(f"step {i}: loss={loss:.6f}  ({time.perf_counter()-t0:.1f}s)")
    assert np.isfinite(loss), "non-finite loss"

gn = float(jax.tree.reduce(
    lambda a, x: a + jnp.sum(jnp.square(x.astype(jnp.float32))),
    state.params, 0.0) ** 0.5)
assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
print(f"param norm {gn:.3f}; loss {losses[0]:.6f} -> {losses[-1]:.6f} OK")
