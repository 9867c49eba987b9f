"""High-level generation pipelines (T2V / I2V).

Mirrors the reference inference scripts' behavior
(inference/wan2.1_t2v_infer.py, inference/wan2.2_i2v_infer.py) and the serve
module's resident-model pipeline (serve/pipeline.py), rebuilt around jitted
JAX functions:

  * the whole num_steps sampling loop + DiT forwards compile to ONE XLA
    program per (shape, steps) signature;
  * models stay resident as device arrays; the I2V two-expert "swap" is
    static step->expert selection at trace time (the RF boundary schedule is
    known statically), not CPU offload (wan2.2_i2v_infer.py:187-197).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from turbodiffusion_tpu.config import (
    AttentionConfig, GenerationConfig, VIDEO_RES_SIZE_INFO, WanConfig,
    wan_config)
from turbodiffusion_tpu.models.umt5 import (
    UMT5Config, init_umt5_params, tokenize, umt5_embed_padded)
from turbodiffusion_tpu.models.vae import (
    VAEConfig, init_vae_params, vae_decode, vae_encode)
from turbodiffusion_tpu.models.wan import init_wan_params, wan_forward
from turbodiffusion_tpu.ops.quant import quantize_wan_blocks
from turbodiffusion_tpu.pipelines.sampler import rcm_timesteps
from turbodiffusion_tpu.utils.checkpoint import (
    load_torch_state_dict, strip_prefix, umt5_params_from_state_dict,
    vae_params_from_state_dict, wan_params_from_state_dict)


def make_wan_cfg(model: str, attention_type: str = "sagesla",
                 sla_topk: float = 0.1, quant_linear: bool = False,
                 sla_block: int = 256,
                 v_quant: str = "channel") -> WanConfig:
    """Build a WanConfig from the reference CLI flag surface
    (wan2.1_t2v_infer.py:35-55). sla_block: sparse map granularity — 256 is
    the TPU fast default (measured 1.9x vs 128 at equal coverage); use
    64/128 for parity with reference-trained SLA maps
    (SLA/kernel.py:247-248). v_quant: INT8 V granularity (config.py)."""
    backend = attention_type if attention_type in ("sla", "sagesla") else "dense"
    blk = 8 if model == "test" else sla_block
    # Q gather blocks run 2x the K selection granularity at the TPU fast
    # setting: the single-pass VT kernel's gather is HBM-bound and block_q
    # only sets the Q-side pooling of the block map (selection coverage is
    # unchanged; merged-pool equivalence + full-coverage tests in
    # tests/test_sla_fused.py). Parity modes (64/128) keep block_q == blk.
    bq = min(2 * blk, 512) if blk >= 256 else blk
    attn = AttentionConfig(backend=backend, sla_topk=sla_topk,
                           block_q=bq, block_k=blk, v_quant=v_quant)
    if model == "test":
        from turbodiffusion_tpu.config import wan_test_config
        return wan_test_config(attention=attn, quant_linear=quant_linear)
    return wan_config(model, attention=attn, quant_linear=quant_linear)


def load_dit(dit_path: Optional[str], cfg: WanConfig, seed: int = 0):
    """create_model analog (modify_model.py:130-141): load + optionally
    quantize. dit_path=None -> random weights (checkpoint-free smoke runs).

    Returns (params, cfg): cfg gains the sparse-only fast path when every
    proj_l is exactly zero (≡ TURBOT2AV_SLA_SKIP_ZERO_LINEAR,
    acceleration.py:249-380)."""
    import dataclasses as _dc
    import numpy as _np
    if dit_path is None:
        params = init_wan_params(jax.random.PRNGKey(seed), cfg)
    else:
        sd = strip_prefix(load_torch_state_dict(dit_path))
        params = wan_params_from_state_dict(sd, cfg)
    sa = params["blocks"]["self_attn"]
    if cfg.quant_linear:
        # QKV fusion buys one shared activation quantization but costs a
        # (L, 3*dim) bf16 intermediate — ~1 GB at dim 5120/480p, which is
        # exactly the HBM margin when a 14B int8 model (13.9 GiB weights)
        # runs on ONE 16 GB chip. Fuse only when the dim is small enough.
        fuse = cfg.dim < 4096
        if "qkv" not in sa and "w_int8" not in sa["q"]:
            params["blocks"] = quantize_wan_blocks(params["blocks"],
                                                   mode="postscale",
                                                   fuse_qkv=fuse)
        elif (fuse and "qkv" not in sa and "w_int8" in sa["q"]
              and sa["q"]["scale"].ndim == 1):
            # pre-quantized (checkpoint) postscale linears: fuse QKV at load
            from turbodiffusion_tpu.ops.quant import fuse_linear_params
            sa["qkv"] = fuse_linear_params([sa.pop("q"), sa.pop("k"),
                                            sa.pop("v")])
    proj_l = params["blocks"]["self_attn"].get("proj_l")
    if proj_l is not None and cfg.attention.backend in ("sla", "sagesla"):
        zero = (float(_np.abs(_np.asarray(proj_l["w"])).max()) == 0.0 and
                float(_np.abs(_np.asarray(proj_l["b"])).max()) == 0.0)
        if zero:
            cfg = cfg.replace(attention=_dc.replace(
                cfg.attention, linear_branch=False))
    return params, cfg


class TextEncoder:
    """umT5 embedding service (get_umt5_embedding, rcm/utils/umt5.py:524).
    Load lazily, free explicitly (clear_umt5_memory analog)."""

    def __init__(self, checkpoint_path: Optional[str], text_len: int = 512,
                 cfg: Optional[UMT5Config] = None):
        self.cfg = cfg if cfg is not None else UMT5Config(text_len=text_len)
        self.checkpoint_path = checkpoint_path
        self.params = None

    def load(self):
        if self.params is None:
            if self.checkpoint_path is None:
                self.params = init_umt5_params(jax.random.PRNGKey(7), self.cfg)
            else:
                sd = load_torch_state_dict(self.checkpoint_path)
                self.params = umt5_params_from_state_dict(
                    sd, self.cfg.num_layers)
        return self

    def __call__(self, prompts) -> jnp.ndarray:
        self.load()
        try:
            ids, mask = tokenize(prompts, self.cfg.text_len)
        except Exception as e:
            # Hash-tokenizer fallback: deterministic ids for checkpoint-free
            # smoke runs. On a REAL run (umT5 weights loaded) this would be a
            # silent quality disaster, so it is loud and opt-in there.
            import logging
            import os
            real_weights = self.checkpoint_path is not None
            if real_weights and os.environ.get(
                    "TDX_ALLOW_HASH_TOKENIZER") != "1":
                raise RuntimeError(
                    "umT5 tokenizer unavailable but real encoder weights are "
                    "loaded — refusing the hash-tokenizer fallback (set "
                    "TDX_ALLOW_HASH_TOKENIZER=1 to force)") from e
            logging.getLogger(__name__).warning(
                "umT5 tokenizer unavailable (%s); using the HASH tokenizer "
                "fallback — embeddings are NOT meaningful text encodings", e)
            if isinstance(prompts, str):
                prompts = [prompts]
            ids = np.zeros((len(prompts), self.cfg.text_len), np.int32)
            mask = np.zeros_like(ids)
            for b, p in enumerate(prompts):
                toks = [hash(w) % self.cfg.vocab_size for w in p.split()][
                    : self.cfg.text_len]
                ids[b, :len(toks)] = toks
                mask[b, :len(toks)] = 1
            ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        return umt5_embed_padded(self.params, ids, mask, self.cfg)

    def free(self):
        self.params = None


@dataclass(eq=False)
class WanPipeline:
    """Resident T2V/I2V pipeline (serve/pipeline.py analog).

    Multi-chip: pass a MeshConfig to `create` — DiT parameters are
    FSDP-sharded over the 'fsdp' axis, the token sequence over 'context'
    (flattened CP + Ulysses inside the model), and samples over 'data'.
    This is how Wan2.1-14B / Wan2.2-A14B (28/56 GB bf16) run at all: the
    reference offloads experts to host RAM instead
    (wan2.2_i2v_infer.py:91-94,187-197); on TPU both experts stay resident,
    sharded across the slice."""

    cfg: WanConfig
    params: Any
    vae_params: Any
    text_encoder: TextEncoder
    params_low: Any = None      # I2V low-noise expert (Wan2.2 two-expert)
    vae_cfg: VAEConfig = VAEConfig()
    mesh: Any = None

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, model: str = "Wan2.1-1.3B", dit_path: Optional[str] = None,
               low_noise_path: Optional[str] = None,
               vae_path: Optional[str] = None,
               text_encoder_path: Optional[str] = None,
               attention_type: str = "sagesla", sla_topk: float = 0.1,
               quant_linear: bool = False, seed: int = 0,
               mesh_config=None, sla_block: int = 256,
               v_quant: str = "channel"):
        cfg = make_wan_cfg(model, attention_type, sla_topk, quant_linear,
                           sla_block=sla_block, v_quant=v_quant)
        params, cfg = load_dit(dit_path, cfg, seed)
        params_low = (load_dit(low_noise_path, cfg, seed + 1)[0]
                      if (low_noise_path is not None or
                          cfg.model_type == "i2v") else None)
        if vae_path is None:
            vae_params = init_vae_params(jax.random.PRNGKey(3), VAEConfig())
        else:
            vae_params = vae_params_from_state_dict(
                load_torch_state_dict(vae_path))
        if model == "test":
            from turbodiffusion_tpu.models.umt5 import umt5_test_config
            from turbodiffusion_tpu.models.vae import VAEConfig as _VC
            import jax.numpy as _jnp
            te = TextEncoder(text_encoder_path, cfg=umt5_test_config(
                dim=cfg.text_dim, text_len=cfg.text_len))
            vae_params = init_vae_params(jax.random.PRNGKey(3),
                                         _VC(dim=16, dtype=_jnp.float32))
        else:
            te = TextEncoder(text_encoder_path)

        mesh = None
        if mesh_config is not None:
            from turbodiffusion_tpu.parallel.sharding import (
                make_mesh, shard_params)
            from jax.sharding import NamedSharding, PartitionSpec as P
            mesh = make_mesh(mesh_config)
            params = shard_params(params, mesh)
            if params_low is not None:
                params_low = shard_params(params_low, mesh)
            # VAE is small — replicate
            rep = NamedSharding(mesh, P())
            vae_params = jax.tree.map(
                lambda x: jax.device_put(x, rep), vae_params)
        return cls(cfg=cfg, params=params, vae_params=vae_params,
                   text_encoder=te, params_low=params_low, mesh=mesh)

    def _mesh_scope(self):
        from turbodiffusion_tpu.parallel.sharding import use_mesh
        return use_mesh(self.mesh)

    # ------------------------------------------------------------------
    def _denoise_latents(self, params_per_step, x, text_emb, t_steps, key,
                         ode: bool, y=None, collect: bool = False):
        """Shared sampling loop; params_per_step[i] picks the expert.
        collect=True additionally returns the latent after every step
        (parity harness, scripts/parity.py)."""
        cfg = self.cfg
        steps = []
        for i in range(len(t_steps) - 1):
            t_cur, t_next = t_steps[i], t_steps[i + 1]
            tt = jnp.full((x.shape[0], 1), t_cur * 1000.0, jnp.float32)
            v = wan_forward(params_per_step[i], cfg, x, tt, text_emb,
                            y_B_C_T_H_W=y).astype(jnp.float32)
            if ode:
                x = x - (t_cur - t_next) * v
            else:
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, x.shape, jnp.float32)
                x = (1.0 - t_next) * (x - t_cur * v) + t_next * noise
            if collect:
                steps.append(x)
        return (x, steps) if collect else x

    @functools.partial(jax.jit, static_argnames=("self", "num_steps",
                                                 "sigma_max", "ode"))
    def _t2v_jit(self, params, vae_params, text_emb, noise, key,
                 num_steps: int, sigma_max: float, ode: bool):
        t_steps = rcm_timesteps(num_steps, sigma_max)
        x = noise * t_steps[0]
        x = self._denoise_latents([params] * num_steps, x, text_emb,
                                  t_steps, key, ode)
        chunk = 4 if (x.shape[2] - 1) % 4 == 0 else 1
        video = vae_decode(vae_params, x, chunk=chunk)
        return (1.0 + jnp.clip(video, -1.0, 1.0)) / 2.0

    def generate_t2v(self, prompt: str, gen: GenerationConfig = GenerationConfig(),
                     text_emb=None) -> np.ndarray:
        """T2V generation (wan2.1_t2v_infer.py:76-152). Returns
        (B, 3, T, H, W) float in [0, 1]."""
        w, h = VIDEO_RES_SIZE_INFO[gen.resolution][gen.aspect_ratio]
        if text_emb is None:
            text_emb = self.text_encoder(prompt)
        text_emb = jnp.repeat(text_emb.astype(self.cfg.dtype),
                              gen.num_samples, axis=0)
        key = jax.random.PRNGKey(gen.seed)
        kn, ks = jax.random.split(key)
        noise = jax.random.normal(
            kn, (gen.num_samples, 16, 1 + (gen.num_frames - 1) // 4,
                 h // 8, w // 8), jnp.float32)
        with self._mesh_scope():
            video = self._t2v_jit(self.params, self.vae_params, text_emb,
                                  noise, ks, gen.num_steps, gen.sigma_max,
                                  gen.ode)
        return np.asarray(video)

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "num_steps",
                                                 "sigma_max", "ode",
                                                 "boundary"))
    def _i2v_jit(self, params_hi, params_lo, vae_params, text_emb, y, noise,
                 key, num_steps: int, sigma_max: float, ode: bool,
                 boundary: float):
        t_steps = rcm_timesteps(num_steps, sigma_max)
        # static expert schedule: high-noise while t_cur >= boundary
        # (wan2.2_i2v_infer.py:187-197)
        pps = [params_hi if t_steps[i] >= boundary else params_lo
               for i in range(num_steps)]
        x = noise * t_steps[0]
        x = self._denoise_latents(pps, x, text_emb, t_steps, key, ode, y=y)
        chunk = 4 if (x.shape[2] - 1) % 4 == 0 else 1
        video = vae_decode(vae_params, x, chunk=chunk)
        return (1.0 + jnp.clip(video, -1.0, 1.0)) / 2.0

    def generate_i2v(self, prompt: str, image_chw: np.ndarray,
                     gen: GenerationConfig = GenerationConfig(
                         sigma_max=200.0, resolution="720p"),
                     adaptive_resolution: bool = False,
                     text_emb=None) -> np.ndarray:
        """I2V generation (wan2.2_i2v_infer.py:85-210). image_chw: (3, H, W)
        in [-1, 1]."""
        if adaptive_resolution:
            bw, bh = VIDEO_RES_SIZE_INFO[gen.resolution][gen.aspect_ratio]
            area = bw * bh
            ih, iw = image_chw.shape[1:]
            ar = ih / iw
            stride = 16
            lat_h = round(float(np.sqrt(area * ar)) / stride)
            lat_w = round(float(np.sqrt(area / ar)) / stride)
            h, w = lat_h * stride, lat_w * stride
        else:
            w, h = VIDEO_RES_SIZE_INFO[gen.resolution][gen.aspect_ratio]
        if image_chw.shape[1:] != (h, w):
            from turbodiffusion_tpu.utils.video_io import load_image
            # resize via PIL round trip
            from PIL import Image
            img01 = np.transpose((image_chw + 1) / 2, (1, 2, 0))
            pil = Image.fromarray((np.clip(img01, 0, 1) * 255).astype(np.uint8))
            pil = pil.resize((w, h), Image.LANCZOS)
            image_chw = np.transpose(
                np.asarray(pil, np.float32) / 255.0 * 2 - 1, (2, 0, 1))

        F = gen.num_frames
        lat_t, lat_h, lat_w = 1 + (F - 1) // 4, h // 8, w // 8

        # encode [image, zeros x (F-1)] (wan2.2_i2v_infer.py:141-147)
        frames = np.zeros((1, 3, F, h, w), np.float32)
        frames[:, :, 0] = image_chw
        latents = vae_encode(self.vae_params, jnp.asarray(frames))
        msk = jnp.zeros((1, 4, lat_t, lat_h, lat_w), jnp.float32)
        msk = msk.at[:, :, 0].set(1.0)
        y = jnp.concatenate([msk, latents.astype(jnp.float32)], axis=1)
        y = jnp.repeat(y, gen.num_samples, axis=0).astype(self.cfg.dtype)

        if text_emb is None:
            text_emb = self.text_encoder(prompt)
        text_emb = jnp.repeat(text_emb.astype(self.cfg.dtype),
                              gen.num_samples, axis=0)
        key = jax.random.PRNGKey(gen.seed)
        kn, ks = jax.random.split(key)
        noise = jax.random.normal(
            kn, (gen.num_samples, 16, lat_t, lat_h, lat_w), jnp.float32)
        params_lo = self.params_low if self.params_low is not None else self.params
        with self._mesh_scope():
            video = self._i2v_jit(self.params, params_lo, self.vae_params,
                                  text_emb, y, noise, ks, gen.num_steps,
                                  gen.sigma_max, gen.ode, gen.boundary)
        return np.asarray(video)
