"""Checkpoint import/export: reference torch checkpoints <-> JAX pytrees.

Covers the reference's checkpoint surface:
  * plain .pth state dicts for the DiT (inference checkpoints; rcm/utils/
    model_utils.load_state_dict), including `net.` / `net_ema.` prefixes
    (turbodiffusion/scripts/dcp_to_pth.py:36-46)
  * quantized Int8Linear buffers `int8_weight` + `scale` (ops/core.py:400-403)
  * SLA `proj_l` weights living at self_attn.attn_op.local_attn.proj_l
    (inference/modify_model.py:49-52)
  * Wan VAE .pth (rcm/tokenizers/wan2pt1.py:584-597)
  * umT5 encoder .pth (rcm/utils/umt5.py:469-477)
  * safetensors shards (turbodiffusion/scripts/safetensors_to_pth.py)
  * task-arithmetic model merging (turbodiffusion/scripts/merge_models.py:6-60)

Torch linear weights (out, in) are transposed to JAX (in, out); conv weights
keep torch OIDHW/OIHW layout (models/vae.py consumes them directly).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from turbodiffusion_tpu.config import WanConfig


# ---------------------------------------------------------------------------
# Raw loading
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt/.safetensors file into numpy arrays (CPU torch)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            v = v.to(torch.float32).numpy() if v.dtype == torch.bfloat16 \
                else v.numpy()
        out[k] = np.asarray(v)
    return out


def strip_prefix(sd: Dict[str, Any], prefix: str = "net.") -> Dict[str, Any]:
    """Drop a training-wrapper prefix; prefer `net_ema.` keys when both exist
    (dcp_to_pth.py extracts EMA weights :36-46)."""
    ema = {k[len("net_ema."):]: v for k, v in sd.items()
           if k.startswith("net_ema.")}
    if ema:
        return ema
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out if out else dict(sd)


# ---------------------------------------------------------------------------
# Wan DiT import
# ---------------------------------------------------------------------------

def _lin(sd, name, dtype, transpose=True):
    """Read a Linear (float or Int8Linear layout) into our param dict."""
    if f"{name}.int8_weight" in sd:
        p = {
            "w_int8": jnp.asarray(sd[f"{name}.int8_weight"]).T,   # (in, out)
            "scale": jnp.asarray(sd[f"{name}.scale"], jnp.float32).T,
        }
        if f"{name}.bias" in sd:
            p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
        return p
    w = jnp.asarray(sd[f"{name}.weight"], dtype)
    p = {"w": w.T if transpose else w}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def wan_params_from_state_dict(sd: Dict[str, np.ndarray], cfg: WanConfig):
    """Build the models/wan.py params pytree from a reference WanModel state
    dict (rcm/networks/wan2pt1.py naming)."""
    dtype = cfg.dtype
    f32 = jnp.float32

    def norm_scale(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype)}

    def attn(prefix, has_img=False, want_proj_l=False, rope_permute=False):
        p = {
            "q": _lin(sd, f"{prefix}.q", dtype),
            "k": _lin(sd, f"{prefix}.k", dtype),
            "v": _lin(sd, f"{prefix}.v", dtype),
            "o": _lin(sd, f"{prefix}.o", dtype),
            "norm_q": norm_scale(f"{prefix}.norm_q"),
            "norm_k": norm_scale(f"{prefix}.norm_k"),
        }
        if rope_permute:
            # Self-attention Q/K get RoPE: convert the reference's
            # interleaved channel order to rotate-half order (see
            # models/rope.py). Scores are invariant; the exporter inverts.
            from turbodiffusion_tpu.models.rope import (
                permute_qk_linear, rope_channel_permutation)
            perm = rope_channel_permutation(cfg.head_dim, cfg.num_heads)
            p["q"] = permute_qk_linear(p["q"], cfg.head_dim, cfg.num_heads)
            p["k"] = permute_qk_linear(p["k"], cfg.head_dim, cfg.num_heads)
            p["norm_q"] = {"scale": p["norm_q"]["scale"][perm]}
            p["norm_k"] = {"scale": p["norm_k"]["scale"][perm]}
        if has_img:
            p["k_img"] = _lin(sd, f"{prefix}.k_img", dtype)
            p["v_img"] = _lin(sd, f"{prefix}.v_img", dtype)
            p["norm_k_img"] = norm_scale(f"{prefix}.norm_k_img")
        if want_proj_l:
            # SLA checkpoints: self_attn.attn_op.local_attn.proj_l
            # (modify_model.py:49-52); fp32 zero-init (SLA/core.py:57,78-81)
            pl_name = f"{prefix}.attn_op.local_attn.proj_l"
            if f"{pl_name}.weight" in sd:
                p["proj_l"] = {
                    "w": jnp.asarray(sd[f"{pl_name}.weight"], f32).T,
                    "b": jnp.asarray(sd[f"{pl_name}.bias"], f32),
                }
            else:
                dh = cfg.head_dim
                p["proj_l"] = {"w": jnp.zeros((dh, dh), f32),
                               "b": jnp.zeros((dh,), f32)}
        return p

    use_sla = cfg.attention.backend in ("sla", "sagesla")
    has_img = cfg.arch == "wan2.1" and cfg.model_type in ("i2v", "flf2v")

    def one_block(i):
        pre = f"blocks.{i}"
        blk = {
            "self_attn": attn(f"{pre}.self_attn", want_proj_l=use_sla,
                              rope_permute=True),
            "cross_attn": attn(f"{pre}.cross_attn", has_img=has_img),
            "ffn": {"fc1": _lin(sd, f"{pre}.ffn.0", dtype),
                    "fc2": _lin(sd, f"{pre}.ffn.2", dtype)},
            "modulation": jnp.asarray(sd[f"{pre}.modulation"], dtype
                                      ).reshape(6, cfg.dim),
        }
        if cfg.cross_attn_norm:
            blk["norm3"] = {
                "scale": jnp.asarray(sd[f"{pre}.norm3.weight"], dtype),
                "bias": jnp.asarray(sd[f"{pre}.norm3.bias"], dtype),
            }
        return blk

    blocks = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[one_block(i) for i in range(cfg.num_layers)])

    # patch_embedding may be stored as Conv3d (D, C, kt, kh, kw) in HF shards
    # (safetensors_to_pth.py:40-43) or already flattened Linear (D, Din).
    pe_w = np.asarray(sd["patch_embedding.weight"])
    pe_w = pe_w.reshape(pe_w.shape[0], -1)
    params = {
        "patch_embedding": {"w": jnp.asarray(pe_w, dtype).T,
                            "b": jnp.asarray(sd["patch_embedding.bias"], dtype)},
        "text_embedding": {"fc1": _lin(sd, "text_embedding.0", dtype),
                           "fc2": _lin(sd, "text_embedding.2", dtype)},
        "time_embedding": {"fc1": _lin(sd, "time_embedding.0", f32),
                           "fc2": _lin(sd, "time_embedding.2", f32)},
        "time_projection": {"fc": _lin(sd, "time_projection.1", f32)},
        "blocks": blocks,
        "head": {
            "head": _lin(sd, "head.head", f32),
            "modulation": jnp.asarray(sd["head.modulation"], f32
                                      ).reshape(2, cfg.dim),
        },
    }
    if has_img and "img_emb.proj.0.weight" in sd:
        params["img_emb"] = {
            "norm1": {"scale": jnp.asarray(sd["img_emb.proj.0.weight"], dtype),
                      "bias": jnp.asarray(sd["img_emb.proj.0.bias"], dtype)},
            "fc1": _lin(sd, "img_emb.proj.1", dtype),
            "fc2": _lin(sd, "img_emb.proj.3", dtype),
            "norm2": {"scale": jnp.asarray(sd["img_emb.proj.4.weight"], dtype),
                      "bias": jnp.asarray(sd["img_emb.proj.4.bias"], dtype)},
        }
        if "img_emb.emb_pos" in sd:     # flf2v (wan2pt1.py:469)
            params["img_emb"]["emb_pos"] = jnp.asarray(
                sd["img_emb.emb_pos"], dtype)
    return params


# ---------------------------------------------------------------------------
# Wan VAE import
# ---------------------------------------------------------------------------

def _conv(sd, name, dtype):
    return {"w": jnp.asarray(sd[f"{name}.weight"], dtype),
            "b": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _res_from_sd(sd, pre, dtype):
    p = {
        "norm1": {"gamma": jnp.asarray(sd[f"{pre}.residual.0.gamma"], dtype)},
        "conv1": _conv(sd, f"{pre}.residual.2", dtype),
        "norm2": {"gamma": jnp.asarray(sd[f"{pre}.residual.3.gamma"], dtype)},
        "conv2": _conv(sd, f"{pre}.residual.6", dtype),
    }
    p["shortcut"] = (_conv(sd, f"{pre}.shortcut", dtype)
                     if f"{pre}.shortcut.weight" in sd else None)
    return p


def _attn_from_sd(sd, pre, dtype):
    return {
        "norm": {"gamma": jnp.asarray(sd[f"{pre}.norm.gamma"], dtype)},
        "to_qkv": _conv(sd, f"{pre}.to_qkv", dtype),
        "proj": _conv(sd, f"{pre}.proj", dtype),
    }


def vae_params_from_state_dict(sd: Dict[str, np.ndarray],
                               dtype=jnp.bfloat16):
    """Build models/vae.py params from a Wan2.1_VAE.pth state dict
    (rcm/tokenizers/wan2pt1.py module tree)."""
    from turbodiffusion_tpu.models.vae import VAEConfig
    cfg = VAEConfig()

    def stack(side: str):
        layers = []
        i = 0
        prefix = f"{side}.{'downsamples' if side == 'encoder' else 'upsamples'}"
        while f"{prefix}.{i}.residual.0.gamma" in sd or \
                f"{prefix}.{i}.resample.1.weight" in sd or \
                f"{prefix}.{i}.time_conv.weight" in sd:
            pre = f"{prefix}.{i}"
            if f"{pre}.residual.0.gamma" in sd:
                layers.append(_res_from_sd(sd, pre, dtype))
            else:
                layer = {"conv": _conv(sd, f"{pre}.resample.1", dtype)}
                if f"{pre}.time_conv.weight" in sd:
                    layer["time_conv"] = _conv(sd, f"{pre}.time_conv", dtype)
                layers.append(layer)
            i += 1
        return layers

    def middle(side):
        return [_res_from_sd(sd, f"{side}.middle.0", dtype),
                _attn_from_sd(sd, f"{side}.middle.1", dtype),
                _res_from_sd(sd, f"{side}.middle.2", dtype)]

    return {
        "encoder": {
            "conv1": _conv(sd, "encoder.conv1", dtype),
            "downsamples": stack("encoder"),
            "middle": middle("encoder"),
            "head_norm": {"gamma": jnp.asarray(sd["encoder.head.0.gamma"], dtype)},
            "head_conv": _conv(sd, "encoder.head.2", dtype),
        },
        "decoder": {
            "conv1": _conv(sd, "decoder.conv1", dtype),
            "middle": middle("decoder"),
            "upsamples": stack("decoder"),
            "head_norm": {"gamma": jnp.asarray(sd["decoder.head.0.gamma"], dtype)},
            "head_conv": _conv(sd, "decoder.head.2", dtype),
        },
        "conv1": _conv(sd, "conv1", dtype),
        "conv2": _conv(sd, "conv2", dtype),
    }


# ---------------------------------------------------------------------------
# umT5 import
# ---------------------------------------------------------------------------

def umt5_params_from_state_dict(sd: Dict[str, np.ndarray],
                                num_layers: int = 24, dtype=jnp.bfloat16):
    """Build models/umt5.py params from models_t5_umt5-xxl-enc-bf16.pth
    (rcm/utils/umt5.py T5Encoder naming)."""
    def one(i):
        pre = f"blocks.{i}"
        return {
            "norm1": {"w": jnp.asarray(sd[f"{pre}.norm1.weight"], dtype)},
            "attn": {c: jnp.asarray(sd[f"{pre}.attn.{c}.weight"], dtype).T
                     for c in ("q", "k", "v", "o")},
            "pos_embedding": jnp.asarray(
                sd[f"{pre}.pos_embedding.embedding.weight"], jnp.float32),
            "norm2": {"w": jnp.asarray(sd[f"{pre}.norm2.weight"], dtype)},
            "ffn": {
                "gate": jnp.asarray(sd[f"{pre}.ffn.gate.0.weight"], dtype).T,
                "fc1": jnp.asarray(sd[f"{pre}.ffn.fc1.weight"], dtype).T,
                "fc2": jnp.asarray(sd[f"{pre}.ffn.fc2.weight"], dtype).T,
            },
        }

    blocks = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[one(i) for i in range(num_layers)])
    return {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"], dtype),
        "blocks": blocks,
        "norm": {"w": jnp.asarray(sd["norm.weight"], dtype)},
    }


# ---------------------------------------------------------------------------
# Wan DiT export (inverse mapping, reference naming)
# ---------------------------------------------------------------------------

def wan_state_dict_from_params(params, cfg: WanConfig) -> Dict[str, np.ndarray]:
    """Export a models/wan.py pytree to a reference-named state dict — the
    interop path back to torch tooling (inverse of wan_params_from_state_dict)."""
    sd: Dict[str, np.ndarray] = {}

    def put_lin(name, p):
        if "w_int8" in p:
            sd[f"{name}.int8_weight"] = np.asarray(p["w_int8"]).T
            sd[f"{name}.scale"] = np.asarray(p["scale"]).T
        else:
            sd[f"{name}.weight"] = np.asarray(p["w"]).T
        if p.get("b") is not None:
            sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_attn(prefix, p, rope_permuted=False):
        p = dict(p)
        if rope_permuted:
            from turbodiffusion_tpu.models.rope import (
                permute_qk_linear, rope_channel_permutation)
            inv = np.argsort(np.asarray(
                rope_channel_permutation(cfg.head_dim, cfg.num_heads)))
            for c in ("q", "k"):
                p[c] = permute_qk_linear(p[c], cfg.head_dim, cfg.num_heads,
                                         inverse=True)
            p["norm_q"] = {"scale": np.asarray(p["norm_q"]["scale"])[inv]}
            p["norm_k"] = {"scale": np.asarray(p["norm_k"]["scale"])[inv]}
        for c in ("q", "k", "v", "o"):
            put_lin(f"{prefix}.{c}", p[c])
        sd[f"{prefix}.norm_q.weight"] = np.asarray(p["norm_q"]["scale"])
        sd[f"{prefix}.norm_k.weight"] = np.asarray(p["norm_k"]["scale"])
        if "k_img" in p:
            put_lin(f"{prefix}.k_img", p["k_img"])
            put_lin(f"{prefix}.v_img", p["v_img"])
            sd[f"{prefix}.norm_k_img.weight"] = np.asarray(
                p["norm_k_img"]["scale"])
        if "proj_l" in p:
            put_lin(f"{prefix}.attn_op.local_attn.proj_l", p["proj_l"])

    put_lin("patch_embedding", params["patch_embedding"])
    put_lin("text_embedding.0", params["text_embedding"]["fc1"])
    put_lin("text_embedding.2", params["text_embedding"]["fc2"])
    put_lin("time_embedding.0", params["time_embedding"]["fc1"])
    put_lin("time_embedding.2", params["time_embedding"]["fc2"])
    put_lin("time_projection.1", params["time_projection"]["fc"])
    for i in range(cfg.num_layers):
        blk = jax.tree.map(lambda x: x[i], params["blocks"])
        pre = f"blocks.{i}"
        put_attn(f"{pre}.self_attn", blk["self_attn"], rope_permuted=True)
        put_attn(f"{pre}.cross_attn", blk["cross_attn"])
        put_lin(f"{pre}.ffn.0", blk["ffn"]["fc1"])
        put_lin(f"{pre}.ffn.2", blk["ffn"]["fc2"])
        sd[f"{pre}.modulation"] = np.asarray(blk["modulation"])[None]
        if "norm3" in blk:
            sd[f"{pre}.norm3.weight"] = np.asarray(blk["norm3"]["scale"])
            sd[f"{pre}.norm3.bias"] = np.asarray(blk["norm3"]["bias"])
    put_lin("head.head", params["head"]["head"])
    sd["head.modulation"] = np.asarray(params["head"]["modulation"])[None]
    if "img_emb" in params:
        ie = params["img_emb"]
        sd["img_emb.proj.0.weight"] = np.asarray(ie["norm1"]["scale"])
        sd["img_emb.proj.0.bias"] = np.asarray(ie["norm1"]["bias"])
        put_lin("img_emb.proj.1", ie["fc1"])
        put_lin("img_emb.proj.3", ie["fc2"])
        sd["img_emb.proj.4.weight"] = np.asarray(ie["norm2"]["scale"])
        sd["img_emb.proj.4.bias"] = np.asarray(ie["norm2"]["bias"])
        if "emb_pos" in ie:             # flf2v
            sd["img_emb.emb_pos"] = np.asarray(ie["emb_pos"])
    return sd


# ---------------------------------------------------------------------------
# Export + merging
# ---------------------------------------------------------------------------

def merge_models(base, diff_target, diff_base, weight: float = 1.0):
    """Task-arithmetic grafting: base + weight * (diff_target - diff_base)
    (turbodiffusion/scripts/merge_models.py:6-60; README.md:584 uses it to
    graft an SLA finetune onto the rCM student)."""
    return jax.tree.map(
        lambda b, t, s: b + weight * (t.astype(b.dtype) - s.astype(b.dtype)),
        base, diff_target, diff_base)


def save_params_npz(params, path: str):
    """Flatten a params pytree to an .npz archive (portable export)."""
    flat = {}

    def walk(p, prefix):
        if isinstance(p, dict):
            for k, v in p.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(p, (list, tuple)):
            for i, v in enumerate(p):
                walk(v, f"{prefix}.{i}")
        elif p is not None:
            flat[prefix] = np.asarray(p)

    walk(params, "")
    np.savez(path, **flat)
