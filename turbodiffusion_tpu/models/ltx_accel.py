"""TurboT2AV acceleration layer for the LTX-2 model.

Reference: ltx_distillation/acceleration.py:1139-1196
(apply_turbodiffusion_acceleration) — attention replacement with per-layer
top-k schedules (:441-575), W8A8 quantization scopes (:637-833), QKV/KV
fusion (:836-860), the effective-topk floor max(topk, 1/key_blocks) (:399),
and the AccelerationReport (:40-70).

Here acceleration is config+param transformation, not module monkey-patching:
  * per-layer AttentionConfig list drives ltx_forward's attention dispatch
  * quantization rewrites the param pytree in place (postscale or block)
  * QKV/KV fusion concatenates projection weights into to_qkv / to_kv leaves
    (ltx_attention consumes them when present, attention.py:186-196)
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from turbodiffusion_tpu.config import AttentionConfig
from turbodiffusion_tpu.models.ltx import LTXConfig
from turbodiffusion_tpu.ops.quant import quantize_linear_params

QUANT_SCOPES = ("all", "transformer_blocks", "ffn", "video_ffn", "audio_ffn",
                "video_heavy", "non_attention")


# ---------------------------------------------------------------------------
# top-k schedule (acceleration.py:445-492; format "START[-END]:TOPK,...")
# ---------------------------------------------------------------------------

def parse_sla_topk_schedule(schedule: Optional[str]
                            ) -> List[Tuple[int, int, float]]:
    if not schedule:
        return []
    out = []
    for item in schedule.split(","):
        item = item.strip()
        m = re.fullmatch(r"(\d+)(?:-(\d+))?:([0-9.]+)", item)
        if not m:
            raise ValueError(
                f"--sla_topk_schedule entries must use START-END:TOPK, "
                f"got {item!r}")
        start = int(m.group(1))
        end = int(m.group(2)) if m.group(2) else start
        topk = float(m.group(3))
        if end < start:
            raise ValueError(
                f"Invalid layer range in --sla_topk_schedule: {item!r}")
        if not 0.0 < topk <= 1.0:
            raise ValueError(
                f"--sla_topk_schedule values must be in (0, 1]: {item!r}")
        out.append((start, end, topk))
    return out


def scheduled_sla_topk(layer_idx: int, default: float,
                       schedule: List[Tuple[int, int, float]]) -> float:
    for start, end, topk in schedule:
        if start <= layer_idx <= end:
            return topk
    return default


def effective_topk(topk: float, num_key_blocks: int) -> float:
    """Keep at least one K block (acceleration.py:399-400)."""
    return max(topk, 1.0 / max(num_key_blocks, 1))


# ---------------------------------------------------------------------------
# quantization scopes (acceleration.py:637-833)
# ---------------------------------------------------------------------------

def linear_name_in_quant_scope(name: str, scope: str) -> bool:
    """name: dotted path like 'blocks.0.ff.fc1' / reference's
    'model.transformer_blocks.0.ff.net.0.proj'."""
    is_attn = any(a in name for a in
                  (".attn1.", ".attn2.", "audio_attn", "to_video_attn",
                   "to_audio_attn", ".to_q", ".to_k", ".to_v", ".to_out",
                   ".to_qkv", ".to_kv"))
    is_ffn = ".ff." in name or ".audio_ff." in name or "ff.fc" in name
    is_audio = "audio" in name
    in_blocks = "blocks." in name or "transformer_blocks." in name
    if scope == "all":
        return True
    if scope == "transformer_blocks":
        return in_blocks
    if scope == "ffn":
        return is_ffn
    if scope == "video_ffn":
        return is_ffn and not is_audio
    if scope == "audio_ffn":
        return is_ffn and is_audio
    if scope == "video_heavy":
        return in_blocks and not is_audio
    if scope == "non_attention":
        return in_blocks and not is_attn
    raise ValueError(f"unknown quant scope {scope}")


# ---------------------------------------------------------------------------
# QKV / KV fusion (acceleration.py:836-860)
# ---------------------------------------------------------------------------

def fuse_attention_qkv(attn_params: dict, self_attention: bool) -> dict:
    """Concatenate q/k/v (or k/v) projections into one matmul."""
    p = dict(attn_params)
    if self_attention and all(k in p for k in ("to_q", "to_k", "to_v")):
        if all("w" in p[k] for k in ("to_q", "to_k", "to_v")):
            p["to_qkv"] = {
                "w": jnp.concatenate([p["to_q"]["w"], p["to_k"]["w"],
                                      p["to_v"]["w"]], axis=-1),
                "b": jnp.concatenate([p["to_q"]["b"], p["to_k"]["b"],
                                      p["to_v"]["b"]], axis=-1),
            }
            del p["to_q"], p["to_k"], p["to_v"]
    elif not self_attention and all(k in p for k in ("to_k", "to_v")):
        if all("w" in p[k] for k in ("to_k", "to_v")):
            p["to_kv"] = {
                "w": jnp.concatenate([p["to_k"]["w"], p["to_v"]["w"]],
                                     axis=-1),
                "b": jnp.concatenate([p["to_k"]["b"], p["to_v"]["b"]],
                                     axis=-1),
            }
            del p["to_k"], p["to_v"]
    return p


# ---------------------------------------------------------------------------
# top-level application + report
# ---------------------------------------------------------------------------

@dataclass
class AccelerationReport:
    """Printed at startup (acceleration.py:40-70)."""
    attention_type: str = "original"
    sla_topk: float = 0.0
    sla_topk_schedule: str = ""
    attention_replaced: int = 0
    w8a8_backend: str = "none"
    quant_scope: str = ""
    linears_quantized: int = 0
    qkv_fused: int = 0

    def __str__(self):
        return ("AccelerationReport("
                f"attention={self.attention_type} topk={self.sla_topk} "
                f"schedule={self.sla_topk_schedule or 'none'} "
                f"replaced={self.attention_replaced} "
                f"w8a8={self.w8a8_backend}/{self.quant_scope or '-'} "
                f"quantized={self.linears_quantized} "
                f"qkv_fused={self.qkv_fused})")


def apply_turbodiffusion_acceleration(
    params: dict,
    cfg: LTXConfig,
    attention_type: str = "original",
    sla_topk: float = 0.3,
    sla_topk_schedule: Optional[str] = None,
    w8a8_backend: str = "none",        # "none" | "postscale" | "block"
    quant_scope: str = "transformer_blocks",
    fuse_qkv: bool = False,
):
    """Returns (params, per_layer_attn_cfgs | None, report)
    (acceleration.py:1139-1196)."""
    if attention_type in ("sla", "sagesla") and not 0.0 < sla_topk <= 1.0:
        raise ValueError(f"sla_topk must be in (0, 1], got {sla_topk}")

    report = AccelerationReport(attention_type=attention_type,
                                sla_topk=sla_topk,
                                sla_topk_schedule=sla_topk_schedule or "",
                                w8a8_backend=w8a8_backend,
                                quant_scope=quant_scope)
    schedule = parse_sla_topk_schedule(sla_topk_schedule)

    attn_cfgs = None
    if attention_type in ("sla", "sagesla"):
        attn_cfgs = []
        for i in range(cfg.num_layers):
            tk = scheduled_sla_topk(i, sla_topk, schedule)
            attn_cfgs.append(AttentionConfig(
                backend=attention_type, sla_topk=tk))
            report.attention_replaced += 1
        # SLA needs zero-init proj_l per layer on the video self attention
        Dh = cfg.video_head_dim
        L_ = cfg.num_layers
        blocks = dict(params["blocks"])
        blocks["attn1"] = dict(blocks["attn1"])
        blocks["attn1"]["proj_l"] = {
            "w": jnp.zeros((L_, Dh, Dh), jnp.float32),
            "b": jnp.zeros((L_, Dh), jnp.float32)}
        params = {**params, "blocks": blocks}

    if w8a8_backend != "none":
        blocks = params["blocks"]

        def quantize_tree(node, prefix):
            if isinstance(node, dict):
                if ("w" in node and "b" in node and node["w"].ndim >= 2
                        and "norm" not in prefix and "proj_l" not in prefix):
                    if linear_name_in_quant_scope(prefix, quant_scope):
                        report.linears_quantized += 1
                        mode = "postscale" if w8a8_backend == "postscale" \
                            else "block"
                        return quantize_linear_params(node, mode)
                    return node
                return {k: quantize_tree(v, f"{prefix}.{k}")
                        for k, v in node.items()}
            return node

        params = {**params, "blocks": quantize_tree(blocks, "blocks")}

    if fuse_qkv:
        blocks = dict(params["blocks"])
        for name in ("attn1", "audio_attn1"):
            blocks[name] = fuse_attention_qkv(blocks[name],
                                              self_attention=True)
            report.qkv_fused += 1
        for name in ("attn2", "audio_attn2"):
            blocks[name] = fuse_attention_qkv(blocks[name],
                                              self_attention=False)
            report.qkv_fused += 1
        params = {**params, "blocks": blocks}

    return params, attn_cfgs, report
