"""Typed configuration tree for TurboDiffusion-TPU.

Replaces the reference's hardcoded model factory (inference/modify_model.py:86-127)
and hydra/attrs config stack (imaginaire/config.py:367-397) with plain dataclasses
plus named presets and dotted CLI overrides.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Resolution tables (reference: rcm/datasets/utils.py:25-31)
# ---------------------------------------------------------------------------

VIDEO_RES_SIZE_INFO: dict[str, dict[str, tuple[int, int]]] = {
    "720": {"1:1": (960, 960), "4:3": (960, 704), "3:4": (704, 960), "16:9": (1280, 704), "9:16": (704, 1280)},
    "512": {"1:1": (512, 512), "4:3": (640, 512), "3:4": (512, 640), "16:9": (640, 384), "9:16": (384, 640)},
    "480": {"1:1": (480, 480), "4:3": (640, 480), "3:4": (480, 640), "16:9": (768, 432), "9:16": (432, 768)},
    "480p": {"1:1": (640, 640), "4:3": (640, 480), "3:4": (480, 640), "16:9": (832, 480), "9:16": (480, 832)},
    "720p": {"1:1": (960, 960), "4:3": (960, 720), "3:4": (720, 960), "16:9": (1280, 720), "9:16": (720, 1280)},
    # smoke preset for checkpoint-free CLI runs / parity self-tests
    "tiny": {"1:1": (64, 64), "16:9": (128, 64)},
}

IMAGE_RES_SIZE_INFO: dict[str, dict[str, tuple[int, int]]] = {
    "1024": {"1:1": (1024, 1024), "4:3": (1168, 880), "3:4": (880, 1168), "16:9": (1360, 768), "9:16": (768, 1360)},
    "720": {"1:1": (960, 960), "4:3": (960, 704), "3:4": (704, 960), "16:9": (1280, 704), "9:16": (704, 1280)},
    "512": {"1:1": (512, 512), "4:3": (640, 512), "3:4": (512, 640), "16:9": (640, 384), "9:16": (384, 640)},
    "480": {"1:1": (480, 480), "4:3": (640, 480), "3:4": (480, 640), "16:9": (768, 432), "9:16": (432, 768)},
}


# ---------------------------------------------------------------------------
# Attention config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AttentionConfig:
    """Attention backend selection (reference: --attention_type / --sla_topk flags,
    inference/wan2.1_t2v_infer.py:51-52; SLA/core.py:38,122)."""

    backend: str = "dense"  # "dense" | "sla" | "sagesla"
    sla_topk: float = 0.1   # top-k ratio of K blocks kept in the sparse branch
    # Block sizes for the sparse block map. Reference uses BLKQ=128, BLKK=64
    # on sm80 (SLA/core.py:185-189), i.e. block sizes are an arch-tuned knob,
    # not part of the algorithm. On TPU the sparse gather is DMA-descriptor
    # bound below 256 (measured: 256/256 is 1.9x faster than 128/128 at 480p
    # with the same 10% coverage), so 256/256 is the default; coverage
    # `floor(topk * nK)` stays ~granularity-independent.
    block_q: int = 256
    block_k: int = 256
    # Feature map for the linear-attention compensation branch
    # (SLA/core.py:65-69; default softmax over head_dim).
    feature_map: str = "softmax"
    # Force the jnp reference implementations (CPU tests / debugging).
    use_reference_impl: bool = False
    # Forward-mode (jax.jvp) pass: dispatch to the custom_jvp attention
    # wrappers (ops/flash_jvp_pallas.py) whose tangent rule is a fused
    # one-pass Pallas kernel — the reverse-mode kernels' custom VJP is
    # opaque to jvp. Set by the sCM tangent pass (training/distill.py).
    jvp_mode: bool = False
    # Sparse-only fast path: skip the linear-attention compensation branch
    # when proj_l is known to be all-zero — its contribution is exactly 0
    # (reference: acceleration.py:249-380, TURBOT2AV_SLA_SKIP_ZERO_LINEAR;
    # detected automatically at checkpoint load).
    linear_branch: bool = True
    # INT8 V quantization granularity on the sagesla path: "channel"
    # (per-(head, channel) — the FP8-V analog; the reference sm90 path
    # quantizes V per channel to FP8 and K per block, SLA/core.py:185-241)
    # or "row" (per-token). "channel" is the default: on the fused path it
    # enables the descriptor-minimal sparse kernel (per-block K scales ride
    # an SMEM table; V scales fold at the finalize) — one DMA per gathered
    # block instead of two.
    v_quant: str = "channel"


# ---------------------------------------------------------------------------
# Wan DiT config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class WanConfig:
    """Wan2.1/2.2 diffusion-transformer architecture.

    Mirrors the constructor surface of the reference WanModel
    (rcm/networks/wan2pt1.py:489-596, wan2pt2.py) and the three hardcoded
    variants in inference/modify_model.py:86-127.
    """

    arch: str = "wan2.1"          # "wan2.1" (CLIP img branch for i2v) | "wan2.2" (channel-concat i2v)
    model_type: str = "t2v"       # "t2v" | "i2v"
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 2048
    ffn_dim: int = 8192
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 16
    num_layers: int = 32
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    # RoPE table extents (rcm/networks/wan2pt1.py:610: len_h=128, len_w=128, len_t=32)
    rope_max_h: int = 128
    rope_max_w: int = 128
    rope_max_t: int = 32

    attention: AttentionConfig = field(default_factory=AttentionConfig)
    # W8A8 blockwise-quantized linears inside transformer blocks
    # (reference --quant_linear; ops/core.py:391-432).
    quant_linear: bool = False
    # Compute dtype for the transformer trunk (norms/modulation stay fp32,
    # matching the reference's fp32 islands, wan2pt1.py:399-416,671-674).
    dtype: Any = jnp.bfloat16
    # Rematerialization: "none" | "mm_only" | "attn_only" |
    # "self_attn_only" | "block_wise"/"full"
    # (reference SAC modes, rcm/utils/selective_activation_checkpoint.py:26-59)
    remat: str = "none"

    def __post_init__(self):
        if self.dim % self.num_heads:
            raise ValueError(
                f"dim ({self.dim}) must be divisible by num_heads "
                f"({self.num_heads})")
        if (self.dim // self.num_heads) % 2:
            # 3D RoPE pairs adjacent channels (bands d-2*(d//6*2), d//6*2,
            # d//6*2; rcm/networks/wan2pt1.py:604-609) — head_dim must be even.
            raise ValueError(
                f"head_dim ({self.dim // self.num_heads}) must be even "
                f"for 3D RoPE")

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    def replace(self, **kw) -> "WanConfig":
        return dataclasses.replace(self, **kw)


def wan_config(model_name: str, **overrides) -> WanConfig:
    """Named model presets (reference: inference/modify_model.py:86-127)."""
    presets = {
        "Wan2.1-1.3B": dict(
            arch="wan2.1", model_type="t2v", dim=1536, ffn_dim=8960,
            num_heads=12, num_layers=30, in_dim=16,
        ),
        "Wan2.1-14B": dict(
            arch="wan2.1", model_type="t2v", dim=5120, ffn_dim=13824,
            num_heads=40, num_layers=40, in_dim=16,
        ),
        "Wan2.2-A14B": dict(
            arch="wan2.2", model_type="i2v", dim=5120, ffn_dim=13824,
            num_heads=40, num_layers=40, in_dim=36,
        ),
    }
    if model_name not in presets:
        raise ValueError(f"Unknown model name: {model_name}. Options: {list(presets)}")
    kw = dict(presets[model_name])
    kw.update(overrides)
    return WanConfig(**kw)


# Tiny config for tests: same topology, toy widths. head_dim kept at a
# multiple of 6-splittable size for RoPE (dim_h = d//6*2).
def wan_test_config(**overrides) -> WanConfig:
    kw = dict(
        dim=48, ffn_dim=96, num_heads=2, num_layers=2, in_dim=16,
        text_dim=32, text_len=16, freq_dim=32,
        rope_max_h=16, rope_max_w=16, rope_max_t=8,
        dtype=jnp.float32,
    )
    kw.update(overrides)
    return WanConfig(**kw)


# ---------------------------------------------------------------------------
# Sampler / generation config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GenerationConfig:
    """rCM consistency-sampling schedule (inference/wan2.1_t2v_infer.py:111-139)."""

    num_steps: int = 4            # 1..4
    sigma_max: float = 80.0       # 80 for T2V, 200 for I2V (wan2.2_i2v_infer.py:47)
    mid_t: Tuple[float, ...] = (1.5, 1.4, 1.0)
    num_frames: int = 81
    resolution: str = "480p"
    aspect_ratio: str = "16:9"
    seed: int = 0
    num_samples: int = 1
    ode: bool = False             # I2V supports ODE updates (wan2.2_i2v_infer.py:202-210)
    boundary: float = 0.9         # I2V two-expert switch boundary (wan2.2_i2v_infer.py:43)
    fps: int = 16


# ---------------------------------------------------------------------------
# Mesh / parallelism config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes. The reference decomposes into DP x CP (+ unused TP/PP)
    over NCCL (imaginaire/trainer.py:77-98); here one jax Mesh with named axes
    covers DP (data), FSDP (fsdp param sharding) and CP/Ulysses (context).
    """

    data: int = 1
    fsdp: int = 1
    context: int = 1

    @property
    def total(self) -> int:
        return self.data * self.fsdp * self.context
