"""LoRA fusing and fp8 weight loading.

Behavioral reference: ltx_core/loader/fuse_loras.py (delta = strength * B@A
summed across LoRAs, added into the base weight) and loader/kernels.py
(`fused_add_round_kernel`: upcast fp8 base weights, add deltas, stochastic
rounding). TPU-native reading: these are offline/state-dict transforms, so
they run in numpy on host — no kernel needed; the stochastic rounding is
the bit-trick form (add uniform noise below the bf16 mantissa cut, then
truncate), equivalent to the reference's ULP-scaled uniform perturbation.

fp8 storage uses ml_dtypes (numpy) / jnp float8_e4m3fn — loaded weights are
upcast to bf16 before use (TPU v5e has no fp8 matmul; the MXU path is bf16
or int8, see ops/quant.py for the int8 GEMM).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

try:  # fp8 numpy dtypes (bundled with jax)
    import ml_dtypes
    _FP8_DTYPES = (np.dtype(ml_dtypes.float8_e4m3fn),
                   np.dtype(ml_dtypes.float8_e5m2))
    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    ml_dtypes = None
    _FP8_DTYPES = ()
    _BF16 = np.dtype(np.float32)


def is_fp8(arr: np.ndarray) -> bool:
    return ml_dtypes is not None and arr.dtype in _FP8_DTYPES


def stochastic_round_bf16(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """f32 -> bf16 with stochastic rounding (loader/kernels.py:66-69
    semantics): add uniform noise over the truncated mantissa range, then
    round-to-zero by dropping the low 16 bits."""
    x32 = np.ascontiguousarray(x, dtype=np.float32)
    bits = x32.view(np.uint32)
    noise = np.random.RandomState(seed).randint(
        0, 1 << 16, size=bits.shape, dtype=np.uint32)
    rounded = ((bits + noise) & np.uint32(0xFFFF0000)).view(np.float32)
    return rounded.astype(_BF16)


def upcast_fp8(arr: np.ndarray, dtype=np.float32) -> np.ndarray:
    """fp8 (e4m3/e5m2) -> requested float dtype (loader path for fp8
    checkpoints; deterministic — stochastic rounding only applies when
    *writing* low precision, see `apply_loras`)."""
    return np.asarray(arr, dtype=np.float32).astype(dtype)


def _lora_delta(lora_sds: List[Tuple[Dict[str, np.ndarray], float]],
                key: str) -> Optional[np.ndarray]:
    """Sum of strength * B @ A for one target weight (fuse_loras.py:44-61).
    `key` is the base weight name, e.g. 'blocks.0.attn.q.weight'."""
    prefix = key[:-len(".weight")] if key.endswith(".weight") else key
    key_a, key_b = f"{prefix}.lora_A.weight", f"{prefix}.lora_B.weight"
    deltas = []
    for sd, coef in lora_sds:
        if key_a not in sd or key_b not in sd:
            continue
        a = np.asarray(sd[key_a], np.float32)
        b = np.asarray(sd[key_b], np.float32)
        deltas.append(coef * (b @ a))
    if not deltas:
        return None
    return np.sum(deltas, axis=0) if len(deltas) > 1 else deltas[0]


def apply_loras(model_sd: Dict[str, np.ndarray],
                lora_sds: List[Tuple[Dict[str, np.ndarray], float]],
                dtype=None, seed: int = 0) -> Dict[str, np.ndarray]:
    """Fuse LoRA deltas into a base state dict (fuse_loras.py:64-100).

    - weights without a matching LoRA pass through (dtype-cast only);
    - bf16/f32 base + delta: plain add;
    - fp8 base + delta: upcast, add, stochastic-round (the reference's
      calculate_weight_float8_ path) — output bf16.
    dtype: optional numpy dtype for the fused output (default: keep each
    weight's dtype, fp8 promoted to bf16 when a delta lands on it).
    """
    out = {}
    for key, w in model_sd.items():
        w = np.asarray(w)
        delta = _lora_delta(lora_sds, key)
        if delta is None:
            # pass through; optional dtype cast of float weights only
            if dtype is not None and (is_fp8(w) or
                                      np.issubdtype(w.dtype, np.floating)):
                w = upcast_fp8(w, dtype) if is_fp8(w) else w.astype(dtype)
            out[key] = w
            continue
        if delta.shape != w.shape:
            raise ValueError(f"LoRA delta shape {delta.shape} != weight "
                             f"{w.shape} for {key}")
        if is_fp8(w):
            fused = stochastic_round_bf16(
                upcast_fp8(w, np.float32) + delta, seed=seed)
            out[key] = fused.astype(dtype) if dtype is not None else fused
        else:
            fused = np.asarray(w, np.float32) + delta
            out[key] = fused.astype(dtype or w.dtype)
    return out


def load_lora_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a LoRA checkpoint (.safetensors or .pth) to numpy, normalizing
    the common `diffusion_model.` / `transformer.` prefixes away."""
    from turbodiffusion_tpu.utils.checkpoint import load_torch_state_dict
    sd = load_torch_state_dict(path)
    out = {}
    for k, v in sd.items():
        for pre in ("diffusion_model.", "transformer.", "net."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out
