"""Video/image output.

Reference: imaginaire/utils/io.py:78-135 (save_image_or_video via
imageio-ffmpeg, fps=16). This environment has imageio but no ffmpeg backend,
so mp4 writing degrades gracefully: try imageio's ffmpeg plugin, else write
an .npz frame archive plus per-frame PNGs (PIL), preserving the exact pixel
data for later muxing.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def to_uint8_frames(video_c_t_h_w: np.ndarray) -> np.ndarray:
    """(C, T, H, W) float in [0, 1] -> (T, H, W, C) uint8 (io.py:100-112).
    Conversion runs in the native host-ops library when built."""
    from turbodiffusion_tpu.utils.host_ops import f32_to_u8
    v = f32_to_u8(np.asarray(video_c_t_h_w, np.float32))
    return np.transpose(v, (1, 2, 3, 0))


def save_video(video_c_t_h_w: np.ndarray, path: str, fps: int = 16) -> str:
    """Save a video; returns the path actually written."""
    frames = to_uint8_frames(video_c_t_h_w)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)

    if path.endswith((".mp4", ".webm", ".mkv", ".gif")):
        try:
            import imageio
            with imageio.get_writer(path, fps=fps) as w:
                for f in frames:
                    w.append_data(f)
            return path
        except Exception:
            pass
    # Fallback: lossless archive + first/last frame PNGs.
    base = os.path.splitext(path)[0]
    np.savez_compressed(base + ".npz", frames=frames, fps=fps)
    try:
        from PIL import Image
        Image.fromarray(frames[0]).save(base + "_first.png")
        Image.fromarray(frames[-1]).save(base + "_last.png")
    except Exception:
        pass
    return base + ".npz"


def load_image(path: str, size_hw: Optional[tuple] = None) -> np.ndarray:
    """Load an RGB image -> (3, H, W) float32 in [-1, 1]
    (wan2.2_i2v_infer.py:129-140: Resize + Normalize(0.5, 0.5))."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    if size_hw is not None:
        img = img.resize((size_hw[1], size_hw[0]), Image.LANCZOS)
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return np.transpose(arr, (2, 0, 1))
