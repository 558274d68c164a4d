"""Video/image export (reference: utils/save_video.py:11-31).

mp4 export needs imageio+ffmpeg which may be absent; falls back to .npy
frame dumps so pipelines never hard-fail on IO deps.
"""

from __future__ import annotations

import os

import numpy as np


def to_uint8(frames: np.ndarray) -> np.ndarray:
    """[-1,1] or [0,1] float frames [T,H,W,C] → uint8."""
    frames = np.asarray(frames, dtype=np.float32)
    if frames.min() < -0.01:
        frames = (frames + 1.0) / 2.0
    return (np.clip(frames, 0.0, 1.0) * 255).round().astype(np.uint8)


def save_video(frames: np.ndarray, path: str, fps: int = 24) -> str:
    """Save [T,H,W,C] frames; returns the path actually written."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = to_uint8(frames)
    try:
        import imageio.v2 as imageio
        writer = imageio.get_writer(path, fps=fps, codec="libx264",
                                    quality=8)
        for f in frames:
            writer.append_data(f)
        writer.close()
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".npy"
        np.save(alt, frames)
        return alt


def save_image(image: np.ndarray, path: str) -> str:
    """Save one [H,W,C] frame as png (PIL) or .npy fallback."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    img = to_uint8(image[None])[0]
    try:
        from PIL import Image
        Image.fromarray(img).save(path)
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".npy"
        np.save(alt, img)
        return alt
