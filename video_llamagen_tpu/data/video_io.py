"""Video grid/export helpers (ref utils/video.py grid savers + mp4 dump)."""

from __future__ import annotations

from typing import Optional

import numpy as np


def make_video_grid(videos01: np.ndarray, nrow: int = 4,
                    padding: int = 2) -> np.ndarray:
    """(N, T, H, W, 3) in [0,1] -> one grid video (T, H', W', 3)
    (ref utils/video.py save_video_grid)."""
    n, t, h, w, c = videos01.shape
    ncol = (n + nrow - 1) // nrow
    grid = np.ones((t, ncol * (h + padding) + padding,
                    nrow * (w + padding) + padding, c), np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[:, y:y + h, x:x + w] = videos01[i]
    return grid


def save_video(video01: np.ndarray, path: str, fps: int = 8) -> Optional[str]:
    """(T, H, W, 3) [0,1] -> mp4 (imageio) or frame-stack .npy fallback."""
    u8 = (np.clip(video01, 0, 1) * 255).astype(np.uint8)
    try:
        import imageio
        imageio.mimwrite(path, u8, fps=fps)
        return path
    except Exception:
        alt = path.rsplit(".", 1)[0] + ".npy"
        np.save(alt, u8)
        return alt


def save_video_grid(videos01: np.ndarray, path: str, nrow: int = 4,
                    fps: int = 8) -> Optional[str]:
    return save_video(make_video_grid(videos01, nrow), path, fps)
