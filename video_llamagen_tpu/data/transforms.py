"""Video/image transforms — numpy implementations of the reference zoo.

Capability parity with reference dataset/transform.py (ToTensorVideo,
CenterCropResizeVideo, TemporalRandomCrop, SpatialStrideCropVideo,
RandomHorizontalFlipVideo, LongSideResizeVideo) and utils/data.py's ADM
center-crop (FID-critical preprocessing). All functions take/return numpy
arrays; videos are (T, H, W, C) uint8 or float32 in [0, 1]/[-1, 1].
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _resize_bilinear(frames: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize (T, H, W, C) with align_corners=False semantics."""
    t, h, w, c = frames.shape
    if (h, w) == (out_h, out_w):
        return frames
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - np.floor(ys), 0, 1).astype(np.float32)
    wx = np.clip(xs - np.floor(xs), 0, 1).astype(np.float32)
    f = frames.astype(np.float32)
    top = f[:, y0][:, :, x0] * (1 - wx)[None, None, :, None] + \
        f[:, y0][:, :, x1] * wx[None, None, :, None]
    bot = f[:, y1][:, :, x0] * (1 - wx)[None, None, :, None] + \
        f[:, y1][:, :, x1] * wx[None, None, :, None]
    out = top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
    return out


def to_tensor_video(video_u8: np.ndarray) -> np.ndarray:
    """uint8 (T,H,W,C) -> float32 [0,1] (ref transform.py ToTensorVideo)."""
    if video_u8.dtype != np.uint8:
        raise TypeError("expected uint8 video")
    return video_u8.astype(np.float32) / 255.0


def normalize_video(video: np.ndarray, mean: float = 0.5, std: float = 0.5) -> np.ndarray:
    """[0,1] -> [-1,1] (ref Normalize([0.5]*3, [0.5]*3))."""
    return (video - mean) / std


def center_crop_resize_video(video: np.ndarray, size: int) -> np.ndarray:
    """Crop the largest centered square, then resize (ref CenterCropResizeVideo)."""
    t, h, w, c = video.shape
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    cropped = video[:, top:top + s, left:left + s]
    return _resize_bilinear(cropped, size, size)


def long_side_resize_video(video: np.ndarray, size: int) -> np.ndarray:
    """Resize so the LONG side == size, keep aspect (ref LongSideResizeVideo)."""
    t, h, w, c = video.shape
    if h > w:
        oh, ow = size, max(1, round(w * size / h))
    else:
        oh, ow = max(1, round(h * size / w)), size
    return _resize_bilinear(video, oh, ow)


def spatial_stride_crop_video(video: np.ndarray, stride: int) -> np.ndarray:
    """Crop H/W down to multiples of stride (ref SpatialStrideCropVideo)."""
    t, h, w, c = video.shape
    return video[:, : (h // stride) * stride, : (w // stride) * stride]


def random_horizontal_flip_video(rng: np.random.RandomState, video: np.ndarray,
                                 p: float = 0.5) -> np.ndarray:
    if rng.rand() < p:
        return video[:, :, ::-1].copy()
    return video


class TemporalRandomCrop:
    """Sample a contiguous frame window (ref transform.py TemporalRandomCrop)."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, total_frames: int,
                 rng: Optional[np.random.RandomState] = None) -> Tuple[int, int]:
        rng = rng or np.random
        rand_end = max(0, total_frames - self.size - 1)
        begin = int(rng.randint(0, rand_end + 1)) if rand_end > 0 else 0
        end = min(begin + self.size, total_frames)
        return begin, end


def temporal_sample_indices(start: int, end: int, num_frames: int) -> np.ndarray:
    """linspace frame indices (ref dataset/t2v.py:170-177)."""
    return np.linspace(start, end - 1, num_frames).astype(np.int64)


# ---------------------------------------------------------------------------
# ADM ImageNet preprocessing (FID-critical; ref utils/data.py)
# ---------------------------------------------------------------------------

def center_crop_arr(pil_image, image_size: int):
    """ADM center crop: repeated 2x BOX downsample then BICUBIC resize then
    crop (ref utils/data.py center_crop_arr, from guided-diffusion)."""
    from PIL import Image

    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX)
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC)
    arr = np.array(pil_image)
    crop_y = (arr.shape[0] - image_size) // 2
    crop_x = (arr.shape[1] - image_size) // 2
    return arr[crop_y:crop_y + image_size, crop_x:crop_x + image_size]
