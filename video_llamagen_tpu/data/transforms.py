"""Video/image transforms — numpy implementations of the full reference zoo.

Capability parity with reference dataset/transform.py: ToTensorVideo,
Normalize, CenterCropResizeVideo (both the short-edge and the current
center_crop_th_tw semantics), TemporalRandomCrop, SpatialStrideCropVideo,
RandomHorizontalFlipVideo, LongSideResizeVideo, RandomCropVideo,
UCFCenterCropVideo, KineticsRandomCropResizeVideo, CenterCropVideo,
resize_scale / resized_crop / crop / center_crop / random_shift_crop
helpers, DynamicSampleDuration — plus utils/data.py's ADM center-crop
(FID-critical preprocessing). All functions take/return numpy arrays;
videos are (T, H, W, C) uint8 or float32 in [0, 1]/[-1, 1].
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
# Remaining reference zoo (ref dataset/transform.py:38-148, 199-538) — numpy,
# videos (T, H, W, C). Random variants take an explicit RandomState (the
# reference uses global torch/random state; explicit rngs keep loader workers
# deterministic per shard).
# ---------------------------------------------------------------------------

def crop_video(video: np.ndarray, i: int, j: int, h: int, w: int) -> np.ndarray:
    """Spatial crop at (i, j) of extent (h, w) (ref transform.py:38-45)."""
    if video.ndim != 4:
        raise ValueError("clip should be 4D (T, H, W, C)")
    return video[:, i:i + h, j:j + w]


def resize_scale_video(video: np.ndarray, size: int) -> np.ndarray:
    """Scale so the SHORT side == size, keep aspect (ref resize_scale,
    transform.py:54-59: scale_factor = target/min(H, W))."""
    t, h, w, c = video.shape
    s = size / min(h, w)
    return _resize_bilinear(video, int(h * s), int(w * s))


def resized_crop_video(video: np.ndarray, i: int, j: int, h: int, w: int,
                       size: Tuple[int, int]) -> np.ndarray:
    """Crop then resize (ref resized_crop, transform.py:62-79)."""
    return _resize_bilinear(crop_video(video, i, j, h, w), size[0], size[1])


def center_crop_video(video: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Centered (th, tw) crop; raises if smaller (ref center_crop,
    transform.py:82-92 / CenterCropVideo:399-423)."""
    t, h, w, c = video.shape
    if h < th or w < tw:
        raise ValueError("height and width must be no smaller than crop_size")
    i, j = int(round((h - th) / 2.0)), int(round((w - tw) / 2.0))
    return crop_video(video, i, j, th, tw)


def center_crop_short_edge(video: np.ndarray) -> np.ndarray:
    """Centered square crop of the short edge (ref
    center_crop_using_short_edge, transform.py:95-107)."""
    t, h, w, c = video.shape
    s = min(h, w)
    return center_crop_video(video, s, s)


def center_crop_th_tw(video: np.ndarray, th: int, tw: int,
                      top_crop: bool = False) -> np.ndarray:
    """Largest centered crop with aspect th/tw; `top_crop` anchors the crop at
    the top row (portrait-to-landscape case) (ref transform.py:111-127)."""
    t, h, w, c = video.shape
    tr = th / tw
    if h / w > tr:
        new_h, new_w = int(w * tr), w
    else:
        new_h, new_w = h, int(h / tr)
    i = 0 if top_crop else int(round((h - new_h) / 2.0))
    j = int(round((w - new_w) / 2.0))
    return crop_video(video, i, j, new_h, new_w)


def random_shift_crop(rng: np.random.RandomState, video: np.ndarray) -> np.ndarray:
    """Square crop of the short edge at a random offset along the long edge
    (ref transform.py:129-148)."""
    t, h, w, c = video.shape
    s = min(h, w)
    i = int(rng.randint(0, h - s + 1))
    j = int(rng.randint(0, w - s + 1))
    return crop_video(video, i, j, s, s)


def random_crop_video(rng: np.random.RandomState, video: np.ndarray,
                      th: int, tw: int) -> np.ndarray:
    """Random (th, tw) crop (ref RandomCropVideo, transform.py:199-230)."""
    t, h, w, c = video.shape
    if h < th or w < tw:
        raise ValueError(f"Required crop size {(th, tw)} is larger than "
                         f"input image size {(h, w)}")
    if (h, w) == (th, tw):
        return video
    i = int(rng.randint(0, h - th + 1))
    j = int(rng.randint(0, w - tw + 1))
    return crop_video(video, i, j, th, tw)


def center_crop_resize_th_tw(video: np.ndarray, th: int, tw: int,
                             top_crop: bool = False) -> np.ndarray:
    """The reference's current CenterCropResizeVideo semantics: aspect-ratio
    center (or top) crop via center_crop_th_tw, then resize to (th, tw)
    (ref transform.py:301-332)."""
    return _resize_bilinear(center_crop_th_tw(video, th, tw, top_crop), th, tw)


def ucf_center_crop_video(video: np.ndarray, size: int) -> np.ndarray:
    """Short-side proportional resize then center crop
    (ref UCFCenterCropVideo, transform.py:338-368)."""
    return center_crop_video(resize_scale_video(video, size), size, size)


def kinetics_random_crop_resize_video(rng: np.random.RandomState,
                                      video: np.ndarray, size: int) -> np.ndarray:
    """Random short-edge square crop sliding along the long edge, then resize
    (ref KineticsRandomCropResizeVideo, transform.py:374-396)."""
    return _resize_bilinear(random_shift_crop(rng, video), size, size)


class DynamicSampleDuration:
    """Random truncated duration >= t/2 on a t_stride grid
    (ref transform.py:520-538)."""

    def __init__(self, t_stride: int, extra_1: bool):
        self.t_stride = t_stride
        self.extra_1 = extra_1

    def __call__(self, t: int, h: int, w: int,
                 rng: Optional[np.random.RandomState] = None) -> Tuple[int, int]:
        rng = rng or np.random
        if self.extra_1:
            t = t - 1
        choices = list(range(t + 1))[t // 2:][:: self.t_stride]
        truncate_t = int(choices[rng.randint(0, len(choices))])
        if self.extra_1:
            truncate_t += 1
        return 0, truncate_t


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
