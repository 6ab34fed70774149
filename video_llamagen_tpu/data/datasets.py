"""Datasets: t2v video+caption, precomputed-latent t2v, t2i, ImageNet codes.

Capability parity with reference dataset/ (t2v.py, t2v_load_npy.py, t2i.py,
imagenet.py, build.py): json video metadata, left-padded-120 T5 features with
emb_mask, the causal attention mask with masked-text columns + forced diagonal
(t2v.py:156-161 — FID-critical), exception->random-retry, data_repeat, and the
`build_dataset` dispatcher.

Torch-free: plain-python Dataset protocol (__len__/__getitem__ returning numpy
dicts) + a simple batch iterator. Video decoding uses decord when present,
else imageio/av fallback, else precomputed npy latents.
"""

from __future__ import annotations

import json
import os
import random
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from .transforms import (
    to_tensor_video, center_crop_resize_video, normalize_video,
    temporal_sample_indices)

T5_FEATURE_MAX_LEN = 120
T5_FEATURE_DIM = 2048


def build_attn_mask(max_seq_length: int, emb_mask: np.ndarray,
                    text_len: int = T5_FEATURE_MAX_LEN) -> np.ndarray:
    """Causal mask with padded-text columns removed + forced diagonal
    (ref dataset/t2v.py:156-161). Returns bool (1, S, S)."""
    m = np.tril(np.ones((max_seq_length, max_seq_length), np.float32))
    m[:, :text_len] = m[:, :text_len] * emb_mask[None, :]
    eye = np.eye(max_seq_length, dtype=np.float32)
    m = m * (1 - eye) + eye
    return m[None].astype(bool)


def left_pad_t5(t5_feat: np.ndarray, max_len: int = T5_FEATURE_MAX_LEN):
    """(1, L, D) or (L, D) -> ((max_len, D) left-padded, emb_mask (max_len,))
    (ref t2v.py:141-155)."""
    if t5_feat.ndim == 3:
        t5_feat = t5_feat[0]
    feat_len = min(max_len, t5_feat.shape[0])
    out = np.zeros((max_len, t5_feat.shape[1]), np.float32)
    out[-feat_len:] = t5_feat[:feat_len]
    emb_mask = np.zeros((max_len,), np.float32)
    emb_mask[-feat_len:] = 1
    return out, emb_mask


def read_video_frames(path: str, indices: np.ndarray) -> np.ndarray:
    """Decode frames (T, H, W, C) uint8; decord if available, else imageio."""
    try:
        import decord
        vr = decord.VideoReader(path)
        return vr.get_batch(indices).asnumpy()
    except ImportError:
        pass
    import imageio.v3 as iio
    try:
        frames = iio.imread(path, plugin="pyav")
    except Exception:
        # no pyav/ffmpeg backend in this image: generic reader (gif/apng/...)
        frames = iio.imread(path)
    if frames.ndim == 3:  # single-frame container
        frames = frames[None]
    if frames.shape[-1] == 4:  # gif RGBA
        frames = frames[..., :3]
    return frames[indices]


class T2VDataset:
    """Video + caption dataset (ref dataset/t2v.py:76-201)."""

    def __init__(self, data_root: str, video_meta_info_file: str, t5_path: str,
                 num_frames: int = 17, image_size: int = 256,
                 downsample_size: int = 8, t_downsample_size: int = 4,
                 start_frame_ind: int = 25, data_repeat: int = 10,
                 transform: Optional[Callable] = None):
        self.data_root = data_root
        self.t5_path = t5_path
        self.num_frames = num_frames
        self.start_frame_ind = start_frame_ind
        self.end_frame_ind = start_frame_ind + num_frames
        self.transform = transform or (
            lambda v: normalize_video(to_tensor_video(v), 0.5, 0.5))
        self.image_size = image_size
        with open(video_meta_info_file, "r", encoding="utf-8") as f:
            self.video_meta_info = json.load(f) * data_repeat
        latent_size = image_size // downsample_size
        self.code_len = latent_size ** 2 * ((num_frames - 1) // t_downsample_size + 1)
        self.max_seq_length = T5_FEATURE_MAX_LEN + self.code_len

    def __len__(self):
        return len(self.video_meta_info)

    def _npy_path(self, item) -> str:
        rel = item["path"]
        return os.path.join(self.t5_path, os.path.dirname(rel),
                            os.path.splitext(os.path.basename(rel))[0] + ".npy")

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        # exception -> retry a random index (ref t2v.py:110-116)
        for _ in range(64):
            try:
                return self.get_video(idx)
            except Exception:
                idx = random.randint(0, len(self) - 1)
        raise RuntimeError("too many failed samples")

    def get_video(self, idx: int) -> Dict[str, Any]:
        item = self.video_meta_info[idx]
        path = os.path.join(self.data_root, item["path"])
        indices = temporal_sample_indices(self.start_frame_ind,
                                          self.end_frame_ind, self.num_frames)
        video = read_video_frames(path, indices)          # (T, H, W, C) u8
        video = center_crop_resize_video(
            to_tensor_video(video), self.image_size)
        video = normalize_video(video, 0.5, 0.5)          # [-1, 1]

        t5_feat = np.load(self._npy_path(item))
        t5_padded, emb_mask = left_pad_t5(t5_feat)
        attn_mask = build_attn_mask(self.max_seq_length, emb_mask)
        text = random.choice(item["cap"]) if isinstance(item.get("cap"), list) \
            else item.get("cap", "")
        return dict(video=video.astype(np.float32), t5_feat=t5_padded,
                    emb_mask=emb_mask, attn_mask=attn_mask,
                    valid=np.float32(1.0), text=text)


class T2VLatentDataset:
    """Precomputed CausalVAE latents (ref dataset/t2v_load_npy.py)."""

    def __init__(self, latent_root: str, video_meta_info_file: str,
                 t5_path: str, data_repeat: int = 10):
        self.latent_root = latent_root
        self.t5_path = t5_path
        with open(video_meta_info_file, "r", encoding="utf-8") as f:
            self.video_meta_info = json.load(f) * data_repeat

    def __len__(self):
        return len(self.video_meta_info)

    def _paths(self, item):
        rel = item["path"]
        stem = os.path.join(os.path.dirname(rel),
                            os.path.splitext(os.path.basename(rel))[0] + ".npy")
        return (os.path.join(self.latent_root, stem),
                os.path.join(self.t5_path, stem))

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        for _ in range(64):
            try:
                item = self.video_meta_info[idx]
                lat_path, t5_path = self._paths(item)
                latents = np.load(lat_path).astype(np.float32)
                t5_padded, emb_mask = left_pad_t5(np.load(t5_path))
                return dict(latents=latents, t5_feat=t5_padded,
                            emb_mask=emb_mask, valid=np.float32(1.0))
            except Exception:
                idx = random.randint(0, len(self) - 1)
        raise RuntimeError("too many failed samples")


class T2IDataset:
    """Raw image + precomputed T5 feature pairs (ref dataset/t2i.py
    Text2ImgDatasetImg): jsonl metadata with image_path/caption_emb_path,
    50% short/long caption mix when both are present."""

    def __init__(self, jsonl_path: str, image_size: int = 256,
                 long_caption_prob: float = 0.5):
        import json as _json
        self.items = []
        with open(jsonl_path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    self.items.append(_json.loads(line))
        self.image_size = image_size
        self.long_caption_prob = long_caption_prob

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        for _ in range(64):
            try:
                item = self.items[idx]
                from PIL import Image
                from .transforms import center_crop_arr
                img = center_crop_arr(
                    Image.open(item["image_path"]).convert("RGB"),
                    self.image_size).astype(np.float32) / 127.5 - 1.0
                key = "caption_emb_path"
                if ("long_caption_emb_path" in item
                        and random.random() < self.long_caption_prob):
                    key = "long_caption_emb_path"
                t5_padded, emb_mask = left_pad_t5(np.load(item[key]))
                code_len = (self.image_size // 16) ** 2
                attn_mask = build_attn_mask(T5_FEATURE_MAX_LEN + code_len,
                                            emb_mask)
                return dict(image=img, t5_feat=t5_padded, emb_mask=emb_mask,
                            attn_mask=attn_mask, valid=np.float32(1.0))
            except Exception:
                idx = random.randint(0, len(self) - 1)
        raise RuntimeError("too many failed samples")


class ImageNetCodeDataset:
    """Precomputed VQ codes + labels (ref dataset/imagenet.py build_imagenet_code).

    Layout: {code_dir}/imagenet{size}_codes/*.npy, {code_dir}/imagenet{size}_labels/*.npy
    with ten-crop aug axis; a random flip/crop variant is chosen per read."""

    def __init__(self, code_dir: str, image_size: int = 256,
                 flip_aug: bool = True):
        self.code_dir = os.path.join(code_dir, f"imagenet{image_size}_codes")
        self.label_dir = os.path.join(code_dir, f"imagenet{image_size}_labels")
        self.files = sorted(os.listdir(self.code_dir))
        self.flip_aug = flip_aug

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        codes = np.load(os.path.join(self.code_dir, self.files[idx]))
        labels = np.load(os.path.join(self.label_dir, self.files[idx]))
        if codes.ndim == 2:  # (aug, L)
            aug = random.randint(0, codes.shape[0] - 1) if self.flip_aug else 0
            codes = codes[aug]
        return dict(codes=codes.astype(np.int32),
                    label=np.int32(np.ravel(labels)[0]))


class BatchIterator:
    """Shuffling batch iterator with drop_remainder (DataLoader stand-in).

    Per-shard slicing for multi-host (the DistributedSampler analog,
    ref train_t2v.py:196-204): pass shard_id/num_shards."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 shard_id: int = 0, num_shards: int = 1, shuffle: bool = True):
        self.ds = dataset
        self.bs = batch_size
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.shuffle = shuffle
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        order = order[self.shard_id::self.num_shards]
        for i in range(0, len(order) - self.bs + 1, self.bs):
            items = [self.ds[int(j)] for j in order[i:i + self.bs]]
            batch = {}
            for k in items[0]:
                if isinstance(items[0][k], np.ndarray) or np.isscalar(items[0][k]):
                    batch[k] = np.stack([it[k] for it in items])
                else:
                    batch[k] = [it[k] for it in items]
            yield batch

    def __len__(self):
        return max(0, len(range(self.shard_id, len(self.ds), self.num_shards))
                   // self.bs)


class PrefetchIterator:
    """Host-thread prefetch wrapper around any batch iterable.

    The TPU analog of the reference's DataLoader worker pool
    (ref dataset/utils/dataset_utils.py:13-60): a daemon thread drains the
    wrapped iterator into a bounded queue so host-side decode/collate overlaps
    with the device step (which releases the GIL while the chip runs).
    `depth` bounds host memory to depth batches. Exceptions in the producer
    re-raise in the consumer; iteration can be abandoned mid-epoch (the
    producer thread parks on the bounded queue and dies with the process —
    daemon=True).
    """

    def __init__(self, iterable, depth: int = 2):
        self.iterable = iterable
        self.depth = depth

    def set_epoch(self, epoch: int):
        if hasattr(self.iterable, "set_epoch"):
            self.iterable.set_epoch(epoch)

    def __len__(self):
        return len(self.iterable)

    def __iter__(self):
        import queue
        import threading
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        END = object()

        def produce():
            try:
                for item in self.iterable:
                    q.put(item)
                q.put(END)
            except BaseException as e:  # surface producer errors to consumer
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


def build_dataset(name: str, **kwargs):
    """Dispatcher (ref dataset/build.py:8-27)."""
    builders = {
        "t2v": T2VDataset,
        "t2v_latents": T2VLatentDataset,
        "t2i": T2IDataset,
        "imagenet_code": ImageNetCodeDataset,
    }
    if name not in builders:
        raise ValueError(f"unknown dataset {name}; have {sorted(builders)}")
    return builders[name](**kwargs)
