"""Offline VQ code extraction (ref train/extract_codes_t2i.py + the
imagenet ten-crop code layout that dataset/imagenet.py consumes).

Encodes images through a frozen VQ tokenizer and writes one codes .npy (and
one labels .npy) per sample: {out}/imagenet{size}_codes/N.npy with shape
(n_aug, L) covering the flip augmentation axis, matching
ImageNetCodeDataset's read contract.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import vq_config
from ..tokenizers.vq import model as vq


def extract_batch(params, cfg, images: np.ndarray, flip_aug: bool = True):
    """(B, H, W, 3) in [-1,1] -> (B, n_aug, L) int32 codes."""
    x = jnp.asarray(images)
    codes = vq.encode_indices(params, cfg, x)
    if not flip_aug:
        return np.asarray(codes)[:, None]
    codes_f = vq.encode_indices(params, cfg, x[:, :, ::-1])
    return np.stack([np.asarray(codes), np.asarray(codes_f)], axis=1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None, help="torch .pt checkpoint")
    p.add_argument("--vq-orbax", default=None,
                   help="orbax checkpoint dir from train_vq")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--data-path", required=False, default=None,
                   help="ImageFolder root; synthetic smoke if omitted")
    p.add_argument("--data-npy", default=None,
                   help="uint8 (N,H,W,3) npy dataset (+ --labels-npy)")
    p.add_argument("--labels-npy", default=None)
    p.add_argument("--out", default="./codes")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--no-flip", action="store_true")
    p.add_argument("--force-platform", default=None)
    args = p.parse_args(argv)

    if args.force_platform:
        jax.config.update("jax_platforms", args.force_platform)

    cfg = vq_config(args.vq_model)
    if args.vq_ckpt:
        from ..core.torch_import import load_vq_checkpoint
        params = load_vq_checkpoint(args.vq_ckpt, cfg)
    elif args.vq_orbax:
        from ..core.checkpoint import load_vq_orbax
        params = load_vq_orbax(args.vq_orbax, cfg)
        print(f"loaded VQ params from {args.vq_orbax}")
    else:
        params = vq.init_vq_params(jax.random.key(0), cfg)
        print("WARNING: random VQ weights (smoke mode)")

    code_dir = os.path.join(args.out, f"imagenet{args.image_size}_codes")
    label_dir = os.path.join(args.out, f"imagenet{args.image_size}_labels")
    os.makedirs(code_dir, exist_ok=True)
    os.makedirs(label_dir, exist_ok=True)

    def batches():
        if args.data_npy:
            data = np.load(args.data_npy)      # uint8 (N, H, W, 3)
            labels = (np.load(args.labels_npy) if args.labels_npy
                      else np.zeros(len(data), np.int64))
            n = min(len(data), args.limit) if args.limit else len(data)
            for i in range(0, n, args.batch):
                yield (data[i:i + args.batch].astype(np.float32) / 127.5 - 1,
                       labels[i:i + args.batch])
        elif args.data_path:
            from PIL import Image
            from ..data.transforms import center_crop_arr
            classes = sorted(os.listdir(args.data_path))
            idx = 0
            imgs, labels = [], []
            for ci, cname in enumerate(classes):
                cdir = os.path.join(args.data_path, cname)
                for fn in sorted(os.listdir(cdir)):
                    arr = center_crop_arr(Image.open(os.path.join(cdir, fn))
                                          .convert("RGB"), args.image_size)
                    imgs.append(arr.astype(np.float32) / 127.5 - 1)
                    labels.append(ci)
                    if len(imgs) == args.batch:
                        yield np.stack(imgs), np.asarray(labels)
                        imgs, labels = [], []
                    idx += 1
                    if args.limit and idx >= args.limit:
                        if imgs:
                            yield np.stack(imgs), np.asarray(labels)
                        return
            if imgs:
                yield np.stack(imgs), np.asarray(labels)
        else:
            rs = np.random.RandomState(0)
            n = args.limit or args.batch * 2
            for i in range(0, n, args.batch):
                b = min(args.batch, n - i)
                yield (rs.rand(b, args.image_size, args.image_size, 3)
                       .astype(np.float32) * 2 - 1,
                       rs.randint(0, 1000, b))

    count = 0
    for imgs, labels in batches():
        codes = extract_batch(params, cfg, imgs, flip_aug=not args.no_flip)
        for c, l in zip(codes, labels):
            np.save(os.path.join(code_dir, f"{count}.npy"), c.astype(np.int32))
            np.save(os.path.join(label_dir, f"{count}.npy"),
                    np.asarray([l], np.int64))
            count += 1
    print(f"wrote {count} code files to {code_dir}")


if __name__ == "__main__":
    main()
