"""c2i sampling CLI: GPT + VQ decode -> PNG grid.

Parity with the reference demo flow (serve/sample_c2i.py:12-97 and the
missing-but-documented sample/sample_c2i.py, README.md:73): default demo
classes [207, 360, 387, 974, 88, 979, 417, 279], CFG, top-k sampling, VQ
decode_code, image grid save. Checkpoints load from torch .pt (importer) or
Orbax; with neither, random weights (smoke mode).

Usage:
  python -m video_llamagen_tpu.inference.sample_c2i --gpt-ckpt c2i_B_256.pt \
      --vq-ckpt vq_ds16_c2i.pt --gpt-model GPT-B --image-size 256
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import gpt_config, vq_config
from ..models import gpt
from ..tokenizers.vq import model as vq
from .generate import generate


def save_image_grid(images01: np.ndarray, path: str, nrow: int = 4,
                    padding: int = 2):
    """(N, H, W, 3) floats in [0,1] -> one PNG grid (torchvision-style)."""
    from PIL import Image

    n, h, w, c = images01.shape
    ncol = (n + nrow - 1) // nrow
    grid = np.ones((ncol * (h + padding) + padding,
                    nrow * (w + padding) + padding, c), np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y:y + h, x:x + w] = images01[i]
    Image.fromarray((grid * 255).clip(0, 255).astype(np.uint8)).save(path)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gpt-model", default="GPT-B")
    p.add_argument("--gpt-ckpt", default=None)
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--downsample-size", type=int, default=16)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--cfg-scale", type=float, default=2.0)
    p.add_argument("--cfg-interval", type=int, default=-1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--top-k", type=int, default=2000)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--classes", type=int, nargs="+",
                   default=[207, 360, 387, 974, 88, 979, 417, 279])
    p.add_argument("--out", default="sample_c2i.png")
    args = p.parse_args(argv)

    latent = args.image_size // args.downsample_size
    cfg = gpt_config(args.gpt_model, vocab_size=16384, block_size=latent ** 2,
                     num_classes=args.num_classes, cls_token_num=1,
                     model_type="c2i")
    vcfg = vq_config(args.vq_model)

    if args.gpt_ckpt:
        from ..core.torch_import import load_gpt_checkpoint
        params = load_gpt_checkpoint(args.gpt_ckpt, cfg)
        print(f"loaded GPT weights from {args.gpt_ckpt}")
    else:
        params = gpt.init_gpt_params(jax.random.key(args.seed), cfg)
        print("WARNING: random GPT weights (smoke mode)")
    params = gpt.cast_params(params, jnp.dtype(cfg.dtype))

    if args.vq_ckpt:
        from ..core.torch_import import load_vq_checkpoint
        vq_params = load_vq_checkpoint(args.vq_ckpt, vcfg)
        print(f"loaded VQ weights from {args.vq_ckpt}")
    else:
        vq_params = vq.init_vq_params(jax.random.key(args.seed + 1), vcfg)
        print("WARNING: random VQ weights (smoke mode)")

    cond = jnp.asarray(args.classes, jnp.int32)
    t0 = time.time()
    tokens = generate(params, cfg, cond, jax.random.key(args.seed),
                      latent ** 2, cfg_scale=args.cfg_scale,
                      cfg_interval=args.cfg_interval,
                      temperature=args.temperature, top_k=args.top_k,
                      top_p=args.top_p)
    tokens = np.asarray(tokens)
    dt = time.time() - t0
    print(f"generated {tokens.shape} tokens in {dt:.2f}s "
          f"({tokens.size / dt:.0f} tok/s incl. compile)")

    imgs = vq.decode_code(vq_params, vcfg, jnp.asarray(tokens),
                          (latent, latent))
    imgs01 = (np.asarray(imgs, np.float32) + 1.0) / 2.0
    save_image_grid(imgs01, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
