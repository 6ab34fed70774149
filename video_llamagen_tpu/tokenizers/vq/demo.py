"""Single-image VQ tokenizer demo (ref tokenizer_image/vq_demo.py:13-97).

Center-crop an image, encode to discrete codebook indices, decode back and
save the reconstruction next to the input with a suffix. Loads either a torch
reference checkpoint (``--vq-ckpt``, converted via core/torch_import — ema >
model > state_dict preference like vq_demo.py:26-33) or runs with random
weights for pipeline smoke-testing.

Usage:
    python -m video_llamagen_tpu.tokenizers.vq.demo \
        --image-path img.png --image-size 256 [--vq-ckpt ckpt.pt]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ...core.config import VQConfig, vq_config
from ...data.transforms import center_crop_arr
from . import model as vq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-path", type=str, required=True)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--vq-model", type=str, default="VQ-16",
                    choices=["VQ-8", "VQ-16"])
    ap.add_argument("--codebook-size", type=int, default=16384)
    ap.add_argument("--codebook-embed-dim", type=int, default=8)
    ap.add_argument("--vq-ckpt", type=str, default=None)
    ap.add_argument("--output-dir", type=str, default="output_vq_demo")
    ap.add_argument("--suffix", type=str, default="tokenizer")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    cfg = vq_config(args.vq_model, codebook_size=args.codebook_size,
                    codebook_embed_dim=args.codebook_embed_dim)
    if args.vq_ckpt:
        from ...core.torch_import import load_vq_checkpoint
        params = load_vq_checkpoint(args.vq_ckpt, cfg)
    else:
        print("[vq_demo] no --vq-ckpt: RANDOM weights (smoke test only)")
        params = vq.init_vq_params(jax.random.key(args.seed), cfg)

    pil = Image.open(args.image_path).convert("RGB")
    img = center_crop_arr(pil, args.image_size)
    x = jnp.asarray(np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0)[None]

    f = cfg.downsample_factor
    indices = vq.encode_indices(params, cfg, x)           # (1, h*w)
    recon = vq.decode_code(params, cfg, indices,
                           latent_hw=(args.image_size // f,
                                      args.image_size // f))
    print(f"[vq_demo] {indices.size} tokens, "
          f"{int(jnp.unique(indices).size)} unique codes")

    os.makedirs(args.output_dir, exist_ok=True)
    stem = os.path.basename(args.image_path)
    root, ext = os.path.splitext(stem)
    out_path = os.path.join(args.output_dir, f"{root}_{args.suffix}{ext}")
    u8 = np.asarray(jnp.clip(127.5 * recon[0] + 128.0, 0, 255)).astype(np.uint8)
    Image.fromarray(u8).save(out_path)
    print(f"Reconstructed image is saved to {out_path}")


if __name__ == "__main__":
    main()
