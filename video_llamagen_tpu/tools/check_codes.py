"""Sanity-check extracted VQ code files (ref tools/check_image_codes.py).

Validates a .npy code dump (range/shape/dtype, codebook usage stats) and —
when a VQ checkpoint or random weights are allowed — decodes the codes back
to an image grid so a human can eyeball that the extraction pipeline didn't
scramble anything.

Usage:
    python -m video_llamagen_tpu.tools.check_codes --code-path codes.npy \
        [--vq-ckpt ckpt.pt] [--decode] --image-size 256
"""

from __future__ import annotations

import argparse

import numpy as np


def check_codes(codes: np.ndarray, codebook_size: int) -> dict:
    """Pure check: returns a stats dict, raises on hard violations."""
    if not np.issubdtype(codes.dtype, np.integer):
        raise ValueError(f"codes must be integer, got {codes.dtype}")
    lo, hi = int(codes.min()), int(codes.max())
    if lo < 0 or hi >= codebook_size:
        raise ValueError(f"code range [{lo}, {hi}] outside codebook "
                         f"[0, {codebook_size})")
    flat = codes.reshape(-1)
    used = np.unique(flat)
    return {
        "shape": tuple(codes.shape),
        "n_codes": int(flat.size),
        "min": lo, "max": hi,
        "unique": int(used.size),
        "usage_frac": float(used.size) / codebook_size,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code-path", type=str, required=True)
    ap.add_argument("--vq-model", type=str, default="VQ-16")
    ap.add_argument("--vq-ckpt", type=str, default=None)
    ap.add_argument("--codebook-size", type=int, default=16384)
    ap.add_argument("--codebook-embed-dim", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--decode", action="store_true",
                    help="also decode the codes to sample_image_code.png")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    codes = np.load(args.code_path)
    stats = check_codes(codes, args.codebook_size)
    for k, v in stats.items():
        print(f"{k}: {v}")

    if not args.decode:
        return
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..core.config import vq_config
    from ..tokenizers.vq import model as vq

    cfg = vq_config(args.vq_model, codebook_size=args.codebook_size,
                    codebook_embed_dim=args.codebook_embed_dim)
    if args.vq_ckpt:
        from ..core.torch_import import load_vq_checkpoint
        params = load_vq_checkpoint(args.vq_ckpt, cfg)
    else:
        print("[check_codes] no --vq-ckpt: RANDOM weights")
        params = vq.init_vq_params(jax.random.key(args.seed), cfg)

    ls = args.image_size // cfg.downsample_factor
    flat = codes.reshape(-1, ls * ls)[:16]            # cap the grid
    imgs = vq.decode_code(params, cfg, jnp.asarray(flat), latent_hw=(ls, ls))
    u8 = np.asarray(jnp.clip(127.5 * imgs + 128.0, 0, 255)).astype(np.uint8)
    n = u8.shape[0]
    ncol = max(1, int(np.ceil(np.sqrt(n))))
    nrow = int(np.ceil(n / ncol))
    grid = np.zeros((nrow * args.image_size, ncol * args.image_size, 3),
                    np.uint8)
    for i, im in enumerate(u8):
        r, c = divmod(i, ncol)
        grid[r * args.image_size:(r + 1) * args.image_size,
             c * args.image_size:(c + 1) * args.image_size] = im
    Image.fromarray(grid).save("sample_image_code.png")
    print("Reconstructed image is saved to sample_image_code.png")


if __name__ == "__main__":
    main()
