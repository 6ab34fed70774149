"""Consistency-decoder reconstruction demo.

Mirrors the reference's tokenizer/consistencydecoder/cd_demo.py: load an
image, encode to scaled latents, decode via 2-step consistency sampling,
resize back to the original size and save next to the input. Runs with a
local checkpoint (``--ckpt`` holding a pickled param pytree) or, absent one,
random weights (useful only for smoke-testing the pipeline; noted on stdout).

Usage:
    python -m video_llamagen_tpu.tokenizers.consistency_decoder.demo \
        --image-path assets/example.jpg --image-size 256
"""

from __future__ import annotations

import argparse
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from .model import CDConfig, decode, encode, init_cd_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-path", type=str, required=True)
    ap.add_argument("--image-size", type=int, default=256,
                    choices=[64, 128, 256, 512, 1024])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt", type=str, default=None,
                    help="pickled param pytree (offline import of the "
                         "consistency-decoder weights)")
    args = ap.parse_args()

    from PIL import Image

    cfg = CDConfig()
    rng = jax.random.key(args.seed)
    if args.ckpt:
        with open(args.ckpt, "rb") as f:
            params = pickle.load(f)
    else:
        print("[cd_demo] no --ckpt given: using RANDOM weights (smoke test)")
        params = init_cd_params(rng, cfg)

    img = Image.open(args.image_path).convert("RGB")
    size_org = img.size
    img_r = img.resize((args.image_size, args.image_size))
    x = np.asarray(img_r, np.float32) / 255.0
    x = 2.0 * x - 1.0                                    # cd_demo.py:28
    x = jnp.asarray(x)[None]                             # (1, H, W, 3)

    r1, r2 = jax.random.split(jax.random.key(args.seed + 1))
    latent = encode(params, cfg, x, r1)                  # scaled (*0.18215)
    out = decode(params, cfg, latent / cfg.scaling_factor, r2)

    out = jax.image.resize(out, (1, size_org[1], size_org[0], 3),
                           method="bilinear")            # cd_demo.py:42
    sample = np.asarray(jnp.clip(127.5 * out[0] + 128.0, 0, 255)
                        ).astype(np.uint8)
    stem, dot, ext = args.image_path.rpartition(".")
    out_path = f"{stem}_cd.{ext}" if dot else args.image_path + "_cd"
    Image.fromarray(sample).save(out_path)
    print(f"Reconstructed image is saved to {out_path}")


if __name__ == "__main__":
    main()
