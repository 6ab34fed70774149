"""t2i sampling CLI: T5 features + GPT + VQ decode -> PNG grid.

Parity with reference autoregressive/sample/sample_t2i.py:24-216: T5 embed
with left-pad-120 + emb_mask contract, generate() with CFG, VQ decode.
Features come from a live T5 encoder (--t5-path) or precomputed .npy files
(--t5-feature-files, the offline-dump format).
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import gpt_config, vq_config
from ..data.datasets import left_pad_t5
from ..models import gpt
from ..tokenizers.vq import model as vq
from .generate import generate
from .sample_c2i import save_image_grid


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gpt-model", default="GPT-XL")
    p.add_argument("--gpt-ckpt", default=None)
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--downsample-size", type=int, default=16)
    p.add_argument("--cls-token-num", type=int, default=120)
    p.add_argument("--caption-dim", type=int, default=2048)
    p.add_argument("--cfg-scale", type=float, default=7.5)
    p.add_argument("--top-k", type=int, default=1000)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--prompts", nargs="+",
                   default=["A photo of an astronaut riding a horse"])
    p.add_argument("--t5-path", default=None, help="local T5 model dir")
    p.add_argument("--t5-feature-files", nargs="+", default=None,
                   help="precomputed .npy caption features")
    p.add_argument("--out", default="sample_t2i.png")
    args = p.parse_args(argv)

    latent = args.image_size // args.downsample_size
    cfg = gpt_config(args.gpt_model, vocab_size=16384, block_size=latent ** 2,
                     cls_token_num=args.cls_token_num,
                     caption_dim=args.caption_dim, model_type="t2i")
    vcfg = vq_config(args.vq_model)

    # --- conditioning features (left-pad 120 contract, t2v.py:141-155) ---
    if args.t5_feature_files:
        feats, masks = [], []
        for f in args.t5_feature_files:
            padded, emb_mask = left_pad_t5(np.load(f), args.cls_token_num)
            feats.append(padded)
            masks.append(emb_mask)
        cond = jnp.asarray(np.stack(feats))
        emb_masks = jnp.asarray(np.stack(masks))
    elif args.t5_path:
        from ..text.t5 import T5Embedder
        emb = T5Embedder(args.t5_path, model_max_length=args.cls_token_num)
        embs, attn = emb.get_text_embeddings(args.prompts)
        feats, masks = [], []
        for e, m in zip(embs, attn):
            n = int(m.sum())
            padded, emb_mask = left_pad_t5(e[:n], args.cls_token_num)
            feats.append(padded)
            masks.append(emb_mask)
        cond = jnp.asarray(np.stack(feats))
        emb_masks = jnp.asarray(np.stack(masks))
    else:
        print("WARNING: random caption features (smoke mode)")
        b = len(args.prompts)
        cond = jax.random.normal(
            jax.random.key(args.seed + 2),
            (b, args.cls_token_num, args.caption_dim))
        emb_masks = jnp.ones((b, args.cls_token_num))

    if args.gpt_ckpt:
        from ..core.torch_import import load_gpt_checkpoint
        params = load_gpt_checkpoint(args.gpt_ckpt, cfg)
    else:
        params = gpt.init_gpt_params(jax.random.key(args.seed), cfg)
        print("WARNING: random GPT weights (smoke mode)")
    params = gpt.cast_params(params, jnp.dtype(cfg.dtype))

    if args.vq_ckpt:
        from ..core.torch_import import load_vq_checkpoint
        vq_params = load_vq_checkpoint(args.vq_ckpt, vcfg)
    else:
        vq_params = vq.init_vq_params(jax.random.key(args.seed + 1), vcfg)
        print("WARNING: random VQ weights (smoke mode)")

    tokens = generate(params, cfg, cond, jax.random.key(args.seed),
                      latent ** 2, emb_masks=emb_masks,
                      cfg_scale=args.cfg_scale, temperature=args.temperature,
                      top_k=args.top_k)
    imgs = vq.decode_code(vq_params, vcfg, tokens, (latent, latent))
    imgs01 = (np.asarray(imgs, np.float32) + 1.0) / 2.0
    save_image_grid(imgs01, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
