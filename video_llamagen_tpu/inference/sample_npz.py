"""FID sampling CLI: generate N class-conditional samples -> ADM-format npz.

Completes the reference's evaluation flow (evaluations/c2i/README.md: sample
50k images, pack into an npz of shape (N, H, W, 3) uint8 with key arr_0, run
the ADM evaluator against the reference batch). The reference does this with
a DDP sampling script + create_npz_from_sample_folder
(reconstruction_vq_ddp.py:25-40, serve/sample_c2i.py); here one process loops
compiled-batch generation and streams straight into the array — no 50k PNG
round-trip.

Classes cycle 0..num_classes-1 like the reference's evenly-spread sampling.
Samples are shuffled before packing (IS is order-sensitive; the reference
shuffles too, reconstruction_cd_ddp.py:55).

Usage:
  python -m video_llamagen_tpu.inference.sample_npz --gpt-ckpt c2i_L.pt \
      --vq-ckpt vq_ds16_c2i.pt --gpt-model GPT-L --num-samples 50000 \
      --per-batch 32 --out samples_50k.npz
Then:
  python -m video_llamagen_tpu.evals.evaluator ref_batch.npz samples_50k.npz
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import gpt_config, vq_config
from ..evals.metrics import create_npz_from_samples
from ..models import gpt
from ..tokenizers.vq import model as vq
from .generate import generate


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gpt-model", default="GPT-B")
    p.add_argument("--gpt-ckpt", default=None, help="torch .pt checkpoint")
    p.add_argument("--gpt-orbax", default=None,
                   help="orbax checkpoint dir from train_c2i/train_t2i")
    p.add_argument("--gpt-step", type=int, default=None,
                   help="orbax step to load (default latest)")
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None, help="torch .pt checkpoint")
    p.add_argument("--vq-orbax", default=None,
                   help="orbax checkpoint dir from train_vq")
    p.add_argument("--ema", action="store_true",
                   help="load EMA params from orbax checkpoints")
    p.add_argument("--force-platform", default=None)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--downsample-size", type=int, default=16)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--num-samples", type=int, default=50000)
    p.add_argument("--per-batch", type=int, default=32)
    p.add_argument("--cfg-scale", type=float, default=2.0)
    p.add_argument("--cfg-interval", type=int, default=-1)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--kv-int8", action="store_true")
    p.add_argument("--kv-int4", action="store_true",
                   help="s4 KV cache (quarter stream; per-group K scales) — "
                        "the quality gate for defaulting it lives in "
                        "scripts/kv_quality_gate.py")
    p.add_argument("--draft-model", default=None,
                   help="draft GPT for speculative decoding "
                        "(inference/speculative.py); output distribution is "
                        "IDENTICAL to plain sampling — only wall time changes")
    p.add_argument("--draft-orbax", default=None)
    p.add_argument("--draft-step", type=int, default=None)
    p.add_argument("--spec-k", type=int, default=4)
    p.add_argument("--out", default="samples.npz")
    p.add_argument("--save-labels", action="store_true")
    args = p.parse_args(argv)

    if args.force_platform:
        jax.config.update("jax_platforms", args.force_platform)

    latent = args.image_size // args.downsample_size
    cfg = gpt_config(args.gpt_model, vocab_size=16384,
                     block_size=latent ** 2, num_classes=args.num_classes,
                     cls_token_num=1, model_type="c2i", dtype="bfloat16")
    vcfg = vq_config(args.vq_model)

    if args.gpt_ckpt:
        from ..core.torch_import import load_gpt_checkpoint
        params = load_gpt_checkpoint(args.gpt_ckpt, cfg)
    elif args.gpt_orbax:
        from ..core.checkpoint import load_gpt_orbax
        params = load_gpt_orbax(args.gpt_orbax, cfg, step=args.gpt_step,
                                ema=args.ema)
        print(f"loaded GPT params from {args.gpt_orbax} "
              f"(step {args.gpt_step or 'latest'})")
    else:
        print("WARNING: random GPT weights (smoke mode)")
        params = gpt.init_gpt_params(jax.random.key(args.seed), cfg)
    params = gpt.cast_params(params, jnp.bfloat16)
    if args.vq_ckpt:
        from ..core.torch_import import load_vq_checkpoint
        vparams = load_vq_checkpoint(args.vq_ckpt, vcfg)
    elif args.vq_orbax:
        from ..core.checkpoint import load_vq_orbax
        vparams = load_vq_orbax(args.vq_orbax, vcfg, ema=args.ema)
        print(f"loaded VQ params from {args.vq_orbax}")
    else:
        print("WARNING: random VQ weights (smoke mode)")
        vparams = vq.init_vq_params(jax.random.key(1), vcfg)

    draft_params = draft_cfg = None
    if args.draft_model:
        if args.cfg_interval > -1:
            raise SystemExit("--draft-model does not support --cfg-interval "
                             "(see inference/speculative.py limitations)")
        draft_cfg = gpt_config(args.draft_model, vocab_size=16384,
                               block_size=latent ** 2,
                               num_classes=args.num_classes, cls_token_num=1,
                               model_type="c2i", dtype="bfloat16")
        if args.draft_orbax:
            from ..core.checkpoint import load_gpt_orbax
            draft_params = load_gpt_orbax(args.draft_orbax, draft_cfg,
                                          step=args.draft_step, ema=args.ema)
            print(f"speculative decoding: draft {args.draft_model} from "
                  f"{args.draft_orbax} (K={args.spec_k})")
        else:
            print("WARNING: random draft weights (smoke mode)")
            draft_params = gpt.init_gpt_params(jax.random.key(2), draft_cfg)
        draft_params = gpt.cast_params(draft_params, jnp.bfloat16)

    rng = jax.random.key(args.seed)
    all_imgs, all_labels = [], []
    n_done, t0 = 0, time.time()
    batch_idx = 0
    while n_done < args.num_samples:
        b = min(args.per_batch, args.num_samples - n_done)
        # keep the compiled shape fixed: pad the last batch, drop extras
        b_run = args.per_batch
        labels = (np.arange(n_done, n_done + b_run) % args.num_classes
                  ).astype(np.int32)
        rng, r = jax.random.split(rng)
        if draft_params is not None:
            from .speculative import spec_generate
            toks = spec_generate(params, cfg, draft_params, draft_cfg,
                                 jnp.asarray(labels), r, cfg.block_size,
                                 spec_k=args.spec_k,
                                 cfg_scale=args.cfg_scale,
                                 temperature=args.temperature,
                                 top_k=args.top_k, top_p=args.top_p,
                                 kv_int8=args.kv_int8,
                                 draft_kv_int8=args.kv_int8)
        else:
            toks = generate(params, cfg, jnp.asarray(labels), r,
                            cfg.block_size,
                            cfg_scale=args.cfg_scale,
                            cfg_interval=args.cfg_interval,
                            temperature=args.temperature, top_k=args.top_k,
                            top_p=args.top_p, kv_int8=args.kv_int8,
                            kv_int4=args.kv_int4)
        imgs = vq.decode_code(vparams, vcfg, toks, latent_hw=(latent, latent))
        u8 = np.asarray(jnp.clip(127.5 * imgs + 128.0, 0, 255)
                        ).astype(np.uint8)[:b]
        all_imgs.append(u8)
        all_labels.append(labels[:b])
        n_done += b
        batch_idx += 1
        if batch_idx % 10 == 0 or n_done >= args.num_samples:
            rate = n_done / (time.time() - t0)
            print(f"{n_done}/{args.num_samples} samples "
                  f"({rate:.1f} img/s)", flush=True)

    samples = np.concatenate(all_imgs)
    labels = np.concatenate(all_labels)
    perm = np.random.RandomState(args.seed).permutation(len(samples))
    samples, labels = samples[perm], labels[perm]
    create_npz_from_samples(samples, args.out,
                            labels=labels if args.save_labels else None)
    print(f"saved {len(samples)} samples to {args.out} "
          f"[shape={samples.shape}]")


if __name__ == "__main__":
    main()
