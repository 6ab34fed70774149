"""t2v sampling CLI: T5 features + video GPT + CausalVAE decode -> video.

The working version of the reference's broken entry point
(sample/sample_t2v_1f.py imports a `generate_video` module that does not
exist; sample_t2v_1f_diff.py works only for the diffusion head). Supports all
three heads: --sampler ar (diff head), ar_mse (MSE head), maskgit (mask_diff).

Output: .npy latents and, when a VAE checkpoint is given, decoded frames as
.npy / .mp4 (mp4 requires imageio).
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import CausalVAEConfig, gpt_config
from ..data.datasets import left_pad_t5
from ..models import gpt_video
from ..tokenizers.causal_vae import model as cvae
from . import generate_video as gen


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gpt-model", default="GPT-B")
    p.add_argument("--gpt-ckpt", default=None)
    p.add_argument("--vae-ckpt", default=None)
    p.add_argument("--sampler", default="ar", choices=["ar", "ar_mse", "maskgit"])
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--downsample-size", type=int, default=8)
    p.add_argument("--num-frames", type=int, default=17)
    p.add_argument("--t-downsample-size", type=int, default=4)
    p.add_argument("--vae-embed-dim", type=int, default=4)
    p.add_argument("--cls-token-num", type=int, default=120)
    p.add_argument("--caption-dim", type=int, default=2048)
    p.add_argument("--cfg-scale", type=float, default=4.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--num-iter", type=int, default=64, help="maskgit steps")
    p.add_argument("--num-sampling-steps", default="100")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--t5-feature-files", nargs="+", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--out", default="sample_t2v")
    p.add_argument("--tiled", action="store_true",
                   help="decode through the tiled CausalVAE path (temporal "
                        "17-frame windows + spatial tiles with blended seams)")
    p.add_argument("--tiling", default="batched",
                   choices=["batched", "reference"],
                   help="batched: all spatial tiles in ONE compiled dispatch "
                        "(TPU fast path); reference: the serial per-tile grid "
                        "with the reference's exact trim arithmetic")
    p.add_argument("--vae-bf16", action="store_true",
                   help="cast VAE params + latents to bfloat16 for the "
                        "decode (decoder is conv/HBM-bound; bf16 halves the "
                        "bytes moved and keeps convs on the MXU)")
    p.add_argument("--time", dest="do_time", action="store_true",
                   help="run the AR loop and VAE decode TWICE and print both "
                        "wall-times: first call includes XLA compile, second "
                        "is steady-state")
    args = p.parse_args(argv)
    import time as _time
    timings = {}

    latent = args.image_size // args.downsample_size
    head = {"ar": "diff", "ar_mse": "mse", "maskgit": "mask_diff"}[args.sampler]
    cfg = gpt_config(args.gpt_model, vocab_size=16384, block_size=latent ** 2,
                     cls_token_num=args.cls_token_num,
                     caption_dim=args.caption_dim, model_type="t2v",
                     vae_embed_dim=args.vae_embed_dim,
                     num_frames=args.num_frames,
                     t_downsample_size=args.t_downsample_size,
                     num_sampling_steps=args.num_sampling_steps,
                     video_head=head)

    if args.t5_feature_files:
        feats = [left_pad_t5(np.load(f), args.cls_token_num)[0]
                 for f in args.t5_feature_files]
        cond = jnp.asarray(np.stack(feats))
    else:
        print("WARNING: random caption features (smoke mode)")
        cond = jax.random.normal(jax.random.key(args.seed + 2),
                                 (args.batch, args.cls_token_num,
                                  args.caption_dim))

    if args.gpt_ckpt:
        from ..models.hub import from_pretrained
        from ..core.config import GPTConfig
        params, cfg = from_pretrained(args.gpt_ckpt, GPTConfig)
        print(f"loaded video GPT from {args.gpt_ckpt}")
    else:
        params = gpt_video.init_video_gpt_params(jax.random.key(args.seed), cfg)
        print("WARNING: random video GPT weights (smoke mode)")

    rng = jax.random.key(args.seed)

    def run_sampler():
        if args.sampler == "ar":
            out = gen.generate_ar(params, cfg, cond, rng,
                                  cfg_scale=args.cfg_scale,
                                  temperature=args.temperature)
        elif args.sampler == "ar_mse":
            out = gen.generate_ar_mse(params, cfg, cond)
        else:
            out = gen.generate_maskgit(params, cfg, cond, rng,
                                       num_iter=args.num_iter,
                                       cfg_scale=args.cfg_scale,
                                       temperature=args.temperature)
        return np.asarray(out)          # host transfer = real sync (tunnel)

    t0 = _time.perf_counter()
    latents = run_sampler()
    timings["ar_first_s"] = _time.perf_counter() - t0
    if args.do_time:
        t0 = _time.perf_counter()
        run_sampler()                   # compile cache hit -> steady state
        timings["ar_steady_s"] = _time.perf_counter() - t0
        print(f"AR loop ({args.sampler}): first {timings['ar_first_s']:.2f}s "
              f"(incl. compile), steady {timings['ar_steady_s']:.2f}s")
    np.save(f"{args.out}_latents.npy", latents)
    print(f"latents {latents.shape} -> {args.out}_latents.npy")

    # decode through the CausalVAE: (B, t*h*w, C) -> (B, t, h, w, C) -> video
    vcfg = CausalVAEConfig(embed_dim=args.vae_embed_dim)
    if args.vae_ckpt:
        import torch
        from ..core.torch_import import import_causal_vae_state_dict
        ckpt = torch.load(args.vae_ckpt, map_location="cpu",
                          weights_only=False)
        vae_params = import_causal_vae_state_dict(ckpt, vcfg)
        print(f"loaded CausalVAE from {args.vae_ckpt}")
    else:
        vae_params = cvae.init_causal_vae_params(jax.random.key(args.seed + 1),
                                                 vcfg)
        print("WARNING: random VAE weights (smoke mode)")
    b = latents.shape[0]
    vae_t = cfg.vae_t
    z = latents.reshape(b, vae_t, latent, latent, args.vae_embed_dim)
    dec_dtype = jnp.bfloat16 if args.vae_bf16 else jnp.float32
    if args.vae_bf16:
        vae_params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            vae_params)

    def run_decode():
        zz = jnp.asarray(z, dec_dtype)
        if not args.tiled:
            return np.asarray(
                cvae.decode_jit(vae_params, vcfg, zz), np.float32)
        fn = (cvae.tiled_decode_spatial_batched if args.tiling == "batched"
              else cvae.tiled_decode_spatial)
        return np.asarray(fn(vae_params, vcfg, zz), np.float32)

    mode = (f"tiled/{args.tiling}" if args.tiled else "direct") \
        + ("/bf16" if args.vae_bf16 else "")
    t0 = _time.perf_counter()
    frames = run_decode()
    timings["vae_first_s"] = _time.perf_counter() - t0
    if args.do_time:
        t0 = _time.perf_counter()
        run_decode()
        timings["vae_steady_s"] = _time.perf_counter() - t0
        print(f"CausalVAE decode ({mode}): first {timings['vae_first_s']:.2f}s "
              f"(incl. compile), steady {timings['vae_steady_s']:.2f}s")
        timings["vae_mode"] = mode
        import json as _json
        with open(f"{args.out}_timings.json", "w") as f:
            _json.dump({k: round(v, 2) if isinstance(v, float) else v
                        for k, v in timings.items()}, f)
    frames01 = np.clip((frames + 1) / 2, 0, 1)
    np.save(f"{args.out}_frames.npy", frames01)
    print(f"frames {frames01.shape} -> {args.out}_frames.npy")
    try:
        import imageio
        for i in range(b):
            u8 = (frames01[i] * 255).astype(np.uint8)
            imageio.mimwrite(f"{args.out}_{i}.mp4", u8, fps=8)
        print(f"wrote {b} mp4 file(s)")
    except Exception as e:  # imageio may lack an ffmpeg/pyav backend
        print(f"mp4 export unavailable ({type(e).__name__}); writing GIFs")
        write_gifs(frames01, args.out)


def write_gifs(frames01: np.ndarray, out_prefix: str) -> None:
    """(B, T, H, W, 3) floats in [0,1] -> one animated GIF per clip (PIL is
    always available; the mp4 path needs an ffmpeg/pyav imageio backend)."""
    from PIL import Image
    for i, clip in enumerate(frames01):
        ims = [Image.fromarray((f * 255).astype(np.uint8)) for f in clip]
        ims[0].save(f"{out_prefix}_{i}.gif", save_all=True,
                    append_images=ims[1:], duration=125, loop=0)
    print(f"wrote {len(frames01)} gif file(s)")


if __name__ == "__main__":
    main()
