"""CausalVAE video reconstruction demo (ref CausalVideoVAE/scripts/vae_demo.py
and rec_causalvideo_vae.py:28-120, minus the gradio/DDP scaffolding).

Read a video (or synthesize a moving-gradient clip when no input is given),
center-crop-resize, run tiled encode -> sample -> tiled decode, and write the
reconstruction as mp4 (npy fallback when imageio is absent).

Usage:
    python -m video_llamagen_tpu.tokenizers.causal_vae.demo \
        [--video-path in.mp4] --num-frames 17 --resolution 128 \
        [--ckpt vae.pt] [--refine]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ...core.config import CausalVAEConfig
from ...data.transforms import center_crop_resize_video
from ...data.video_io import save_video
from . import model as cv


def _synthetic_clip(t: int, size: int) -> np.ndarray:
    """Moving diagonal gradient, (T, H, W, 3) in [0, 1]."""
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32) / size
    frames = [np.stack([(xs + ys + i / t) % 1.0,
                        (xs - ys + 2 * i / t) % 1.0,
                        np.full_like(xs, i / t)], axis=-1)
              for i in range(t)]
    return np.stack(frames)


def _read_video(path: str, num_frames: int) -> np.ndarray:
    import imageio
    rd = imageio.get_reader(path)
    frames = []
    for i, fr in enumerate(rd):
        if i >= num_frames:
            break
        frames.append(np.asarray(fr, np.float32) / 255.0)
    rd.close()
    return np.stack(frames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video-path", type=str, default=None)
    ap.add_argument("--num-frames", type=int, default=17)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--ckpt", type=str, default=None,
                    help="torch CausalVAE checkpoint (converted on load)")
    ap.add_argument("--output", type=str, default="output_video_cv.mp4")
    ap.add_argument("--fps", type=int, default=8)
    ap.add_argument("--refine", action="store_true",
                    help="post-hoc refiner pass (ref refine_video.py)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = CausalVAEConfig()
    if args.ckpt:
        import torch
        from ...core.torch_import import (import_causal_vae_state_dict,
                                          unwrap_state_dict)
        sd = unwrap_state_dict(torch.load(args.ckpt, map_location="cpu"))
        params = import_causal_vae_state_dict(sd, cfg)
    else:
        print("[vae_demo] no --ckpt: RANDOM weights (smoke test only)")
        params = cv.init_causal_vae_params(jax.random.key(args.seed), cfg)

    if args.video_path:
        vid = _read_video(args.video_path, args.num_frames)
    else:
        vid = _synthetic_clip(args.num_frames, args.resolution)
    vid = center_crop_resize_video(vid, args.resolution)
    x = jnp.asarray(vid * 2.0 - 1.0)[None]                 # (1,T,H,W,3)

    z = cv.tiled_encode_temporal(params, cfg, x,
                                 rng=jax.random.key(args.seed + 1))
    recon = cv.tiled_decode_temporal(params, cfg, z)
    if args.refine:
        from .refiner import init_refiner_params, refine
        rp = init_refiner_params(jax.random.key(args.seed + 2), cfg)
        recon = refine(rp, cfg, recon)
    print(f"[vae_demo] latent {z.shape} -> recon {recon.shape}")

    out01 = np.asarray(jnp.clip((recon[0] + 1.0) / 2.0, 0.0, 1.0))
    written = save_video(out01, args.output, fps=args.fps)
    print(f"Reconstructed video saved to {written or args.output}")


if __name__ == "__main__":
    main()
