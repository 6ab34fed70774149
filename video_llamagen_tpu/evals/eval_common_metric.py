"""Video metric dispatcher CLI (ref CausalVideoVAE eval_common_metric.py).

Computes {psnr, ssim, lpips, fvd} between two video sets given as directories
of .npy clips (T, H, W, 3 in [0,1]) or two .npz bundles. FVD requires a local
I3D torchscript (--i3d-path); LPIPS uses converted VGG weights (--lpips-npz)
or a random-init net (relative numbers only) with a warning.

Usage:
  python -m video_llamagen_tpu.evals.eval_common_metric \
      --real-path refs/ --fake-path samples/ --metric psnr ssim
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp


def load_video_set(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        arr = np.load(path)["arr_0"]
        return arr.astype(np.float32) / (255.0 if arr.dtype == np.uint8 else 1.0)
    files = sorted(f for f in os.listdir(path) if f.endswith(".npy"))
    clips = [np.load(os.path.join(path, f)) for f in files]
    videos = np.stack(clips).astype(np.float32)
    if videos.max() > 1.5:
        videos = videos / 255.0
    return videos


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--real-path", required=True)
    p.add_argument("--fake-path", required=True)
    p.add_argument("--metric", nargs="+", default=["psnr", "ssim"],
                   choices=["psnr", "ssim", "lpips", "fvd", "wraperror",
                            "flolpips"])
    p.add_argument("--i3d-path", default=None)
    p.add_argument("--lpips-npz", default=None)
    p.add_argument("--raft-ckpt", default=None)
    p.add_argument("--raft-iters", type=int, default=12)
    p.add_argument("--force-platform", default=None)
    args = p.parse_args(argv)

    if args.force_platform:
        jax.config.update("jax_platforms", args.force_platform)

    real = load_video_set(args.real_path)
    fake = load_video_set(args.fake_path)
    assert real.shape == fake.shape, (real.shape, fake.shape)
    results = {}

    if "psnr" in args.metric or "ssim" in args.metric:
        from .metrics import video_psnr_ssim
        ps, ss = video_psnr_ssim(jnp.asarray(real), jnp.asarray(fake))
        if "psnr" in args.metric:
            results["psnr"] = float(np.asarray(ps).mean())
        if "ssim" in args.metric:
            results["ssim"] = float(np.asarray(ss).mean())

    if "lpips" in args.metric:
        from ..tokenizers.vq.losses import (lpips, init_lpips_params,
                                            load_lpips_npz)
        if args.lpips_npz:
            lp = load_lpips_npz(args.lpips_npz)
        else:
            print("WARNING: random-init LPIPS net (relative numbers only)")
            lp = init_lpips_params(jax.random.key(0))
        b, t = real.shape[:2]
        d = lpips(lp, jnp.asarray(fake.reshape(b * t, *fake.shape[2:]) * 2 - 1),
                  jnp.asarray(real.reshape(b * t, *real.shape[2:]) * 2 - 1))
        results["lpips"] = float(np.asarray(d).mean())

    if "fvd" in args.metric:
        from .fvd import compute_fvd
        results["fvd"] = compute_fvd(real, fake, i3d_path=args.i3d_path)

    if "wraperror" in args.metric or "flolpips" in args.metric:
        from . import raft as raft_mod
        if args.raft_ckpt:
            rp = raft_mod.load_raft_checkpoint(args.raft_ckpt)
        else:
            print("WARNING: random-init RAFT (relative numbers only)")
            rp = raft_mod.init_raft_params(jax.random.key(0))
        if "wraperror" in args.metric:
            err = raft_mod.warp_error(rp, jnp.asarray(fake * 255.0),
                                      iters=args.raft_iters)
            results["wraperror"] = float(np.asarray(err).mean())
        if "flolpips" in args.metric:
            from ..tokenizers.vq.losses import (init_lpips_params,
                                                load_lpips_npz)
            lp = (load_lpips_npz(args.lpips_npz) if args.lpips_npz
                  else init_lpips_params(jax.random.key(1)))
            fl = raft_mod.flolpips(lp, rp, jnp.asarray(real),
                                   jnp.asarray(fake), iters=args.raft_iters)
            results["flolpips"] = float(np.asarray(fl).mean())

    for k, v in results.items():
        print(f"{k}: {v:.4f}")
    return results


if __name__ == "__main__":
    main()
