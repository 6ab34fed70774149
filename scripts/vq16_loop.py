"""Finish the flagship VQ-16 @256 tokenizer and close its rFID loop
(VERDICT r2 next-step #4, first half).

The reference's headline table is built on vq_ds16_c2i @256 (rFID 2.19,
ref README.md:47); round 2 trained this config 800 steps and stopped. This
driver resumes that run to plateau WITH the discriminator engaged (the
reference tokenizer is a GAN), then closes the loop at 256px: held-out
reconstruction PSNR, rFID-random (random-init InceptionV3 — absolute value
not comparable to published rFID, but a real distribution distance), and a
reconstruction grid.

Stages (one per invocation — chip runs stay under shell timeouts):
  python scripts/vq16_loop.py data    # CPU-only; train auto-runs it if absent
  python scripts/vq16_loop.py train [--max-steps 3000 --disc-start 1000]
  python scripts/vq16_loop.py recon
Results accumulate in results_vq16/quality.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.join(REPO, "results_vq16")
SIZE = 256


def _record(key, value):
    path = f"{ROOT}/quality.json"
    table = {}
    if os.path.exists(path):
        with open(path) as f:
            table = json.load(f)
    table[key] = value
    with open(path, "w") as f:
        json.dump(table, f, indent=1)
    print(f"recorded {key} -> {value}")


def stage_data(args):
    """Procedural 256px dataset (2048 train + 512 val, seed 0) — the same
    16-class shape/color scenes as quality_loop, rendered at 256. Round 2
    generated this file ad hoc and a round restart wiped it; now it is
    reproducible in-repo (round-2 log.txt header: 'dataset: 2048 images
    @256')."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from quality_loop import render
    os.makedirs(ROOT, exist_ok=True)
    rs = np.random.RandomState(0)
    train = np.stack([render(i % 16, rs, size=SIZE) for i in range(2048)])
    np.save(f"{ROOT}/train_images_256.npy", train)
    val = np.stack([render(i % 16, rs, size=SIZE) for i in range(512)])
    np.save(f"{ROOT}/val_images_256.npy", val)
    print(f"dataset: {train.shape} train, {val.shape} val -> {ROOT}")


def stage_train(args):
    if not os.path.exists(f"{ROOT}/train_images_256.npy"):
        stage_data(args)
    from video_llamagen_tpu.train import train_vq
    argv = [
        "--vq-model", "VQ-16", "--image-size", str(SIZE),
        "--global-batch-size", "16", "--max-steps", str(args.max_steps),
        "--disc-start", str(args.disc_start), "--log-every", "25",
        "--data-npy", f"{ROOT}/train_images_256.npy",
        "--results-dir", ROOT, "--ckpt-every", "1000", "--resume",
        "--remat",
    ]
    if args.adaptive:
        argv.append("--disc-adaptive-weight")
    if args.ema:
        argv += ["--ema", "--ema-decay", str(args.ema_decay)]
    train_vq.main(argv)


def stage_recon(args):
    """Held-out 256px reconstruction: PSNR + rFID-random + grid."""
    import jax
    import jax.numpy as jnp
    from video_llamagen_tpu.core.checkpoint import load_vq_orbax
    from video_llamagen_tpu.core.config import vq_config
    from video_llamagen_tpu.tokenizers.vq import model as vq

    vcfg = vq_config("VQ-16", dtype="bfloat16")
    params = load_vq_orbax(f"{ROOT}/checkpoints", vcfg, ema=args.ema)
    val = np.load(f"{ROOT}/val_images_256.npy")
    recs = []
    # params as an ARGUMENT: closing over them ships the weights inside the
    # remote-compile request (HTTP 413 over the axon tunnel)
    fwd = jax.jit(lambda p, x: vq.forward(p, vcfg, x)[0])
    for i in range(0, len(val), 16):
        x = jnp.asarray(val[i:i + 16].astype(np.float32) / 127.5 - 1)
        recs.append(np.asarray(jnp.clip(127.5 * fwd(params, x) + 128.0,
                                        0, 255)).astype(np.uint8))
    rec = np.concatenate(recs)
    mse = ((rec.astype(np.float32) - val.astype(np.float32)) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    np.savez(f"{ROOT}/val_recon.npz", arr_0=rec)
    np.savez(f"{ROOT}/val_ref.npz", arr_0=val)
    # Keyed by which weights were evaluated: the TrainConfig EMA decay
    # (0.9999) has a ~10k-step time constant, so a 4k-step run's EMA is
    # still dominated by the random init (16.0 dB vs ~22 dB raw in round 4).
    sfx = "_ema" if args.ema else ""
    print(f"VQ-16 @256 recon PSNR {psnr:.2f} dB over {len(val)} held-out"
          f" ({'EMA' if args.ema else 'raw'} weights)")
    _record(f"recon_psnr_db{sfx}", round(float(psnr), 2))

    from video_llamagen_tpu.evals import evaluator
    res = evaluator.main([f"{ROOT}/val_ref.npz", f"{ROOT}/val_recon.npz"])
    if isinstance(res, dict):
        _record(f"rfid_random{sfx}", {k: round(float(v), 4)
                                      for k, v in res.items()})

    from PIL import Image
    pairs = []
    for i in range(8):
        pairs.append(np.concatenate([val[i], rec[i]], axis=0))
    Image.fromarray(np.concatenate(pairs, axis=1)).save(
        f"{ROOT}/recon_grid.png")
    print(f"wrote {ROOT}/recon_grid.png (top: real, bottom: recon)")


def main():
    global ROOT
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("stage", choices=["data", "train", "recon"])
    p.add_argument("--max-steps", type=int, default=3000)
    p.add_argument("--disc-start", type=int, default=1000)
    p.add_argument("--dir", default="results_vq16",
                   help="results dir under the repo root — a fresh dir "
                        "trains from scratch (the round-3 fixed-weight run's "
                        "post-disc checkpoints are not a resume base)")
    p.add_argument("--adaptive", action="store_true",
                   help="train with --disc-adaptive-weight (ref "
                        "vq_loss.py:109-115)")
    p.add_argument("--ema", action="store_true",
                   help="train with EMA params / evaluate the EMA weights")
    p.add_argument("--ema-decay", type=float, default=0.999,
                   help="EMA decay for train (0.999 suits few-k-step runs; "
                        "the 0.9999 default never converges within 4k steps)")
    args = p.parse_args()
    ROOT = os.path.join(REPO, args.dir)
    globals()[f"stage_{args.stage}"](args)


if __name__ == "__main__":
    sys.exit(main())
