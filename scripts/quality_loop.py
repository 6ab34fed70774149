"""Self-consistent quality loop: train VQ -> train GPT -> sample -> FID
(VERDICT r1 next-step #3).

Zero-egress stand-in for the ImageNet flow: a 16-class procedural dataset
(4 shapes x 4 colors, random pose/scale/background), VQ-8 tokenizer at 64px
(8x8 = 64 tokens), GPT-B c2i on the codes, sample_npz -> ADM evaluator.
Published weights are absent so FID uses the seed-0 random-init InceptionV3
(evals/evaluator.py documents this) — absolute values are not ImageNet-FID
comparable, but the number is a valid distribution distance: it must FALL as
training proceeds and that trajectory is the deliverable.

Stages (one per invocation — chip runs stay under shell timeouts):
  python scripts/quality_loop.py data
  python scripts/quality_loop.py vq --steps 1500
  python scripts/quality_loop.py recon
  python scripts/quality_loop.py codes
  python scripts/quality_loop.py gpt --steps 3000
  python scripts/quality_loop.py sample --step 1000
  python scripts/quality_loop.py fid --step 1000
  python scripts/quality_loop.py grid --step 1000
Results accumulate in results_quality/quality_table.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "results_quality")
SIZE = 64
N_CLASSES = 16
N_TRAIN = 16384
N_REF = 4096

COLORS = np.array([[220, 40, 40], [40, 200, 60], [60, 80, 230],
                   [235, 200, 40]], np.float32)


def _shape_mask(kind: int, cx, cy, r, ang, yy, xx):
    """Binary mask for one of 4 shapes at (cx, cy) radius r rotated by ang."""
    dx, dy = xx - cx, yy - cy
    ca, sa = np.cos(ang), np.sin(ang)
    rx, ry = ca * dx - sa * dy, sa * dx + ca * dy
    if kind == 0:                                   # circle
        return dx * dx + dy * dy <= r * r
    if kind == 1:                                   # square
        return (np.abs(rx) <= r * 0.85) & (np.abs(ry) <= r * 0.85)
    if kind == 2:                                   # triangle
        return (ry >= -r * 0.6) & (ry + 2.2 * np.abs(rx) <= r * 0.8)
    # 4-pointed star: diamond union of two squares
    return (np.abs(rx) + np.abs(ry) <= r) | \
           ((np.abs(ca * dx + sa * dy) <= r * 0.45) &
            (np.abs(-sa * dx + ca * dy) <= r * 0.45))


def render(cls: int, rs: np.random.RandomState, size: int = SIZE) -> np.ndarray:
    """One size x size uint8 image of class cls = shape*4 + color.

    Geometry scales with `size` but the random-draw SEQUENCE is unchanged,
    so at size=64 the output is bit-identical to the round-2 dataset
    (seed 0) — vq16_loop reuses this at 256 for the flagship tokenizer."""
    s = size / 64.0
    shape_k, color_k = cls // 4, cls % 4
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    # smooth random background gradient (dim, so the shape dominates)
    g1, g2 = rs.rand(2) * 2 * np.pi
    bg = (np.cos(g1) * xx + np.sin(g1) * yy) / size
    base = rs.rand(3) * 60 + 30
    img = base[None, None, :] + bg[..., None] * (rs.rand(3) * 40 - 20)
    # the class shape
    cx, cy = rs.uniform(20 * s, size - 20 * s, 2)
    r = rs.uniform(10 * s, 18 * s)
    ang = rs.uniform(0, 2 * np.pi)
    mask = _shape_mask(shape_k, cx, cy, r, ang, yy, xx)
    color = COLORS[color_k] * rs.uniform(0.8, 1.1)
    img = np.where(mask[..., None], color[None, None, :], img)
    img += rs.randn(size, size, 3) * 2.0          # sensor noise
    return np.clip(img, 0, 255).astype(np.uint8)


def stage_data(args):
    os.makedirs(ROOT, exist_ok=True)
    rs = np.random.RandomState(0)
    imgs = np.stack([render(i % N_CLASSES, rs) for i in range(N_TRAIN)])
    labels = (np.arange(N_TRAIN) % N_CLASSES).astype(np.int64)
    np.save(f"{ROOT}/train_images.npy", imgs)
    np.save(f"{ROOT}/train_labels.npy", labels)
    ref = np.stack([render(i % N_CLASSES, rs) for i in range(N_REF)])
    np.savez(f"{ROOT}/ref_batch.npz", arr_0=ref)
    val = np.stack([render(i % N_CLASSES, rs) for i in range(512)])
    np.save(f"{ROOT}/val_images.npy", val)
    print(f"dataset: {imgs.shape} train, {ref.shape} ref, 512 val -> {ROOT}")


def stage_vq(args):
    from video_llamagen_tpu.train import train_vq
    train_vq.main([
        "--vq-model", "VQ-8", "--image-size", str(SIZE),
        "--global-batch-size", "64", "--max-steps", str(args.steps),
        "--disc-start", str(args.disc_start), "--log-every", "50",
        "--data-npy", f"{ROOT}/train_images.npy",
        "--results-dir", ROOT, "--ckpt-every", "2000", "--resume",
    ])


def stage_recon(args):
    """VQ reconstruction quality on the val split: PSNR + rFID-random."""
    import jax
    import jax.numpy as jnp
    from video_llamagen_tpu.core.checkpoint import load_vq_orbax
    from video_llamagen_tpu.core.config import vq_config
    from video_llamagen_tpu.tokenizers.vq import model as vq

    vcfg = vq_config("VQ-8", dtype="bfloat16")
    params = load_vq_orbax(f"{ROOT}/checkpoints", vcfg)
    val = np.load(f"{ROOT}/val_images.npy")
    recs = []
    # params as an ARGUMENT: closing over them ships the weights in the
    # remote-compile request (HTTP 413 over the axon tunnel)
    fwd = jax.jit(lambda p, x: vq.forward(p, vcfg, x)[0])
    for i in range(0, len(val), 64):
        x = jnp.asarray(val[i:i + 64].astype(np.float32) / 127.5 - 1)
        recs.append(np.asarray(jnp.clip(127.5 * fwd(params, x) + 128.0,
                                        0, 255)).astype(np.uint8))
    rec = np.concatenate(recs)
    mse = ((rec.astype(np.float32) - val.astype(np.float32)) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    np.savez(f"{ROOT}/val_recon.npz", arr_0=rec)
    np.savez(f"{ROOT}/val_ref.npz", arr_0=val)
    print(f"VQ recon PSNR {psnr:.2f} dB over {len(val)} val images")
    _record("vq_recon", {"psnr_db": round(float(psnr), 2)})

    from video_llamagen_tpu.evals import evaluator
    res = evaluator.main([f"{ROOT}/val_ref.npz", f"{ROOT}/val_recon.npz"])
    if isinstance(res, dict):
        _record("vq_recon_rfid", {k: round(float(v), 4)
                                  for k, v in res.items()})


def stage_codes(args):
    from video_llamagen_tpu.train import extract_codes
    extract_codes.main([
        "--vq-model", "VQ-8", "--vq-orbax", f"{ROOT}/checkpoints",
        "--image-size", str(SIZE),
        "--data-npy", f"{ROOT}/train_images.npy",
        "--labels-npy", f"{ROOT}/train_labels.npy",
        "--out", f"{ROOT}/codes", "--batch", "64",
    ])


def stage_gpt(args):
    from video_llamagen_tpu.train import train_c2i
    train_c2i.main([
        "--gpt-model", args.gpt_model, "--image-size", str(SIZE),
        "--downsample-size", "8", "--num-classes", str(N_CLASSES),
        "--code-path", f"{ROOT}/codes", "--global-batch-size", "128",
        "--epochs", "10000", "--max-steps", str(args.steps),
        "--ckpt-every", str(args.ckpt_every), "--log-every", "50",
        "--max-keep", "10",   # trajectory sweeps sample EVERY kept step
        "--results-dir", f"{ROOT}/{args.gpt_dir}", "--resume",
    ])


def stage_sample(args):
    from video_llamagen_tpu.inference import sample_npz
    sample_npz.main([
        "--gpt-model", args.gpt_model,
        "--gpt-orbax", f"{ROOT}/{args.gpt_dir}/checkpoints",
        "--gpt-step", str(args.step), "--vq-model", "VQ-8",
        "--vq-orbax", f"{ROOT}/checkpoints",
        "--image-size", str(SIZE), "--downsample-size", "8",
        "--num-classes", str(N_CLASSES),
        "--num-samples", str(args.num_samples), "--per-batch", "64",
        "--cfg-scale", str(args.cfg_scale), "--top-k", "1000",
        "--out", f"{ROOT}/samples_{args.gpt_dir}_step{args.step}.npz"
        if args.gpt_dir != "gpt" else f"{ROOT}/samples_step{args.step}.npz",
    ])


def stage_fid(args):
    from video_llamagen_tpu.evals import evaluator
    stem = (f"samples_{args.gpt_dir}_step{args.step}"
            if args.gpt_dir != "gpt" else f"samples_step{args.step}")
    res = evaluator.main([f"{ROOT}/ref_batch.npz", f"{ROOT}/{stem}.npz"])
    if isinstance(res, dict):
        _record(f"{args.gpt_dir}_step{args.step}",
                {k: round(float(v), 4) for k, v in res.items()})


def stage_grid(args):
    """Sample grid PNG: 16 classes x 8 samples from a step's npz."""
    from PIL import Image
    data = np.load(f"{ROOT}/samples_step{args.step}.npz")["arr_0"]
    per, n = 8, min(len(data), 128)
    rows = []
    for c in range(N_CLASSES):
        # classes cycle in sample order pre-shuffle; just tile the first 128
        rows.append(np.concatenate(list(data[c * per:(c + 1) * per]), axis=1))
    grid = np.concatenate(rows[:N_CLASSES], axis=0)
    Image.fromarray(grid).save(f"{ROOT}/grid_step{args.step}.png")
    print(f"wrote {ROOT}/grid_step{args.step}.png")


def _record(key, value):
    path = f"{ROOT}/quality_table.json"
    table = {}
    if os.path.exists(path):
        with open(path) as f:
            table = json.load(f)
    table[key] = value
    with open(path, "w") as f:
        json.dump(table, f, indent=1)
    print(f"recorded {key} -> {value}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("stage", choices=["data", "vq", "recon", "codes", "gpt",
                                     "sample", "fid", "grid"])
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--disc-start", type=int, default=1000000,
                   help="disc off by default for the small run")
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--num-samples", type=int, default=4096)
    p.add_argument("--cfg-scale", type=float, default=2.0)
    p.add_argument("--gpt-dir", default="gpt",
                   help="GPT results subdir under results_quality (a separate "
                        "dir trains a fresh model for early trajectory points)")
    p.add_argument("--gpt-model", default="GPT-B",
                   help="model size for gpt/sample stages — a second size on "
                        "the SAME codes gives the scaling-figure series "
                        "(ref tools/draw_figure.py:6-12)")
    args = p.parse_args()
    globals()[f"stage_{args.stage}"](args)


if __name__ == "__main__":
    sys.exit(main())
