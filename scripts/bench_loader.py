"""Input-pipeline vs step-time benchmark (VERDICT r2 next-step #6).

Measures host-side loader throughput for the three production data paths and
compares each against the on-chip step rate it must feed (README "Training"
numbers, measured on the real chip):

  c2i codes      ImageNetCodeDataset       vs GPT-B c2i  106k tok/s
                                              (batch 128 x 256 tok = 0.31 s/step)
  t2v latents    T2VLatentDataset          vs t2v diff   427 ms/step
  t2v pixels     T2VDataset (imageio decode + crop + normalize)
                                           vs t2v online-encode step

Each path is run bare (synchronous BatchIterator, exactly what the trainers
did through round 2) and wrapped in data.datasets.PrefetchIterator (host
thread + bounded queue — the TPU analog of the reference's DataLoader worker
pool, ref dataset/utils/dataset_utils.py:13-60). All data is synthetic and
written to a temp dir; sizes match production shapes.

Output: one JSON table at results_loader/loader_vs_step.json and a markdown
table on stdout for the README.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from video_llamagen_tpu.data.datasets import (
    BatchIterator, ImageNetCodeDataset, PrefetchIterator, T2VDataset,
    T2VLatentDataset)

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "results_loader")

# On-chip step times this host pipeline must outrun (README, measured):
STEP_S = {
    "c2i_codes": 0.31,     # GPT-B 106k tok/s at batch 128 x 256 tokens
    "t2v_latents": 0.427,  # t2v diff-head trainer, full video seq
    "t2v_pixels": 0.427,   # online-encode trainer consumes pixel batches
}
BATCH = {"c2i_codes": 128, "t2v_latents": 16, "t2v_pixels": 8}


def _make_c2i(root: str, n: int = 512):
    """Flat npy codes (256 tokens) + labels, ImageNetCodeDataset layout."""
    cdir = os.path.join(root, "imagenet256_codes")
    ldir = os.path.join(root, "imagenet256_labels")
    os.makedirs(cdir, exist_ok=True)
    os.makedirs(ldir, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(n):
        np.save(os.path.join(cdir, f"{i}.npy"),
                rs.randint(0, 16384, (2, 256)).astype(np.int64))
        np.save(os.path.join(ldir, f"{i}.npy"),
                rs.randint(0, 1000, (1,)).astype(np.int64))
    return ImageNetCodeDataset(root)


def _meta(root: str, n: int, ext: str):
    meta = [{"path": f"clip_{i}{ext}", "cap": [f"caption {i}"]}
            for i in range(n)]
    path = os.path.join(root, "meta.json")
    with open(path, "w") as f:
        json.dump(meta, f)
    return path


def _make_t2v_latents(root: str, n: int = 256):
    """Production t2v latent shape: 17f@256/8 -> (5*32*32, 4) + T5 features."""
    lat = os.path.join(root, "latents")
    t5 = os.path.join(root, "t5")
    os.makedirs(lat, exist_ok=True)
    os.makedirs(t5, exist_ok=True)
    rs = np.random.RandomState(1)
    for i in range(n):
        np.save(os.path.join(lat, f"clip_{i}.npy"),
                rs.randn(5 * 32 * 32, 4).astype(np.float32))
        np.save(os.path.join(t5, f"clip_{i}.npy"),
                rs.randn(1, rs.randint(30, 120), 2048).astype(np.float32))
    return T2VLatentDataset(lat, _meta(root, n, ".mp4"), t5, data_repeat=1)


def _make_t2v_pixels(root: str, n: int = 24):
    """Real encoded videos, 48f@288 so the 17f@256 crop-resize path does
    real work; + T5 features. GIF container (this image has no ffmpeg/pyav
    backend — read_video_frames falls back to the generic imageio reader;
    GIF LZW decode is in the same cost ballpark as H.264 for these sizes)."""
    import imageio
    vid = os.path.join(root, "videos")
    t5 = os.path.join(root, "t5")
    os.makedirs(vid, exist_ok=True)
    os.makedirs(t5, exist_ok=True)
    rs = np.random.RandomState(2)
    yy, xx = np.mgrid[0:288, 0:288].astype(np.float32) / 288.0
    for i in range(n):
        # structured content (moving gradients): realistic compression ratio,
        # not the pathological LZW worst case of uint8 noise
        ph = rs.rand(3) * 6.0
        frames = np.stack([
            np.stack([np.sin(5 * xx + ph[0] + 0.2 * t),
                      np.cos(4 * yy + ph[1] - 0.15 * t),
                      np.sin(3 * (xx + yy) + ph[2] + 0.1 * t)], axis=-1)
            for t in range(48)])
        u8 = ((frames * 0.5 + 0.5) * 255).astype(np.uint8)
        imageio.mimwrite(os.path.join(vid, f"clip_{i}.gif"), u8, fps=8)
        np.save(os.path.join(t5, f"clip_{i}.npy"),
                rs.randn(1, 77, 2048).astype(np.float32))
    return T2VDataset(vid, _meta(root, n, ".gif"), t5, num_frames=17,
                      image_size=256, start_frame_ind=25, data_repeat=8)


def _drain(it, max_batches: int, warmup: int = 2):
    """batches/s over up to max_batches after warmup batches."""
    n = 0
    t0 = None
    for b in it:
        if n == warmup:
            t0 = time.perf_counter()
        n += 1
        if n >= warmup + max_batches:
            break
    if t0 is None or n <= warmup:
        return float("nan"), 0
    return (n - warmup) / (time.perf_counter() - t0), n - warmup


def _overlapped_rate(make_iter, step_s: float, max_batches: int):
    """Effective step rate when the consumer ALSO spends step_s per batch
    (sleep stands in for the chip step, which releases the GIL the same way).
    This is what prefetch actually buys: overlap, not raw loader speed."""
    it = make_iter()
    n = 0
    t0 = None
    for _ in it:
        if n == 2:
            t0 = time.perf_counter()
        time.sleep(step_s)
        n += 1
        if n >= 2 + max_batches:
            break
    if t0 is None or n <= 2:
        return float("nan")
    return (n - 2) / (time.perf_counter() - t0)


def bench_path(name: str, ds, max_batches: int = 12):
    bs = BATCH[name]
    step_s = STEP_S[name]
    rec = {"batch": bs, "step_s_chip": step_s}

    sync_rate, _ = _drain(BatchIterator(ds, bs, shuffle=True), max_batches)
    rec["sync_batches_per_s"] = round(sync_rate, 2)
    pre_rate, _ = _drain(
        PrefetchIterator(BatchIterator(ds, bs, shuffle=True), depth=2),
        max_batches)
    rec["prefetch_batches_per_s"] = round(pre_rate, 2)

    # the number that matters: steps/s with the chip step in the loop
    eff_sync = _overlapped_rate(
        lambda: BatchIterator(ds, bs, shuffle=True), step_s, max_batches)
    eff_pre = _overlapped_rate(
        lambda: PrefetchIterator(BatchIterator(ds, bs, shuffle=True), depth=2),
        step_s, max_batches)
    rec["eff_steps_per_s_sync"] = round(eff_sync, 2)
    rec["eff_steps_per_s_prefetch"] = round(eff_pre, 2)
    ideal = 1.0 / step_s
    rec["chip_steps_per_s"] = round(ideal, 2)
    rec["starves_sync"] = bool(eff_sync < 0.9 * ideal)
    rec["starves_prefetch"] = bool(eff_pre < 0.9 * ideal)
    return rec


def main():
    os.makedirs(ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="vlg_loader_")
    table = {}
    try:
        print("building synthetic datasets...")
        table["c2i_codes"] = bench_path("c2i_codes", _make_c2i(tmp),
                                        max_batches=12)
        print("c2i_codes", table["c2i_codes"])
        table["t2v_latents"] = bench_path("t2v_latents",
                                          _make_t2v_latents(tmp),
                                          max_batches=12)
        print("t2v_latents", table["t2v_latents"])
        table["t2v_pixels"] = bench_path("t2v_pixels",
                                         _make_t2v_pixels(tmp, n=12),
                                         max_batches=4)
        print("t2v_pixels", table["t2v_pixels"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    with open(f"{ROOT}/loader_vs_step.json", "w") as f:
        json.dump(table, f, indent=1)
    print(f"\nrecorded -> {ROOT}/loader_vs_step.json\n")
    print("| path | batch | loader sync (b/s) | +prefetch (b/s) | "
          "chip (steps/s) | eff sync | eff prefetch | starves? |")
    print("|---|---|---|---|---|---|---|---|")
    for k, r in table.items():
        print(f"| {k} | {r['batch']} | {r['sync_batches_per_s']} | "
              f"{r['prefetch_batches_per_s']} | {r['chip_steps_per_s']} | "
              f"{r['eff_steps_per_s_sync']} | {r['eff_steps_per_s_prefetch']} |"
              f" {'YES' if r['starves_prefetch'] else 'no'} |")


if __name__ == "__main__":
    sys.exit(main())
