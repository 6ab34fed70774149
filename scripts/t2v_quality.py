"""Closed t2v quality loop: train a video GPT that measurably works
(VERDICT r2 next-step #1).

Zero-egress stand-in for the captioned-video flow the reference gestures at
but never measures (autoregressive/train/train_t2v.py:274-342 ships a
mid-training latent->mp4 debug roundtrip; sample/sample_t2v_1f_diff.py is the
flagship sampler; no quality number exists upstream): a 4-class procedural
moving-shape video dataset with per-class caption features, the round-2
trained CausalVAE (results_vae_ms, 64px/9f), the video GPT trained on its
latents, sampling through the real generate_ar/maskgit loops, and scoring
with (a) FVD-random — Fréchet distance over random-init spatiotemporal
Inception features, a valid distribution distance whose absolute value is not
comparable to published FVD (same protocol as the image loop's rFID-random),
(b) a transparent pixel-space (color, motion-direction) classifier for
caption control, and (c) feature-space nearest-class-centroid control.

Deliverable: results_t2v/quality/quality_table.json where the TRAINED model
beats the random-init trunk on every metric and class-conditioning is
demonstrated (samples follow their caption's class).

Stages (one per invocation — chip runs stay under shell timeouts):
  python scripts/t2v_quality.py data
  python scripts/t2v_quality.py latents
  python scripts/t2v_quality.py train   [--head diff --steps 3000]
  python scripts/t2v_quality.py sample  [--head diff | --random-init | --uncond]
  python scripts/t2v_quality.py score
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "results_t2v", "quality")
SIZE, FRAMES = 64, 9
CAP_DIM, CLS_TOK = 512, 120
N_TRAIN, N_VAL, N_PER_CLASS = 2048, 256, 32

# class = (name, square?, RGB color, unit direction)
CLASSES = [
    ("a red square moving right",   True,  (220, 40, 40),  (1, 0)),
    ("a green circle moving down",  False, (40, 200, 60),  (0, 1)),
    ("a blue square moving up",     True,  (60, 80, 230),  (0, -1)),
    ("a yellow circle moving left", False, (235, 200, 40), (-1, 0)),
]
COLOR_ARR = np.array([c[2] for c in CLASSES], np.float32) / 127.5 - 1.0


def render_clip(cls: int, rs: np.random.RandomState) -> np.ndarray:
    """(FRAMES, SIZE, SIZE, 3) float32 in [-1, 1]."""
    _, square, color_u8, (dx, dy) = CLASSES[cls]
    color = np.asarray(color_u8, np.float32) / 127.5 - 1.0
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    g = rs.rand() * 2 * np.pi
    base = rs.rand(3) * 0.5 - 0.75
    grad = (np.cos(g) * xx + np.sin(g) * yy) / SIZE
    bg = base[None, None] + grad[..., None] * (rs.rand(3) * 0.3 - 0.15)
    r = rs.uniform(SIZE * 0.14, SIZE * 0.22)
    speed = rs.uniform(1.5, 3.0)
    # start so the full trajectory stays in frame
    travel = speed * (FRAMES - 1)
    lo_x = r + max(0.0, -dx * travel)
    hi_x = SIZE - r - max(0.0, dx * travel)
    lo_y = r + max(0.0, -dy * travel)
    hi_y = SIZE - r - max(0.0, dy * travel)
    cx = rs.uniform(lo_x, max(lo_x + 1, hi_x))
    cy = rs.uniform(lo_y, max(lo_y + 1, hi_y))
    out = np.empty((FRAMES, SIZE, SIZE, 3), np.float32)
    for t in range(FRAMES):
        px, py = cx + dx * speed * t, cy + dy * speed * t
        ddx, ddy = xx - px, yy - py
        mask = (np.maximum(np.abs(ddx), np.abs(ddy)) <= r) if square \
            else (ddx * ddx + ddy * ddy <= r * r)
        out[t] = np.where(mask[..., None], color[None, None], bg)
    return np.clip(out, -1, 1)


def caption_features() -> np.ndarray:
    """(4, CLS_TOK, CAP_DIM) deterministic pseudo-T5 features, one fixed
    embedding per class (stands in for T5(caption) under zero egress; the
    model must learn the class <-> feature association for caption control)."""
    feats = [np.random.RandomState(7_000 + c).randn(CLS_TOK, CAP_DIM) * 0.5
             for c in range(len(CLASSES))]
    return np.stack(feats).astype(np.float32)


def _u8(x):
    return np.clip(127.5 * x + 128.0, 0, 255).astype(np.uint8)


def _tag(args):
    """Run tag: head (+_shuffle) (+_<model> for non-default trunks) — keys
    the gpt_<tag> checkpoint dir and samples_<tag> artifacts, so a GPT-L
    scale-up row (VERDICT r3 #6) never clobbers the GPT-B run."""
    t = args.head + ("_shuffle" if args.shuffle_tokens else "")
    if args.gpt_model != "GPT-B":
        t += "_" + args.gpt_model.replace("GPT-", "").lower()
    return t


def _gpt_cfg(args):
    from video_llamagen_tpu.core.config import gpt_config
    return gpt_config(args.gpt_model, vocab_size=16384, block_size=64,
                      cls_token_num=CLS_TOK, caption_dim=CAP_DIM,
                      model_type="t2v", vae_embed_dim=4, num_frames=FRAMES,
                      t_downsample_size=4, diffusion_batch_mul=4,
                      num_sampling_steps="100", video_head=args.head,
                      dtype="bfloat16", remat=True)


VAE_DIR = os.environ.get("T2VQ_VAE_DIR", "results_vae_ms2")


def _vae():
    from video_llamagen_tpu.core.config import CausalVAEConfig
    from video_llamagen_tpu.core.checkpoint import load_vae_orbax
    vcfg = CausalVAEConfig(hidden_size=64)
    params = load_vae_orbax(os.path.join(os.path.dirname(ROOT), "..",
                                         VAE_DIR, "checkpoints"), vcfg)
    return params, vcfg


def stage_data(args):
    os.makedirs(ROOT, exist_ok=True)
    rs = np.random.RandomState(0)
    labels = (np.arange(N_TRAIN) % len(CLASSES)).astype(np.int64)
    clips = np.stack([render_clip(int(l), rs) for l in labels])
    np.save(f"{ROOT}/train_clips.npy", _u8(clips))
    np.save(f"{ROOT}/train_labels.npy", labels)
    # held-out val: fresh RandomState stream disjoint from training draws
    rs_val = np.random.RandomState(10 ** 6)
    val_labels = (np.arange(N_VAL) % len(CLASSES)).astype(np.int64)
    val = np.stack([render_clip(int(l), rs_val) for l in val_labels])
    np.save(f"{ROOT}/val_clips.npy", _u8(val))
    np.save(f"{ROOT}/val_labels.npy", val_labels)
    np.save(f"{ROOT}/caption_feats.npy", caption_features())
    print(f"data: {clips.shape} train, {val.shape} val -> {ROOT}")


def stage_latents(args):
    import jax
    import jax.numpy as jnp
    from video_llamagen_tpu.tokenizers.causal_vae import model as cvae
    params, vcfg = _vae()
    scale = None
    for split in ("train", "val"):
        clips = np.load(f"{ROOT}/{split}_clips.npy").astype(np.float32) \
            / 127.5 - 1.0
        outs = []
        t0 = time.perf_counter()
        for i in range(0, len(clips), 32):
            z = cvae.encode_mode_jit(params, vcfg,
                                     jnp.asarray(clips[i:i + 32]))
            outs.append(np.asarray(z, np.float32))
        z = np.concatenate(outs)                       # (N, 3, 8, 8, 4)
        if scale is None:
            # SD-style global scale factor: the diffusion head models the
            # normalized latents, so its N(0,1) prior matches (train split
            # defines the scale; decode multiplies it back)
            scale = float(z.std())
            with open(f"{ROOT}/latent_stats.json", "w") as f:
                json.dump({"scale": scale}, f)
        np.save(f"{ROOT}/{split}_latents.npy",
                (z / scale).reshape(len(z), -1, z.shape[-1]))
        print(f"{split}: latents {z.shape} std {z.std():.3f} "
              f"(scale {scale:.3f}) in {time.perf_counter()-t0:.1f}s")


def stage_train(args):
    import jax
    import jax.numpy as jnp
    from video_llamagen_tpu.core.config import MeshConfig, TrainConfig
    from video_llamagen_tpu.core.checkpoint import CheckpointManager
    from video_llamagen_tpu.core.logging import create_logger
    from video_llamagen_tpu.parallel import mesh as pmesh
    from video_llamagen_tpu.train.train_video import (
        create_video_train_state, make_video_train_step, video_state_shardings)

    tag = _tag(args)
    outdir = f"{ROOT}/gpt_{tag}"
    logger = create_logger(outdir)
    cfg = _gpt_cfg(args)
    tcfg = TrainConfig(lr=args.lr, weight_decay=5e-2, grad_clip=1.0,
                       global_batch_size=args.batch, log_every=25,
                       ckpt_every=args.steps)
    mesh = pmesh.make_mesh(MeshConfig())
    state = create_video_train_state(jax.random.key(0), cfg, tcfg)
    shardings = video_state_shardings(state, mesh)
    state = jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s),
                                   state, shardings)
    step_fn = make_video_train_step(cfg, tcfg, mesh, shardings,
                                    shuffle_tokens=args.shuffle_tokens)

    latents = np.load(f"{ROOT}/train_latents.npy")     # (N, 192, 4)
    labels = np.load(f"{ROOT}/train_labels.npy")
    feats = np.load(f"{ROOT}/caption_feats.npy")
    logger.info(f"t2v quality train: {args.gpt_model} head={tag} "
                f"seq={latents.shape[1]} n={len(latents)} steps={args.steps}")
    ckpt = CheckpointManager(f"{outdir}/checkpoints")
    rng = jax.random.key(1)
    rs = np.random.RandomState(2)
    running, last_t = 0.0, time.time()
    for step in range(1, args.steps + 1):
        idx = rs.randint(0, len(latents), args.batch)
        batch = {"latents": jnp.asarray(latents[idx]),
                 "cond": jnp.asarray(feats[labels[idx]])}
        state, metrics = step_fn(state, batch, rng)
        running += float(metrics["loss"])
        if step % 25 == 0:
            dt = time.time() - last_t
            logger.info(f"step {step} loss {running / 25:.4f} "
                        f"steps/s {25 / dt:.2f}")
            running, last_t = 0.0, time.time()
    ckpt.save(args.steps, state._asdict())
    ckpt.wait()
    # params-only host-side pickle: sampling restores THIS instead of the
    # full orbax state (orbax restore over the axon tunnel re-uploads the
    # whole f32 state to device, ~25 min for GPT-B; params alone as numpy
    # round-trip from local disk in seconds)
    host_params = jax.tree_util.tree_map(lambda x: np.asarray(x),
                                         state.params)
    np.save(f"{outdir}/params.npy", np.asarray([host_params], dtype=object),
            allow_pickle=True)
    logger.info(f"saved {outdir}/checkpoints step {args.steps} + params.npy")


def _load_trained(args, cfg):
    import jax
    tag = _tag(args)
    pkl = f"{ROOT}/gpt_{tag}/params.npy"
    if os.path.exists(pkl):
        params = np.load(pkl, allow_pickle=True)[0]
        print(f"restored gpt_{tag} params.npy (host pickle)")
        return params
    from video_llamagen_tpu.core.checkpoint import CheckpointManager
    from video_llamagen_tpu.core.config import TrainConfig
    from video_llamagen_tpu.train.train_video import create_video_train_state
    template = create_video_train_state(jax.random.key(0), cfg,
                                        TrainConfig(lr=1e-4))
    ckpt = CheckpointManager(f"{ROOT}/gpt_{tag}/checkpoints")
    state = ckpt.restore(template)
    print(f"restored gpt_{tag} step {int(state.step)}")
    return state.params


def stage_export(args):
    """Orbax full state -> params-only params.npy, ON CPU (a device restore
    over the axon tunnel re-uploads ~GBs; the CPU platform restores from
    local disk in seconds)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from video_llamagen_tpu.core.checkpoint import CheckpointManager
    from video_llamagen_tpu.core.config import TrainConfig
    from video_llamagen_tpu.train.train_video import create_video_train_state
    tag = _tag(args)
    cfg = _gpt_cfg(args)
    template = create_video_train_state(jax.random.key(0), cfg,
                                        TrainConfig(lr=1e-4))
    ckpt = CheckpointManager(f"{ROOT}/gpt_{tag}/checkpoints")
    state = ckpt.restore(template)
    host = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params)
    np.save(f"{ROOT}/gpt_{tag}/params.npy",
            np.asarray([host], dtype=object), allow_pickle=True)
    print(f"exported gpt_{tag} step {int(state.step)} -> params.npy")


def stage_sample(args):
    import jax
    import jax.numpy as jnp
    from video_llamagen_tpu.inference import generate_video as gen
    from video_llamagen_tpu.models import gpt_video
    from video_llamagen_tpu.tokenizers.causal_vae import model as cvae

    cfg = _gpt_cfg(args)
    if args.random_init:
        params = gpt_video.init_video_gpt_params(jax.random.key(123), cfg)
        tag = "random"
    else:
        params = _load_trained(args, cfg)
        tag = _tag(args)
    if args.uncond:
        tag += "_uncond"
    import jax.tree_util as jtu
    params = jtu.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    feats = np.load(f"{ROOT}/caption_feats.npy")
    vae_params, vcfg = _vae()
    lat_scale = 1.0
    if os.path.exists(f"{ROOT}/latent_stats.json"):
        with open(f"{ROOT}/latent_stats.json") as f:
            lat_scale = json.load(f)["scale"]
    all_frames, all_labels, all_latents = [], [], []
    rng = jax.random.key(args.seed)
    for c in range(len(CLASSES)):
        if args.uncond:
            from video_llamagen_tpu.models import gpt
            un = np.asarray(gpt.uncond_caption_embedding(params), np.float32)
            cond = jnp.asarray(np.tile(un[None], (N_PER_CLASS, 1, 1)))
            cfg_scale = 1.0
        else:
            cond = jnp.asarray(np.tile(feats[c][None], (N_PER_CLASS, 1, 1)))
            cfg_scale = args.cfg_scale
        rng, r = jax.random.split(rng)
        t0 = time.perf_counter()
        if args.head == "mask_diff":
            lat = gen.generate_maskgit(params, cfg, cond, r, num_iter=32,
                                       cfg_scale=cfg_scale)
        elif args.head == "mse":
            lat = gen.generate_ar_mse(params, cfg, cond)
        else:
            lat = gen.generate_ar(params, cfg, cond, r, cfg_scale=cfg_scale)
        lat = np.asarray(lat, np.float32)   # normalized latent space
        z = (lat * lat_scale).reshape(N_PER_CLASS, cfg.vae_t, 8, 8, 4)
        frames = np.asarray(cvae.decode_jit(vae_params, vcfg, jnp.asarray(z)))
        print(f"class {c}: sampled+decoded in {time.perf_counter()-t0:.1f}s")
        all_frames.append(_u8(frames))
        all_latents.append(lat)
        all_labels.extend([c] * N_PER_CLASS)
        if args.uncond:
            # unconditional: one batch is enough for the cond-vs-uncond check
            break
    np.save(f"{ROOT}/samples_{tag}.npy", np.concatenate(all_frames))
    np.save(f"{ROOT}/samples_{tag}_labels.npy", np.asarray(all_labels))
    np.save(f"{ROOT}/samples_{tag}_latents.npy", np.concatenate(all_latents))
    print(f"wrote samples_{tag}.npy {np.concatenate(all_frames).shape}")
    _write_grid(np.concatenate(all_frames), f"{ROOT}/grid_{tag}.png")


def _write_grid(frames_u8: np.ndarray, path: str, per: int = 8):
    """First/mid/last frame of `per` clips per class row."""
    from PIL import Image
    rows = []
    n_rows = max(1, len(frames_u8) // N_PER_CLASS)
    for c in range(n_rows):
        clips = frames_u8[c * N_PER_CLASS:(c * N_PER_CLASS) + per]
        row = np.concatenate(
            [np.concatenate([cl[0], cl[FRAMES // 2], cl[-1]], axis=1)
             for cl in clips], axis=1)
        rows.append(row)
    Image.fromarray(np.concatenate(rows, axis=0)).save(path)


# ---------------------------------------------------------------------------
# Scoring
# ---------------------------------------------------------------------------

def classify_pixels(clips_u8: np.ndarray) -> np.ndarray:
    """Transparent (color, direction) classifier -> class ids (N,).

    Object mask = pixels closest to one of the 4 class colors AND far from
    the frame median (background); color = nearest class color among masked
    pixels; direction = dominant axis of the masked-centroid displacement."""
    n = len(clips_u8)
    out = np.zeros(n, np.int64)
    x = clips_u8.astype(np.float32) / 127.5 - 1.0
    for i in range(n):
        clip = x[i]                                   # (T, H, W, 3)
        # distance of each pixel to each class color
        d = np.linalg.norm(clip[..., None, :] - COLOR_ARR[None, None, None],
                           axis=-1)                   # (T, H, W, 4)
        dmin = d.min(-1)
        thresh = np.percentile(dmin, 8)               # object ~ 3-15% of frame
        mask = dmin <= max(thresh, 0.45)
        if mask.sum() < 10:
            mask = dmin <= np.percentile(dmin, 8)
        color_votes = d.argmin(-1)[mask]
        color_k = np.bincount(color_votes, minlength=4).argmax()
        # per-frame centroid of the masked region
        cys, cxs = [], []
        for t in range(clip.shape[0]):
            m = mask[t]
            if m.sum() < 5:
                cys.append(np.nan)
                cxs.append(np.nan)
                continue
            ys_, xs_ = np.nonzero(m)
            cys.append(ys_.mean())
            cxs.append(xs_.mean())
        cys, cxs = np.asarray(cys), np.asarray(cxs)
        ok = np.isfinite(cys)
        if ok.sum() >= 2:
            t_idx = np.nonzero(ok)[0]
            vy = np.polyfit(t_idx, cys[ok], 1)[0]
            vx = np.polyfit(t_idx, cxs[ok], 1)[0]
        else:
            vy = vx = 0.0
        dirs = np.array([[1, 0], [0, 1], [0, -1], [-1, 0]], np.float32)
        dir_k = int((dirs @ np.array([vx, vy])).argmax())
        # combine: among classes, prefer matching color; break ties by motion
        scores = np.zeros(4)
        for c, (_, _, _, dvec) in enumerate(CLASSES):
            scores[c] = 2.0 * (c == color_k) + 1.0 * (c == dir_k)
        out[i] = scores.argmax()
    return out


def _st_features(clips_u8: np.ndarray, batch: int = 64) -> np.ndarray:
    """Random-init spatiotemporal features for FVD-random: per-frame
    random-Inception pool3, per-clip [time-mean, mean |temporal delta|]."""
    import jax
    from video_llamagen_tpu.evals.inception import (
        init_inception_params, extract_fid_features)
    params = init_inception_params(jax.random.key(0))
    n, t = clips_u8.shape[:2]
    flat = clips_u8.reshape(n * t, *clips_u8.shape[2:])
    pool = extract_fid_features(params, flat, batch)["pool3"]
    pool = pool.reshape(n, t, -1)
    return np.concatenate([pool.mean(1),
                           np.abs(np.diff(pool, axis=1)).mean(1)], axis=1)


def stage_score(args):
    from video_llamagen_tpu.evals.fvd import fvd_from_features

    val = np.load(f"{ROOT}/val_clips.npy")
    val_labels = np.load(f"{ROOT}/val_labels.npy")
    table = {}

    # classifier sanity ceiling on real held-out clips
    pred = classify_pixels(val)
    table["classifier_acc_real_val"] = float((pred == val_labels).mean())

    print("computing val features (random-Inception spatiotemporal)...")
    val_feats = _st_features(val)
    centroids = np.stack([val_feats[val_labels == c].mean(0)
                          for c in range(len(CLASSES))])

    for tag in args.tags:
        path = f"{ROOT}/samples_{tag}.npy"
        if not os.path.exists(path):
            print(f"skip {tag} (no {path})")
            continue
        samp = np.load(path)
        labels = np.load(f"{ROOT}/samples_{tag}_labels.npy")
        rec = {}
        pred = classify_pixels(samp)
        rec["caption_control_acc"] = float((pred == labels).mean())
        rec["class_histogram"] = np.bincount(pred, minlength=4).tolist()
        feats = _st_features(samp)
        rec["fvd_random"] = round(float(
            fvd_from_features(val_feats, feats)), 2)
        # feature-space caption control: nearest val-class centroid
        d = np.linalg.norm(feats[:, None] - centroids[None], axis=-1)
        rec["centroid_control_acc"] = float((d.argmin(1) == labels).mean())
        table[tag] = rec
        print(tag, rec)

    path = f"{ROOT}/quality_table.json"
    cur = {}
    if os.path.exists(path):
        with open(path) as f:
            cur = json.load(f)
    cur.update(table)
    with open(path, "w") as f:
        json.dump(cur, f, indent=1)
    print(f"recorded -> {path}")


def stage_sampleall(args):
    """Trained-cond + random-init + uncond rows then score, in ONE process so
    the jit cache is shared (per-row processes each pay the ~8 min compile)."""
    import copy
    for tweak in ({}, {"random_init": True}, {"uncond": True}):
        a = copy.copy(args)
        for k, v in tweak.items():
            setattr(a, k, v)
        print(f"=== sample {tweak or 'trained'} ===", flush=True)
        stage_sample(a)
    stage_score(args)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("stage", choices=["data", "latents", "train", "export",
                                     "sample", "sampleall", "score"])
    p.add_argument("--gpt-model", default="GPT-B")
    p.add_argument("--head", default="diff",
                   choices=["diff", "mse", "mask_diff", "mask_mse"])
    p.add_argument("--shuffle-tokens", action="store_true")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--cfg-scale", type=float, default=3.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--random-init", action="store_true",
                   help="sample from a random-init trunk (the baseline row)")
    p.add_argument("--uncond", action="store_true",
                   help="sample with the trained null embedding, cfg 1.0")
    p.add_argument("--tags", nargs="+",
                   default=["diff", "random", "diff_uncond"],
                   help="sample sets to score")
    args = p.parse_args()
    globals()[f"stage_{args.stage}"](args)


if __name__ == "__main__":
    sys.exit(main())
