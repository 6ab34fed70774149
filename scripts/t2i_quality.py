"""Closed t2i caption-control loop (VERDICT r3 next-step #5).

The t2v loop proved caption control for video (0.992 vs 0.273 chance); this
is the IMAGE analog over the same zero-egress stand-ins: the quality loop's
16-class shape/color dataset (quality_loop.render) tokenized by its trained
VQ-8, per-class deterministic pseudo-T5 caption features (left-pad-120
contract, all-valid mask), a t2i GPT (model_type="t2i",
ref autoregressive/train/train_t2i.py + the t2i mask semantics
generate.py:156-165), sampling through the real generate() t2i path, and
scoring with (a) a transparent pixel-space COLOR classifier (4-way), (b)
16-way nearest-class-centroid accuracy in random-init InceptionV3 features,
(c) rFID-random vs the loop's reference batch.

Prereqs (chip_chain3 phase C): results_quality/{train_images,train_labels}
.npy, codes/, checkpoints/ (VQ-8), ref_batch.npz.

Stages (one per invocation — chip runs stay under shell timeouts):
  python scripts/t2i_quality.py data
  python scripts/t2i_quality.py train   [--steps 3000]
  python scripts/t2i_quality.py sample  [--tag trained|random_init|uncond]
  python scripts/t2i_quality.py score
Results accumulate in results_t2i/quality_table.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QROOT = os.path.join(REPO, "results_quality")
ROOT = os.path.join(REPO, "results_t2i")
SIZE, N_CLASSES = 64, 16
CAP_DIM, CLS_TOK = 512, 120
N_SAMPLES = 2048

COLORS = np.array([[220, 40, 40], [40, 200, 60], [60, 80, 230],
                   [235, 200, 40]], np.float32)   # quality_loop palette
SHAPES = ["circle", "square", "triangle", "star"]
COLOR_NAMES = ["red", "green", "blue", "yellow"]


def captions():
    return [f"a {COLOR_NAMES[c % 4]} {SHAPES[c // 4]}"
            for c in range(N_CLASSES)]


def caption_features() -> np.ndarray:
    """(16, CLS_TOK, CAP_DIM) deterministic pseudo-T5 features, one fixed
    embedding per class (stands in for T5(caption) under zero egress; the
    model must learn the class <-> feature association for caption
    control)."""
    feats = [np.random.RandomState(9_000 + c).randn(CLS_TOK, CAP_DIM) * 0.5
             for c in range(N_CLASSES)]
    return np.stack(feats).astype(np.float32)


def _gpt_cfg(args):
    from video_llamagen_tpu.core.config import gpt_config
    return gpt_config(args.gpt_model, vocab_size=16384, block_size=64,
                      cls_token_num=CLS_TOK, caption_dim=CAP_DIM,
                      model_type="t2i", dtype="bfloat16")


def _record(key, value):
    os.makedirs(ROOT, exist_ok=True)
    path = f"{ROOT}/quality_table.json"
    table = {}
    if os.path.exists(path):
        with open(path) as f:
            table = json.load(f)
    table[key] = value
    with open(path, "w") as f:
        json.dump(table, f, indent=1)
    print(f"recorded {key} -> {value}")


def stage_data(args):
    os.makedirs(ROOT, exist_ok=True)
    np.save(f"{ROOT}/caption_feats.npy", caption_features())
    with open(f"{ROOT}/captions.json", "w") as f:
        json.dump(captions(), f, indent=1)
    print(f"caption features {caption_features().shape} -> {ROOT}")


def stage_train(args):
    import jax
    import jax.numpy as jnp
    from video_llamagen_tpu.core.config import MeshConfig, TrainConfig
    from video_llamagen_tpu.core.checkpoint import CheckpointManager
    from video_llamagen_tpu.core.logging import create_logger
    from video_llamagen_tpu.data.datasets import build_attn_mask
    from video_llamagen_tpu.parallel import mesh as pmesh
    from video_llamagen_tpu.train.train_state import (create_train_state,
                                                      train_state_shardings)
    from video_llamagen_tpu.train.train_t2i import make_t2i_train_step

    if not os.path.exists(f"{ROOT}/caption_feats.npy"):
        stage_data(args)
    logger = create_logger(ROOT)
    cfg = _gpt_cfg(args)
    tcfg = TrainConfig(lr=args.lr, weight_decay=5e-2, grad_clip=1.0,
                       global_batch_size=args.batch, log_every=25)
    mesh = pmesh.make_mesh(MeshConfig())
    state = create_train_state(jax.random.key(0), cfg, tcfg)
    shardings = train_state_shardings(state, mesh)
    state = jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s),
                                   state, shardings)
    step_fn = make_t2i_train_step(cfg, tcfg, mesh, shardings)

    # codes from the quality loop's extract stage, labels from its dataset
    code_dir = f"{QROOT}/codes/imagenet{SIZE}_codes"
    label_dir = f"{QROOT}/codes/imagenet{SIZE}_labels"
    files = sorted(os.listdir(code_dir))
    codes = np.stack([np.load(os.path.join(code_dir, f)) for f in files])
    if codes.ndim == 3:                      # (N, aug, L) -> no-flip variant
        codes = codes[:, 0]
    labels = np.array([int(np.ravel(np.load(os.path.join(label_dir, f)))[0])
                       for f in files], np.int64)
    feats = np.load(f"{ROOT}/caption_feats.npy")
    seq = CLS_TOK + cfg.block_size
    mask = np.broadcast_to(
        build_attn_mask(seq, np.ones(CLS_TOK, np.float32), CLS_TOK),
        (args.batch, 1, seq, seq))
    mask_j = jnp.asarray(mask)
    valid = jnp.ones((args.batch,), jnp.float32)
    logger.info(f"t2i quality train: {args.gpt_model} seq={seq} "
                f"n={len(codes)} steps={args.steps}")

    ckpt = CheckpointManager(f"{ROOT}/checkpoints")
    rng = jax.random.key(1)
    rs = np.random.RandomState(2)
    running, last_t = 0.0, time.time()
    for step in range(1, args.steps + 1):
        idx = rs.randint(0, len(codes), args.batch)
        batch = {"codes": jnp.asarray(codes[idx].astype(np.int32)),
                 "t5_feat": jnp.asarray(feats[labels[idx]]),
                 "attn_mask": mask_j, "valid": valid}
        state, metrics = step_fn(state, batch, rng)
        running += float(metrics["loss"])
        if step % 25 == 0:
            dt = time.time() - last_t
            logger.info(f"step {step} loss {running / 25:.4f} "
                        f"steps/s {25 / dt:.2f}")
            running, last_t = 0.0, time.time()
    ckpt.save(args.steps, state._asdict())
    ckpt.wait()
    logger.info(f"saved {ROOT}/checkpoints step {args.steps}")


def stage_sample(args):
    import jax
    import jax.numpy as jnp
    from video_llamagen_tpu.core.config import vq_config
    from video_llamagen_tpu.core.checkpoint import (load_params_subtree,
                                                    load_vq_orbax)
    from video_llamagen_tpu.inference.generate import generate
    from video_llamagen_tpu.models import gpt as gpt_mod
    from video_llamagen_tpu.tokenizers.vq import model as vq

    cfg = _gpt_cfg(args)
    if args.tag == "random_init":
        # zero-init head (reference parity) -> all-zero logits -> uniform
        # top-k sampling: exactly the "random trunk" baseline we want
        params = gpt_mod.cast_params(
            gpt_mod.init_gpt_params(jax.random.key(123), cfg), jnp.bfloat16)
    else:
        sds = jax.eval_shape(
            lambda k: gpt_mod.init_gpt_params(k, cfg), jax.random.key(0))
        params = load_params_subtree(f"{ROOT}/checkpoints", sds,
                                     dtype="bfloat16")
        print(f"loaded trained t2i params from {ROOT}/checkpoints")

    feats = np.load(f"{ROOT}/caption_feats.npy")
    vcfg = vq_config("VQ-8", dtype="bfloat16")
    vparams = load_vq_orbax(f"{QROOT}/checkpoints", vcfg, dtype="bfloat16")

    rng = jax.random.key(args.seed)
    per = args.per_batch
    imgs, labels_all = [], []
    n_done = 0
    while n_done < args.num_samples:
        labels = (np.arange(n_done, n_done + per) % N_CLASSES).astype(np.int32)
        if args.tag == "uncond":
            un = np.asarray(gpt_mod.uncond_caption_embedding(params))
            cond = np.broadcast_to(un[None], (per, CLS_TOK, CAP_DIM)).copy()
        else:
            cond = feats[labels]
        rng, r = jax.random.split(rng)
        toks = generate(params, cfg, jnp.asarray(cond), r, cfg.block_size,
                        cfg_scale=args.cfg_scale, temperature=1.0,
                        top_k=1000)
        dec = vq.decode_code(vparams, vcfg, toks, latent_hw=(8, 8))
        imgs.append(np.asarray(jnp.clip(127.5 * dec + 128.0, 0, 255)
                               ).astype(np.uint8))
        labels_all.append(labels)
        n_done += per
        print(f"{n_done}/{args.num_samples}", flush=True)
    np.save(f"{ROOT}/samples_{args.tag}.npy", np.concatenate(imgs))
    np.save(f"{ROOT}/samples_{args.tag}_labels.npy",
            np.concatenate(labels_all))
    print(f"wrote {ROOT}/samples_{args.tag}.npy")


def classify_color(imgs: np.ndarray) -> np.ndarray:
    """4-way dominant-shape-color classifier (transparent, pixel space).

    The background is dim (<=90 + gradient) while shapes are drawn at
    0.8-1.1x of a saturated palette color — count near-palette pixels."""
    x = imgs.astype(np.float32)                          # (N, H, W, 3)
    d = np.linalg.norm(x[:, :, :, None] - COLORS[None, None, None], axis=-1)
    near = d < 70.0                                      # (N, H, W, 4)
    return near.sum((1, 2)).argmax(-1)


def stage_score(args):
    import jax
    import jax.numpy as jnp
    from video_llamagen_tpu.evals.inception import (init_inception_params,
                                                    inception_forward)
    from video_llamagen_tpu.evals import evaluator

    train = np.load(f"{QROOT}/train_images.npy")[:2048]
    train_labels = np.load(f"{QROOT}/train_labels.npy")[:2048]
    table = {}
    pred = classify_color(train)
    table["color_classifier_acc_real"] = float(
        (pred == (train_labels % 4)).mean())

    ip = init_inception_params(jax.random.key(0))

    def feats_of(u8):
        out = []
        fwd = jax.jit(lambda x: inception_forward(ip, x)[0])
        for i in range(0, len(u8), 64):
            x = jnp.asarray(u8[i:i + 64].astype(np.float32) / 255.0)
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
            out.append(np.asarray(fwd(x)))
        return np.concatenate(out)

    print("computing train features (random-init InceptionV3)...")
    tf = feats_of(train)
    centroids = np.stack([tf[train_labels == c].mean(0)
                          for c in range(N_CLASSES)])

    for tag in args.tags:
        path = f"{ROOT}/samples_{tag}.npy"
        if not os.path.exists(path):
            print(f"skip {tag} (no {path})")
            continue
        samp = np.load(path)
        labels = np.load(f"{ROOT}/samples_{tag}_labels.npy")
        rec = {}
        rec["color_control_acc"] = float(
            (classify_color(samp) == (labels % 4)).mean())
        sf = feats_of(samp)
        d = np.linalg.norm(sf[:, None] - centroids[None], axis=-1)
        rec["centroid_control_acc_16way"] = float(
            (d.argmin(1) == labels).mean())
        np.savez(f"{ROOT}/samples_{tag}.npz", arr_0=samp)
        res = evaluator.main([f"{QROOT}/ref_batch.npz",
                              f"{ROOT}/samples_{tag}.npz"])
        if isinstance(res, dict):
            rec["rfid_random"] = round(float(res["fid"]), 4)
        table[tag] = rec
        print(tag, rec)

    for k, v in table.items():
        _record(k, v)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("stage", choices=["data", "train", "sample", "score"])
    p.add_argument("--gpt-model", default="GPT-B")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--tag", default="trained",
                   choices=["trained", "random_init", "uncond"])
    p.add_argument("--tags", nargs="+",
                   default=["trained", "random_init", "uncond"])
    p.add_argument("--num-samples", type=int, default=N_SAMPLES)
    p.add_argument("--per-batch", type=int, default=64)
    p.add_argument("--cfg-scale", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    globals()[f"stage_{args.stage}"](args)


if __name__ == "__main__":
    sys.exit(main())
