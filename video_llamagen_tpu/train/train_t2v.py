"""t2v training CLI (ref autoregressive/train/train_t2v.py surface).

Trains the video GPT (any of the three heads, --video-head) on precomputed
CausalVAE latents (t2v_load_npy parity) or online-encoded video with a frozen
VAE, over the (data, fsdp, tp) mesh. Synthetic smoke mode without data.
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import CausalVAEConfig, MeshConfig, TrainConfig, gpt_config
from ..core.checkpoint import CheckpointManager
from ..core.logging import create_logger
from ..data.datasets import T2VLatentDataset, BatchIterator
from ..parallel import mesh as pmesh
from .train_video import (create_video_train_state, make_video_train_step,
                          video_state_shardings)


class SyntheticLatents:
    def __init__(self, n, seq_len, vae_dim, cls_token_num, caption_dim):
        self.n, self.seq_len, self.vae_dim = n, seq_len, vae_dim
        self.cls_token_num, self.caption_dim = cls_token_num, caption_dim

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rs = np.random.RandomState(idx)
        return {
            "latents": rs.randn(self.seq_len, self.vae_dim).astype(np.float32),
            "t5_feat": rs.randn(self.cls_token_num,
                                self.caption_dim).astype(np.float32),
        }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gpt-model", default="GPT-B")
    p.add_argument("--video-head", default="diff",
                   choices=["mse", "diff", "mask_diff", "mask_mse"])
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--downsample-size", type=int, default=8)
    p.add_argument("--num-frames", type=int, default=17)
    p.add_argument("--t-downsample-size", type=int, default=4)
    p.add_argument("--vae-embed-dim", type=int, default=4)
    p.add_argument("--cls-token-num", type=int, default=120)
    p.add_argument("--caption-dim", type=int, default=2048)
    p.add_argument("--diffusion-batch-mul", type=int, default=4)
    p.add_argument("--latent-root", default=None)
    p.add_argument("--video-meta-info-file", default=None)
    p.add_argument("--t5-path", default=None)
    p.add_argument("--results-dir", default="./results_t2v")
    p.add_argument("--cloud-save-path", default=None)
    p.add_argument("--global-batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=5e-2)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--global-seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--ckpt-every", type=int, default=5000)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--data", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline stages (n_layer % pp == 0); GPipe "
                        "rotation schedule (parallel/pp.py)")
    p.add_argument("--microbatches", type=int, default=None,
                   help="pipeline microbatches (default: pp)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--resume-params", action="store_true",
                   help="fast resume: params subtree only (host restore, "
                        "~6x less tunnel upload), fresh optimizer state")
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--shuffle-tokens", action="store_true",
                   help="mse head: batch-shared random token-order training "
                        "(ref gpt_video.py:374-401)")
    p.add_argument("--profile", default=None,
                   help="dir for a jax.profiler trace of steps 3-6 "
                   "(ref train_t2v_profiler.py)")
    p.add_argument("--force-platform", default=None)
    args = p.parse_args(argv)

    if args.force_platform:
        jax.config.update("jax_platforms", args.force_platform)

    logger = create_logger(args.results_dir)
    latent = args.image_size // args.downsample_size
    cfg = gpt_config(args.gpt_model, vocab_size=16384, block_size=latent ** 2,
                     cls_token_num=args.cls_token_num,
                     caption_dim=args.caption_dim, model_type="t2v",
                     vae_embed_dim=args.vae_embed_dim,
                     num_frames=args.num_frames,
                     t_downsample_size=args.t_downsample_size,
                     diffusion_batch_mul=args.diffusion_batch_mul,
                     video_head=args.video_head, remat=not args.no_remat)
    tcfg = TrainConfig(lr=args.lr, weight_decay=args.weight_decay,
                       grad_clip=args.max_grad_norm, epochs=args.epochs,
                       global_batch_size=args.global_batch_size,
                       global_seed=args.global_seed, ema=args.ema,
                       log_every=args.log_every, ckpt_every=args.ckpt_every)
    mesh = pmesh.make_mesh(MeshConfig(data=args.data, fsdp=args.fsdp,
                                      tp=args.tp, pp=args.pp))
    microbatches = args.microbatches or args.pp
    seq_len = latent ** 2 * cfg.vae_t
    logger.info(f"t2v {args.gpt_model} head={args.video_head} seq={seq_len}"
                + (f" pp={args.pp} microbatches={microbatches}"
                   if args.pp > 1 else ""))

    state = create_video_train_state(jax.random.key(args.global_seed), cfg, tcfg)
    shardings = video_state_shardings(state, mesh, pp=args.pp > 1)
    state = jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s),
                                   state, shardings)
    step_fn = make_video_train_step(cfg, tcfg, mesh, shardings,
                                    shuffle_tokens=args.shuffle_tokens,
                                    pp=args.pp, microbatches=microbatches)

    ckpt = CheckpointManager(f"{args.results_dir}/checkpoints",
                             args.cloud_save_path)
    if args.resume_params and ckpt.latest_step() is not None:
        from ..core.checkpoint import load_params_subtree
        t0 = time.time()
        sds = jax.eval_shape(lambda k: create_video_train_state(
            k, cfg, tcfg), jax.random.key(0)).params
        params = load_params_subtree(f"{args.results_dir}/checkpoints", sds)
        params = jax.tree_util.tree_map(jax.device_put, params,
                                        shardings.params)
        s = ckpt.latest_step()
        repl = dict(params=params, step=jnp.asarray(s, jnp.int32))
        if state.ema_params is not None:
            # restore the EMA subtree too (falls back to params when the
            # checkpoint has none) — see train_c2i.py fast-resume note
            eparams = load_params_subtree(
                f"{args.results_dir}/checkpoints", sds, ema=True)
            repl["ema_params"] = jax.tree_util.tree_map(
                jax.device_put, eparams, shardings.params)
        state = state._replace(**repl)
        logger.info(f"fast-resumed params from step {s} "
                    f"(fresh opt state) in {time.time() - t0:.1f}s")
    elif args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        logger.info(f"resumed from step {int(state.step)}")

    if args.latent_root:
        ds = T2VLatentDataset(args.latent_root, args.video_meta_info_file,
                              args.t5_path)
    else:
        ds = SyntheticLatents(args.global_batch_size * 4, seq_len,
                              args.vae_embed_dim, args.cls_token_num,
                              args.caption_dim)
        logger.info("using synthetic latents (smoke mode)")
    loader = BatchIterator(ds, args.global_batch_size, seed=args.global_seed)

    rng = jax.random.key(args.global_seed + 1)
    steps_done = int(state.step)
    running, last_t = 0.0, time.time()

    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        for batch_np in loader:
            if args.profile and steps_done == 3:
                jax.profiler.start_trace(args.profile)
            batch = {
                "latents": jnp.asarray(batch_np["latents"]),
                "cond": jnp.asarray(batch_np["t5_feat"]),
            }
            batch = {k: jax.device_put(v, pmesh.data_sharding(mesh, v.ndim))
                     for k, v in batch.items()}
            state, metrics = step_fn(state, batch, rng)
            steps_done += 1
            running += float(metrics["loss"])
            if args.profile and steps_done == 6:
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {args.profile}")
            if steps_done % tcfg.log_every == 0:
                dt = time.time() - last_t
                logger.info(f"step {steps_done} loss {running / tcfg.log_every:.4f} "
                            f"steps/s {tcfg.log_every / dt:.2f}")
                running, last_t = 0.0, time.time()
            if steps_done % tcfg.ckpt_every == 0:
                ckpt.save(steps_done, state._asdict())
            if args.max_steps and steps_done >= args.max_steps:
                ckpt.wait()
                logger.info("max steps reached")
                return state
    ckpt.wait()
    return state


if __name__ == "__main__":
    main()
