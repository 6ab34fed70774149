"""c2i GPT training CLI — the trainer the reference references but lost.

scripts/autoregressive/train_c2i.sh:7 invokes train_c2i.py which is absent
upstream (SURVEY.md §2.1); this provides it, TPU-native: pjit over a
(data, fsdp, tp) mesh covers both the DDP path and the FSDP path
(gpt.py:388-389's get_fsdp_wrap_module_list intent) with one code path.

Trains on precomputed VQ codes (dataset/imagenet.py build_imagenet_code
layout) or synthetic data for smoke runs.

Usage:
  python -m video_llamagen_tpu.train.train_c2i --gpt-model GPT-B \
      --code-path /data/imagenet_codes --results-dir ./results \
      --data 4 --fsdp 2
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import MeshConfig, TrainConfig, gpt_config
from ..core.checkpoint import CheckpointManager, resume_arithmetic
from ..core.logging import create_logger
from ..data.datasets import ImageNetCodeDataset, BatchIterator
from ..parallel import mesh as pmesh
from .train_state import create_train_state, make_train_step, train_state_shardings


class SyntheticCodes:
    """Random codes/labels for smoke tests (no data dependency)."""

    def __init__(self, n: int, seq_len: int, vocab: int, num_classes: int):
        self.n, self.seq_len, self.vocab, self.num_classes = (
            n, seq_len, vocab, num_classes)

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rs = np.random.RandomState(idx)
        return {"codes": rs.randint(0, self.vocab, self.seq_len).astype(np.int32),
                "label": np.int32(rs.randint(0, self.num_classes))}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gpt-model", default="GPT-B")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--downsample-size", type=int, default=16)
    p.add_argument("--vocab-size", type=int, default=16384)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--code-path", default=None,
                   help="precomputed code dir; synthetic data if omitted")
    p.add_argument("--results-dir", default="./results")
    p.add_argument("--cloud-save-path", default=None)
    p.add_argument("--global-batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=5e-2)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.95)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--global-seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--ckpt-every", type=int, default=5000)
    p.add_argument("--max-keep", type=int, default=5,
                   help="checkpoints retained (orbax max_to_keep); raise for "
                        "FID-vs-steps sweeps that sample old steps")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--mixed-precision", default="bf16", choices=["bf16", "none"])
    p.add_argument("--data", type=int, default=1, help="data mesh axis")
    p.add_argument("--fsdp", type=int, default=1, help="fsdp mesh axis")
    p.add_argument("--tp", type=int, default=1, help="tensor mesh axis")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline stages (n_layer % pp == 0); GPipe rotation "
                        "schedule over the pp mesh axis (parallel/pp.py)")
    p.add_argument("--microbatches", type=int, default=None,
                   help="pipeline microbatches (default: pp); bubble is "
                        "(pp-1)/(microbatches+pp-1)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--resume-params", action="store_true",
                   help="fast resume: restore ONLY the params subtree "
                        "(host-side, ~6x less tunnel upload than the full "
                        "f32 state) and rebuild a fresh optimizer state; "
                        "step is restored so schedules/epochs align")
    p.add_argument("--no-remat", action="store_true",
                   help="disable per-block rematerialization (uses more HBM)")
    p.add_argument("--force-platform", default=None,
                   help="override jax platform (e.g. cpu); combine with "
                   "XLA_FLAGS=--xla_force_host_platform_device_count=N")
    args = p.parse_args(argv)

    if args.force_platform:
        jax.config.update("jax_platforms", args.force_platform)

    logger = create_logger(args.results_dir)
    latent = args.image_size // args.downsample_size
    cfg = gpt_config(args.gpt_model, vocab_size=args.vocab_size,
                     block_size=latent ** 2, num_classes=args.num_classes,
                     cls_token_num=1, model_type="c2i",
                     dtype="bfloat16" if args.mixed_precision == "bf16"
                     else "float32", remat=not args.no_remat)
    tcfg = TrainConfig(lr=args.lr, weight_decay=args.weight_decay,
                       beta1=args.beta1, beta2=args.beta2,
                       grad_clip=args.max_grad_norm, epochs=args.epochs,
                       global_batch_size=args.global_batch_size,
                       global_seed=args.global_seed, ema=args.ema,
                       log_every=args.log_every, ckpt_every=args.ckpt_every)
    mcfg = MeshConfig(data=args.data, fsdp=args.fsdp, tp=args.tp, pp=args.pp)
    mesh = pmesh.make_mesh(mcfg)
    microbatches = args.microbatches or args.pp
    logger.info(f"mesh {mcfg.shape} over {mcfg.num_devices} devices; "
                f"model {args.gpt_model} seq {cfg.block_size}"
                + (f"; pp={args.pp} microbatches={microbatches}"
                   if args.pp > 1 else ""))

    state = create_train_state(jax.random.key(args.global_seed), cfg, tcfg)
    shardings = train_state_shardings(state, mesh, pp=args.pp > 1)
    state = jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s),
                                   state, shardings)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info(f"GPT parameters: {n_params / 1e6:.1f}M")

    step_fn = make_train_step(cfg, tcfg, mesh, shardings,
                              pp=args.pp, microbatches=microbatches)

    ckpt = CheckpointManager(f"{args.results_dir}/checkpoints",
                             args.cloud_save_path, max_to_keep=args.max_keep)
    if args.resume_params and ckpt.latest_step() is not None:
        from ..core.checkpoint import load_gpt_orbax
        t0 = time.time()
        params = load_gpt_orbax(f"{args.results_dir}/checkpoints", cfg)
        params = jax.tree_util.tree_map(jax.device_put, params,
                                        shardings.params)
        s = ckpt.latest_step()
        repl = dict(params=params, step=jnp.asarray(s, jnp.int32))
        if state.ema_params is not None:
            # restore the EMA subtree too (falls back to params if the
            # checkpoint trained without --ema): leaving ema_params at the
            # fresh random init corrupts ~1/(1-decay) steps of EMA-weight
            # sampling/checkpoints after every fast resume
            eparams = load_gpt_orbax(f"{args.results_dir}/checkpoints",
                                     cfg, ema=True)
            repl["ema_params"] = jax.tree_util.tree_map(
                jax.device_put, eparams, shardings.params)
        state = state._replace(**repl)
        logger.info(f"fast-resumed params from step {s} "
                    f"(fresh opt state) in {time.time() - t0:.1f}s")
    elif args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        logger.info(f"resumed from step {int(state.step)}")

    if args.code_path:
        ds = ImageNetCodeDataset(args.code_path, args.image_size)
    else:
        ds = SyntheticCodes(args.global_batch_size * 4, cfg.block_size,
                            cfg.vocab_size, cfg.num_classes)
        logger.info("using synthetic codes (smoke mode)")
    loader = BatchIterator(ds, args.global_batch_size, seed=args.global_seed)

    arith = resume_arithmetic(int(state.step), len(ds), args.global_batch_size)
    rng = jax.random.key(args.global_seed + 1)
    running_loss, last_t = 0.0, time.time()
    steps_done = int(state.step)

    for epoch in range(arith["start_epoch"], args.epochs):
        loader.set_epoch(epoch)
        for batch_np in loader:
            codes = jnp.asarray(batch_np["codes"])
            batch = {
                "idx": codes[:, :-1],
                "cond": jnp.asarray(batch_np["label"]),
                "targets": codes,
            }
            batch = {k: jax.device_put(v, pmesh.data_sharding(mesh, v.ndim))
                     for k, v in batch.items()}
            state, metrics = step_fn(state, batch, rng)
            steps_done += 1
            running_loss += float(metrics["loss"])
            if steps_done % tcfg.log_every == 0:
                dt = time.time() - last_t
                logger.info(
                    f"step {steps_done} epoch {epoch} "
                    f"loss {running_loss / tcfg.log_every:.4f} "
                    f"steps/s {tcfg.log_every / dt:.2f}")
                running_loss, last_t = 0.0, time.time()
            if steps_done % tcfg.ckpt_every == 0:
                ckpt.save(steps_done, state._asdict())
                logger.info(f"saved checkpoint at step {steps_done}")
            if args.max_steps and steps_done >= args.max_steps:
                ckpt.wait()
                logger.info("max steps reached")
                return state
    ckpt.wait()
    return state


if __name__ == "__main__":
    main()
