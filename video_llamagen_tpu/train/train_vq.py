"""VQ tokenizer GAN training: dual optimizers, disc warmup, EMA — pjit.

Replaces reference tokenizer/tokenizer_image/vq_train.py (DDP, two Adam
optimizers + two GradScalers, disc_start=20000, EMA option, dual-path
checkpoints) with two compiled steps (generator / discriminator) over the
(data, fsdp) mesh. bf16 + f32 masters make the GradScalers unnecessary.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..core.config import TrainConfig, VQConfig
from ..parallel import mesh as pmesh
from ..tokenizers.vq import model as vq
from ..tokenizers.vq import losses as vql


class VQTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any            # generator (VQ model)
    opt_state: Any
    disc_params: Any
    disc_opt_state: Any
    ema_params: Optional[Any]
    lpips_params: Optional[Any]   # frozen


def make_vq_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """Adam lr 1e-4, betas (0.9, 0.95) (ref vq_train.py:110-111)."""
    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adam(tcfg.lr, b1=tcfg.beta1, b2=tcfg.beta2),
    )


def create_vq_train_state(rng: jax.Array, cfg: VQConfig, tcfg: TrainConfig,
                          lpips_params: Optional[Any] = None,
                          disc_type: str = "patchgan",
                          image_size: int = 256) -> VQTrainState:
    r1, r2 = jax.random.split(rng)
    params = vq.init_vq_params(r1, cfg)
    disc_params = vql.init_disc_params(r2, disc_type,
                                       input_nc=cfg.in_channels,
                                       image_size=image_size)
    opt = make_vq_optimizer(tcfg)
    ema = jax.tree_util.tree_map(jnp.copy, params) if tcfg.ema else None
    return VQTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt.init(params),
        disc_params=disc_params,
        disc_opt_state=opt.init(disc_params),
        ema_params=ema,
        lpips_params=lpips_params,
    )


def make_vq_train_steps(cfg: VQConfig, tcfg: TrainConfig, mesh: Mesh,
                        disc_start: int = 20000,
                        perceptual_weight: float = 1.0,
                        disc_weight: float = 0.5,
                        disc_type: str = "patchgan",
                        disc_loss_type: str = "hinge",
                        disc_adaptive_weight: bool = False):
    """Returns (generator_step, discriminator_step) — the two optimizer passes
    of each reference iteration (vq_train.py:184-216)."""
    optimizer = make_vq_optimizer(tcfg)
    data_sh = pmesh.data_sharding(mesh, 4)
    repl = pmesh.replicated(mesh)

    def gen_loss_fn(params, state: VQTrainState, images):
        adaptive = None
        if disc_adaptive_weight:
            recons, codebook_losses, _, prehead = vq.forward_with_prehead(
                params, cfg, images, train=True)
            adaptive = (vq.decoder_head, prehead,
                        params["decoder"]["conv_out"])
        else:
            recons, codebook_losses, _ = vq.forward(params, cfg, images,
                                                    train=True)
        loss, parts = vql.generator_loss(
            state.disc_params, state.lpips_params, images, recons,
            codebook_losses, state.step,
            perceptual_weight=perceptual_weight,
            disc_weight=disc_weight, disc_start=disc_start,
            disc_type=disc_type, adaptive=adaptive)
        return loss, (parts, recons)

    def gen_step(state: VQTrainState, images):
        (loss, (parts, recons)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.params, state, images)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = tcfg.ema_decay
            ema = jax.tree_util.tree_map(lambda e, p: e * d + p * (1 - d),
                                         ema, params)
        metrics = {"gen_total": loss, **parts}
        return state._replace(params=params, opt_state=opt_state,
                              ema_params=ema), recons, metrics

    def disc_step(state: VQTrainState, images, recons):
        def loss_fn(disc_params):
            loss, parts = vql.discriminator_loss(
                disc_params, images, recons, state.step,
                disc_start=disc_start, disc_loss_type=disc_loss_type,
                disc_type=disc_type)
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.disc_params)
        updates, opt_state = optimizer.update(grads, state.disc_opt_state,
                                              state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates)
        return state._replace(disc_params=disc_params,
                              disc_opt_state=opt_state,
                              step=state.step + 1), parts

    gen_jit = jax.jit(gen_step, in_shardings=(None, data_sh),
                      donate_argnums=(0,))
    disc_jit = jax.jit(disc_step, in_shardings=(None, data_sh, data_sh),
                       donate_argnums=(0,))
    return gen_jit, disc_jit


def train_iteration(state: VQTrainState, images, gen_jit, disc_jit):
    """One full reference iteration: generator pass then discriminator pass."""
    state, recons, gen_metrics = gen_jit(state, images)
    state, disc_metrics = disc_jit(state, images, recons)
    return state, {**gen_metrics, **disc_metrics}


def main(argv=None):
    """CLI (ref tokenizer/tokenizer_image/vq_train.py:36-316 surface)."""
    import argparse
    import time

    import numpy as np

    from ..core.config import MeshConfig
    from ..core.logging import create_logger

    p = argparse.ArgumentParser()
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--global-batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--disc-start", type=int, default=20000)
    p.add_argument("--disc-weight", type=float, default=0.5)
    p.add_argument("--disc-type", choices=["patchgan", "stylegan"],
                   default="patchgan",
                   help="discriminator architecture (ref vq_train.py:294)")
    p.add_argument("--disc-loss", choices=["hinge", "vanilla",
                                           "non-saturating"], default="hinge",
                   help="discriminator loss (ref vq_train.py:295)")
    p.add_argument("--disc-adaptive-weight", action="store_true",
                   help="balance adv vs NLL grad norms at the decoder last "
                        "layer (ref vq_loss.py:109-115) — damps the disc "
                        "blowing up reconstruction quality")
    p.add_argument("--perceptual-weight", type=float, default=1.0)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="EMA decay override. The TrainConfig default (0.9999, "
                        "~10k-step time constant) leaves short runs' EMA "
                        "dominated by the random init — the round-4 4k-step "
                        "VQ-16 run evaluated 16.0 dB via EMA vs ~22 dB raw. "
                        "Use ~0.999 for runs of a few thousand steps.")
    p.add_argument("--data", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--results-dir", default="./results_vq")
    p.add_argument("--lpips-weights", default=None,
                   help="npz of converted VGG/LPIPS weights")
    p.add_argument("--data-npy", default=None,
                   help="uint8 (N,H,W,3) npy dataset; random data if omitted")
    p.add_argument("--ckpt-every", type=int, default=0,
                   help="save an orbax checkpoint every N steps (0 = only at "
                        "the end when --data-npy is set)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--force-platform", default=None)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize enc/dec blocks in backward (fits "
                        "batch 32 @256 in 16G HBM; ~1.3x step compute)")
    args = p.parse_args(argv)

    if args.force_platform:
        jax.config.update("jax_platforms", args.force_platform)

    from ..core.config import vq_config
    logger = create_logger(args.results_dir)
    if args.smoke:
        cfg = VQConfig(ch=8, z_channels=8, codebook_size=64,
                       codebook_embed_dim=4, encoder_ch_mult=(1, 2),
                       decoder_ch_mult=(1, 2), num_res_blocks=1,
                       dtype="float32")
        size = 32
    else:
        cfg = vq_config(args.vq_model, remat=args.remat)
        size = args.image_size
    ema_kw = ({"ema_decay": args.ema_decay}
              if args.ema_decay is not None else {})
    tcfg = TrainConfig(lr=args.lr, global_batch_size=args.global_batch_size,
                       ema=args.ema, log_every=args.log_every, **ema_kw)
    mesh = pmesh.make_mesh(MeshConfig(data=args.data, fsdp=args.fsdp))

    lpips_params = None
    if args.lpips_weights:
        lpips_params = vql.load_lpips_npz(args.lpips_weights)
    state = create_vq_train_state(jax.random.key(0), cfg, tcfg, lpips_params,
                                  disc_type=args.disc_type, image_size=size)
    gen_jit, disc_jit = make_vq_train_steps(
        cfg, tcfg, mesh, disc_start=args.disc_start,
        perceptual_weight=args.perceptual_weight if lpips_params else 0.0,
        disc_weight=args.disc_weight, disc_type=args.disc_type,
        disc_loss_type=args.disc_loss,
        disc_adaptive_weight=args.disc_adaptive_weight)

    ckpt = None
    if args.data_npy or args.ckpt_every:
        from ..core.checkpoint import CheckpointManager
        ckpt = CheckpointManager(f"{args.results_dir}/checkpoints")
        if args.resume and ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            logger.info(f"resumed VQ training from step {int(state.step)}")

    data = None
    if args.data_npy:
        data = np.load(args.data_npy)          # uint8 (N, H, W, 3)
        assert data.dtype == np.uint8 and data.shape[1] == size, data.shape
        logger.info(f"dataset: {data.shape[0]} images @{size} "
                    f"({args.data_npy})")

    def next_batch(step: int) -> np.ndarray:
        rs = np.random.RandomState(step)
        if data is None:
            return (rs.rand(args.global_batch_size, size, size, 3)
                    .astype(np.float32) * 2 - 1)
        idx = rs.randint(0, data.shape[0], args.global_batch_size)
        imgs = data[idx].astype(np.float32) / 127.5 - 1.0
        flips = rs.rand(len(idx)) < 0.5       # hflip aug (ref vq_train data)
        imgs[flips] = imgs[flips, :, ::-1]
        return imgs

    steps = int(state.step) if hasattr(state, "step") else 0
    last_t = time.time()
    logger.info(f"VQ-GAN training {args.vq_model} @{size}")
    while args.max_steps is None or steps < args.max_steps:
        images = jax.device_put(jnp.asarray(next_batch(steps)),
                                pmesh.data_sharding(mesh, 4))
        state, metrics = train_iteration(state, images, gen_jit, disc_jit)
        steps += 1
        if steps % args.log_every == 0:
            dt = time.time() - last_t
            logger.info(f"step {steps} rec {float(metrics['rec']):.4f} "
                        f"vq {float(metrics['vq']):.4f} "
                        f"disc {float(metrics['disc']):.4f} "
                        f"d_w {float(metrics['d_weight']):.4f} "
                        f"steps/s {args.log_every / dt:.2f}")
            last_t = time.time()
        if ckpt is not None and args.ckpt_every \
                and steps % args.ckpt_every == 0:
            ckpt.save(steps, state._asdict())
    if ckpt is not None:
        ckpt.save(steps, state._asdict())
        ckpt.wait()
        logger.info(f"saved final VQ checkpoint at step {steps}")
    return state


if __name__ == "__main__":
    main()
