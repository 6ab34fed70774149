"""CausalVideoVAE training: VAE-GAN with 3D discriminator — pjit.

Capability parity with the reference's CausalVideoVAE training setup
(trainer_videobase.py + losses/LPIPSWithDiscriminator3D + the accelerate
config): alternating generator/discriminator steps with KL + per-frame LPIPS
+ 3D adversarial loss, EMA option, all compiled over the (data, fsdp) mesh.
"""

from __future__ import annotations

import argparse
import time
from typing import Any, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..core.config import CausalVAEConfig, MeshConfig, TrainConfig
from ..core.logging import create_logger
from ..parallel import mesh as pmesh
from ..tokenizers.causal_vae import model as cvae
from ..tokenizers.causal_vae import losses as cvl


def moving_clips(rs: np.random.RandomState, b: int, t: int,
                 size: int) -> np.ndarray:
    """(b, t, size, size, 3) float32 in [-1, 1]: one colored shape translating
    over a smooth gradient background — structured, temporally-coherent stand-in
    for video data under zero egress (the noise default can't show the VAE
    learning anything)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    out = np.empty((b, t, size, size, 3), np.float32)
    for i in range(b):
        g = rs.rand() * 2 * np.pi
        base = rs.rand(3) * 0.5 - 0.6
        grad = (np.cos(g) * xx + np.sin(g) * yy) / size
        bg = base[None, None] + grad[..., None] * (rs.rand(3) * 0.4 - 0.2)
        color = rs.rand(3) * 1.2 - 0.1
        cx, cy = rs.uniform(size * 0.25, size * 0.75, 2)
        vx, vy = rs.uniform(-1.5, 1.5, 2) * size / 64.0
        r = rs.uniform(size * 0.12, size * 0.25)
        square = rs.rand() < 0.5
        for ti in range(t):
            dx, dy = xx - (cx + vx * ti), yy - (cy + vy * ti)
            mask = (np.maximum(np.abs(dx), np.abs(dy)) <= r) if square \
                else (dx * dx + dy * dy <= r * r)
            out[i, ti] = np.where(mask[..., None], color[None, None], bg)
    return np.clip(out, -1, 1)


class VAETrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    disc_params: Any
    disc_opt_state: Any
    logvar: jnp.ndarray
    ema_params: Optional[Any]


def create_vae_train_state(rng: jax.Array, cfg: CausalVAEConfig,
                           tcfg: TrainConfig) -> VAETrainState:
    r1, r2 = jax.random.split(rng)
    params = cvae.init_causal_vae_params(r1, cfg)
    disc = cvl.init_disc3d_params(r2)
    opt = optax.adam(tcfg.lr, b1=0.5, b2=0.9)  # ref perceptual-loss betas
    ema = jax.tree_util.tree_map(jnp.copy, params) if tcfg.ema else None
    return VAETrainState(jnp.zeros((), jnp.int32), params, opt.init(params),
                         disc, opt.init(disc), jnp.zeros(()), ema)


def make_vae_train_steps(cfg: CausalVAEConfig, tcfg: TrainConfig, mesh: Mesh,
                         disc_start: int = 50001, kl_weight: float = 1e-6,
                         lpips_params=None):
    opt = optax.adam(tcfg.lr, b1=0.5, b2=0.9)
    data_sh = pmesh.data_sharding(mesh, 5)

    def gen_step(state: VAETrainState, videos, rng):
        def loss_fn(params, logvar):
            post = cvae.encode(params, cfg, videos)
            z = post.sample(rng)
            rec = cvae.decode(params, cfg, z)
            total, parts = cvl.vae_generator_loss(
                state.disc_params, lpips_params, videos, rec, post.kl(),
                state.step, kl_weight=kl_weight, disc_start=disc_start,
                logvar=logvar)
            return total, (parts, rec)

        (loss, (parts, rec)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, state.logvar)
        g_params, g_logvar = grads
        updates, opt_state = opt.update(g_params, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        logvar = state.logvar - tcfg.lr * g_logvar
        ema = state.ema_params
        if ema is not None:
            d = tcfg.ema_decay
            ema = jax.tree_util.tree_map(lambda e, p: e * d + p * (1 - d),
                                         ema, params)
        return state._replace(params=params, opt_state=opt_state,
                              logvar=logvar, ema_params=ema), rec, \
            {"gen_total": loss, **parts}

    def disc_step(state: VAETrainState, videos, rec):
        def loss_fn(disc_params):
            return cvl.vae_discriminator_loss(disc_params, videos, rec,
                                              state.step,
                                              disc_start=disc_start)

        (loss, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.disc_params)
        updates, dopt = opt.update(grads, state.disc_opt_state,
                                   state.disc_params)
        disc = optax.apply_updates(state.disc_params, updates)
        return state._replace(disc_params=disc, disc_opt_state=dopt,
                              step=state.step + 1), parts

    return (jax.jit(gen_step, in_shardings=(None, data_sh, None),
                    donate_argnums=(0,)),
            jax.jit(disc_step, in_shardings=(None, data_sh, data_sh),
                    donate_argnums=(0,)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--hidden-size", type=int, default=128)
    p.add_argument("--num-frames", type=int, default=17)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--global-batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--disc-start", type=int, default=50001)
    p.add_argument("--kl-weight", type=float, default=1e-6)
    p.add_argument("--data", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--results-dir", default="./results_vae")
    p.add_argument("--force-platform", default=None)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize enc/dec blocks in backward")
    p.add_argument("--smoke", action="store_true",
                   help="tiny model + synthetic clips")
    p.add_argument("--moving-shapes", action="store_true",
                   help="train on structured moving-shape clips instead of "
                        "noise (seeded; roundtrip evals hold out seeds)")
    p.add_argument("--data-npy", default=None,
                   help="train on a uint8 (N,T,H,W,3) clip array instead of "
                        "synthesizing per step (per-step host rendering on the "
                        "single CPU core can starve the chip)")
    p.add_argument("--ckpt-every", type=int, default=0,
                   help="save an orbax checkpoint every N steps and at the "
                        "end (0 = no checkpointing)")
    args = p.parse_args(argv)

    if args.force_platform:
        jax.config.update("jax_platforms", args.force_platform)

    logger = create_logger(args.results_dir)
    if args.smoke:
        cfg = CausalVAEConfig(hidden_size=8, z_channels=2, embed_dim=2,
                              ch_mult=(1, 2), num_res_blocks=1,
                              time_downsample_levels=(0,), dtype="float32")
        frames, size = 5, 32
    else:
        cfg = CausalVAEConfig(hidden_size=args.hidden_size,
                              remat=args.remat)
        frames, size = args.num_frames, args.image_size
    tcfg = TrainConfig(lr=args.lr, global_batch_size=args.global_batch_size,
                       log_every=args.log_every)
    mesh = pmesh.make_mesh(MeshConfig(data=args.data, fsdp=args.fsdp))

    state = create_vae_train_state(jax.random.key(0), cfg, tcfg)
    gen_jit, disc_jit = make_vae_train_steps(cfg, tcfg, mesh,
                                             disc_start=args.disc_start,
                                             kl_weight=args.kl_weight)
    ckpt = None
    if args.ckpt_every:
        from ..core.checkpoint import CheckpointManager
        ckpt = CheckpointManager(f"{args.results_dir}/checkpoints")

    data = None
    if args.data_npy:
        data = np.load(args.data_npy).astype(np.float32) / 127.5 - 1.0
        logger.info(f"data-npy: {data.shape} clips from {args.data_npy}")

    rng = jax.random.key(1)
    steps = 0
    last_t = time.time()
    while args.max_steps is None or steps < args.max_steps:
        rs = np.random.RandomState(steps)
        if data is not None:
            idx = rs.randint(0, len(data), args.global_batch_size)
            videos = jnp.asarray(data[idx])
        elif args.moving_shapes:
            videos = jnp.asarray(moving_clips(rs, args.global_batch_size,
                                              frames, size))
        else:
            videos = jnp.asarray(
                rs.rand(args.global_batch_size, frames, size, size, 3)
                .astype(np.float32) * 2 - 1)
        videos = jax.device_put(videos, pmesh.data_sharding(mesh, 5))
        rng, r = jax.random.split(rng)
        state, rec, gm = gen_jit(state, videos, r)
        state, dm = disc_jit(state, videos, rec)
        steps += 1
        if steps % args.log_every == 0:
            dt = time.time() - last_t
            logger.info(
                f"step {steps} nll {float(gm['nll']):.4f} "
                f"kl {float(gm['kl']):.1f} disc {float(dm['disc']):.4f} "
                f"steps/s {args.log_every / dt:.2f}")
            last_t = time.time()
        if ckpt is not None and steps % args.ckpt_every == 0:
            ckpt.save(steps, state._asdict())
    if ckpt is not None:
        if ckpt.latest_step() != steps:
            ckpt.save(steps, state._asdict())
        ckpt.wait()
        logger.info(f"saved final VAE checkpoint at step {steps}")
    return state


if __name__ == "__main__":
    main()
