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
                          lpips_params: Optional[Any] = None) -> VQTrainState:
    r1, r2 = jax.random.split(rng)
    params = vq.init_vq_params(r1, cfg)
    disc_params = vql.init_patchgan_params(r2, input_nc=cfg.in_channels)
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
                        disc_weight: float = 0.5):
    """Returns (generator_step, discriminator_step) — the two optimizer passes
    of each reference iteration (vq_train.py:184-216)."""
    optimizer = make_vq_optimizer(tcfg)
    data_sh = pmesh.data_sharding(mesh, 4)
    repl = pmesh.replicated(mesh)

    def gen_loss_fn(params, state: VQTrainState, images):
        recons, codebook_losses, _ = vq.forward(params, cfg, images, train=True)
        loss, parts = vql.generator_loss(
            state.disc_params, state.lpips_params, images, recons,
            codebook_losses, state.step,
            perceptual_weight=perceptual_weight,
            disc_weight=disc_weight, disc_start=disc_start)
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
                disc_start=disc_start)
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
