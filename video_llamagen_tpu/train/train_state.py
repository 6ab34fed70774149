"""Sharded training state + compiled train step (DP / FSDP / TP via one mesh).

Replaces the reference's DDP/FSDP/DeepSpeed trio (train_t2v.py:243,
gpt.py:388-389, utils/deepspeed.py) with a single pjit program: parameters are
laid out by parallel/mesh.py rules, the batch is split over (data, fsdp), and
XLA inserts all-reduces/all-gathers on ICI. Optimizer matches the reference's
fused AdamW with 2D-parameter-only weight decay (train_t2v.py:53-75) plus
global-norm clipping and optional EMA (utils/ema.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import GPTConfig, TrainConfig
from ..models import gpt
from ..parallel import mesh as pmesh


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any]


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW; weight decay only on >=2D params (ref train_t2v.py:53-75)."""

    def decay_mask(params):
        return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)

    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adamw(tcfg.lr, b1=tcfg.beta1, b2=tcfg.beta2,
                    weight_decay=tcfg.weight_decay, mask=decay_mask),
    )


def create_train_state(rng: jax.Array, cfg: GPTConfig, tcfg: TrainConfig) -> TrainState:
    params = gpt.init_gpt_params(rng, cfg)
    opt_state = make_optimizer(tcfg).init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params) if tcfg.ema else None
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state, ema)


def train_state_shardings(state: TrainState, mesh: Mesh,
                          pp: bool = False) -> TrainState:
    """NamedShardings for every leaf: params by rule; opt-state mirrors params.

    With pp=True the stacked `layers` leaves shard their leading (layer) axis
    over the `pp` mesh axis (stage-major; parallel/pp.py) — optimizer moments
    and EMA inherit the same layout, so every stage's AdamW update stays local.
    """
    if pp:
        from ..parallel.pp import pp_param_shardings
        p_sh = pp_param_shardings(state.params, mesh)
    else:
        p_sh = pmesh.param_shardings(state.params, mesh)

    def opt_sharding(leaf):
        # moments have param shapes; scalars/counters replicate.
        flat_p = {tuple(x.shape): s for x, s in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(p_sh))}
        return flat_p.get(tuple(leaf.shape), pmesh.replicated(mesh))

    o_sh = jax.tree_util.tree_map(opt_sharding, state.opt_state)
    e_sh = p_sh if state.ema_params is not None else None
    return TrainState(pmesh.replicated(mesh), p_sh, o_sh, e_sh)


def make_train_step(cfg: GPTConfig, tcfg: TrainConfig, mesh: Mesh,
                    state_shardings: TrainState,
                    pp: int = 1, microbatches: int = 1):
    """Compiled c2i/t2i train step: loss -> grads -> AdamW -> (EMA).

    pp > 1 runs the layer stack as a pp-stage GPipe schedule with
    `microbatches` microbatches (parallel/pp.py) — pair with
    train_state_shardings(..., pp=True) so stages own their layers."""
    optimizer = make_optimizer(tcfg)
    data_sh = lambda ndim: pmesh.data_sharding(mesh, ndim)

    def loss_fn(params, batch, rng):
        if pp > 1:
            from ..parallel.pp import pipeline_forward
            _, loss = pipeline_forward(params, cfg, batch["idx"], batch["cond"],
                                       targets=batch["targets"],
                                       valid=batch.get("valid"),
                                       mask=batch.get("mask"),
                                       rng=rng, train=True,
                                       num_stages=pp,
                                       num_microbatches=microbatches,
                                       mesh=mesh)
        else:
            _, loss = gpt.forward(params, cfg, batch["idx"], batch["cond"],
                                  targets=batch["targets"],
                                  valid=batch.get("valid"),
                                  mask=batch.get("mask"),
                                  rng=rng, train=True)
        return loss

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = tcfg.ema_decay
            ema = jax.tree_util.tree_map(lambda e, p: e * d + p * (1 - d),
                                         ema, params)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm}
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    batch_shardings = {
        "idx": data_sh(2), "cond": data_sh(1), "targets": data_sh(2),
    }
    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, batch_shardings, None),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )
