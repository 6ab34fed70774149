"""t2i GPT training: online VQ tokenize + caption-conditioned CE — pjit.

Parity with reference autoregressive/train/train_t2i.py: frozen VQ encoder
produces token ids per step (train_t2i.py:186-191), captions enter as
precomputed left-padded T5 features with the forced-diagonal attention mask
(dataset contract), CE loss with `valid` weighting, bf16, AdamW with 2D-decay
grouping. torch.compile/DDP/GradScaler are replaced by one jitted step.
"""

from __future__ import annotations

import argparse
import time
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..core.config import GPTConfig, MeshConfig, TrainConfig, VQConfig, gpt_config
from ..core.logging import create_logger
from ..models import gpt
from ..parallel import mesh as pmesh
from ..tokenizers.vq import model as vq
from .train_state import TrainState, create_train_state, make_optimizer, \
    train_state_shardings


def make_t2i_train_step(cfg: GPTConfig, tcfg: TrainConfig, mesh: Mesh,
                        state_shardings: TrainState,
                        vq_cfg: Optional[VQConfig] = None,
                        online_tokenize: bool = False):
    """Batch: {"t5_feat": (B,120,D), "attn_mask": (B,1,S,S), "valid": (B,)}
    plus {"codes": (B,L)} or (online) {"images": (B,H,W,3)}."""
    optimizer = make_optimizer(tcfg)

    def loss_fn(params, codes, cond, mask, valid, rng):
        _, loss = gpt.forward(params, cfg, codes[:, :-1], cond, targets=codes,
                              mask=mask, valid=valid, rng=rng, train=True)
        return loss

    def step_fn(state: TrainState, batch, rng: jax.Array, vq_params=None):
        rng = jax.random.fold_in(rng, state.step)
        if online_tokenize:
            codes = vq.encode_indices(jax.lax.stop_gradient(vq_params),
                                      vq_cfg, batch["images"])
        else:
            codes = batch["codes"]
        mask = batch.get("attn_mask")
        if mask is not None:
            # dataset masks cover cls+L; training feeds cls+L-1 tokens
            # (ref train_t2i.py:204 slices [:, :, :-1, :-1])
            mask = mask[:, :, :-1, :-1]
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, codes, batch["t5_feat"], mask,
            batch.get("valid"), rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = tcfg.ema_decay
            ema = jax.tree_util.tree_map(lambda e, p: e * d + p * (1 - d),
                                         ema, params)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    data_sh = lambda nd: pmesh.data_sharding(mesh, nd)
    batch_sh: Dict[str, Any] = {"t5_feat": data_sh(3), "attn_mask": data_sh(4),
                                "valid": data_sh(1)}
    if online_tokenize:
        batch_sh["images"] = data_sh(4)
        return jax.jit(step_fn,
                       in_shardings=(state_shardings, batch_sh, None, None),
                       out_shardings=(state_shardings, None),
                       donate_argnums=(0,))
    batch_sh["codes"] = data_sh(2)

    def step_fn_codes(state, batch, rng):
        return step_fn(state, batch, rng)

    return jax.jit(step_fn_codes,
                   in_shardings=(state_shardings, batch_sh, None),
                   out_shardings=(state_shardings, None),
                   donate_argnums=(0,))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gpt-model", default="GPT-XL")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--downsample-size", type=int, default=16)
    p.add_argument("--cls-token-num", type=int, default=120)
    p.add_argument("--caption-dim", type=int, default=2048)
    p.add_argument("--global-batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--data", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--results-dir", default="./results_t2i")
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--force-platform", default=None)
    args = p.parse_args(argv)

    if args.force_platform:
        jax.config.update("jax_platforms", args.force_platform)

    logger = create_logger(args.results_dir)
    latent = args.image_size // args.downsample_size
    block = latent ** 2
    cfg = gpt_config(args.gpt_model, vocab_size=16384, block_size=block,
                     cls_token_num=args.cls_token_num,
                     caption_dim=args.caption_dim, model_type="t2i",
                     remat=not args.no_remat)
    tcfg = TrainConfig(lr=args.lr,
                       global_batch_size=args.global_batch_size,
                       log_every=args.log_every)
    mesh = pmesh.make_mesh(MeshConfig(data=args.data, fsdp=args.fsdp,
                                      tp=args.tp))
    state = create_train_state(jax.random.key(0), cfg, tcfg)
    shardings = train_state_shardings(state, mesh)
    state = jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s),
                                   state, shardings)
    step_fn = make_t2i_train_step(cfg, tcfg, mesh, shardings)

    # synthetic smoke data with the dataset's mask contract
    from ..data.datasets import build_attn_mask
    rng = jax.random.key(1)
    b = args.global_batch_size
    seq = args.cls_token_num + block
    steps = 0
    last_t = time.time()
    logger.info(f"t2i {args.gpt_model} seq={seq} (synthetic smoke data)")
    while args.max_steps is None or steps < args.max_steps:
        rs = np.random.RandomState(steps)
        emb_mask = np.ones((args.cls_token_num,), np.float32)
        emb_mask[: rs.randint(0, 20)] = 0
        mask = np.broadcast_to(
            build_attn_mask(seq, emb_mask, args.cls_token_num),
            (b, 1, seq, seq))
        batch = {
            "codes": jnp.asarray(rs.randint(0, 16384, (b, block)), jnp.int32),
            "t5_feat": jnp.asarray(rs.randn(b, args.cls_token_num,
                                            args.caption_dim), jnp.float32),
            "attn_mask": jnp.asarray(mask),
            "valid": jnp.ones((b,), jnp.float32),
        }
        batch = {k: jax.device_put(v, pmesh.data_sharding(mesh, v.ndim))
                 for k, v in batch.items()}
        state, metrics = step_fn(state, batch, rng)
        steps += 1
        if steps % args.log_every == 0:
            dt = time.time() - last_t
            logger.info(f"step {steps} loss {float(metrics['loss']):.4f} "
                        f"steps/s {args.log_every / dt:.2f}")
            last_t = time.time()
    return state


if __name__ == "__main__":
    main()
