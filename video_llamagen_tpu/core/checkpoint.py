"""Orbax checkpointing: async save of {params, opt_state, step} + resume.

Replaces the reference's torch-pickle dicts with dual local/cloud writes
(vq_train.py:245-262, train_t2v.py:374-396) and its resume arithmetic
(train_t2v.py:225-234). EMA params are stored alongside and preferred on
restore-for-eval, mirroring the reference's "ema"-key preference
(sample_t2v_1f.py:102-109).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with an optional mirror dir."""

    def __init__(self, directory: str, mirror_directory: Optional[str] = None,
                 max_to_keep: int = 5, async_save: bool = True):
        self._dirs = [os.path.abspath(directory)]
        if mirror_directory:
            self._dirs.append(os.path.abspath(mirror_directory))
        opts = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                            enable_async_checkpointing=async_save)
        self._managers = [
            ocp.CheckpointManager(d, options=opts) for d in self._dirs
        ]

    def save(self, step: int, state: Any, metrics: Optional[Dict] = None):
        for m in self._managers:
            m.save(step, args=ocp.args.StandardSave(state),
                   metrics=metrics or {})

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        m = self._managers[0]
        step = step if step is not None else m.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dirs[0]}")
        # Explicit membership check: orbax raises a misleading "Must provide
        # `args` of type `Composite`" ValueError for a MISSING step (bit the
        # round-3 chip chain, results_chain/gptL_sample1000.log).
        if step not in m.all_steps():
            raise FileNotFoundError(
                f"step {step} not in {self._dirs[0]} "
                f"(available: {sorted(m.all_steps())})")
        return m.restore(step, args=ocp.args.StandardRestore(state_like))

    def latest_step(self) -> Optional[int]:
        return self._managers[0].latest_step()

    def wait(self):
        for m in self._managers:
            m.wait_until_finished()

    def close(self):
        for m in self._managers:
            m.close()


def resume_arithmetic(train_steps: int, dataset_len: int,
                      global_batch_size: int) -> Dict[str, int]:
    """Recover (start_epoch, start_step-in-epoch) from a global step counter
    (ref train_t2v.py:225-234)."""
    steps_per_epoch = max(dataset_len // global_batch_size, 1)
    return {
        "start_epoch": train_steps // steps_per_epoch,
        "resume_step_in_epoch": train_steps % steps_per_epoch,
        "steps_per_epoch": steps_per_epoch,
    }


def _restore_state_dict(directory: str, template: Dict[str, Any],
                        step: Optional[int]) -> Dict[str, Any]:
    mgr = CheckpointManager(directory, async_save=False)
    return mgr.restore(template, step=step)


def load_params_subtree(directory: str, params_sds: Any,
                        step: Optional[int] = None, ema: bool = False,
                        dtype: Optional[Any] = None) -> Any:
    """Params-only fast restore from a full train-state checkpoint
    (VERDICT r3 #7): partial-restores ONLY the params (or ema_params)
    subtree, to HOST numpy, optionally casts floats to `dtype` there, and
    uploads once via jnp.asarray.

    Why: a full GPT-B f32 train-state device restore (params + opt_state +
    ema, ~1.7 GB) takes ~25 min over the tunnel; params-only bf16 moves ~6x
    fewer bytes. `params_sds`: a ShapeDtypeStruct pytree of the params
    (jax.eval_shape over the init fn — no device work). `ema=True` prefers
    the EMA subtree and falls back to params (the reference's 'ema'-key
    preference, sample_t2v_1f.py:102-109)."""
    d = os.path.abspath(directory)
    mgr = ocp.CheckpointManager(d)
    try:
        s = step if step is not None else mgr.latest_step()
        if s is None:
            raise FileNotFoundError(f"no checkpoint in {d}")
        if s not in mgr.all_steps():
            raise FileNotFoundError(
                f"step {s} not in {d} (available: {sorted(mgr.all_steps())})")
        keys = ["ema_params", "params"] if ema else ["params"]
        last_err = None
        for key in keys:
            tmpl = {key: params_sds}
            rargs = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tmpl)
            try:
                host = mgr.restore(
                    s, args=ocp.args.PyTreeRestore(
                        item=tmpl, restore_args=rargs,
                        partial_restore=True))[key]
                break
            except Exception as e:   # ema trained off -> fall back to params
                last_err = e
        else:
            raise last_err
    finally:
        mgr.close()
    if dtype is not None:
        dt = jnp.dtype(dtype)
        host = jax.tree_util.tree_map(
            lambda x: x.astype(dt)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x, host)
    return jax.tree_util.tree_map(jnp.asarray, host)


def load_gpt_orbax(directory: str, cfg, step: Optional[int] = None,
                   ema: bool = False, dtype: Optional[Any] = None) -> Any:
    """Load GPT params from a train_c2i/train_t2i orbax checkpoint dir.

    The saved tree is TrainState._asdict() ({step, params, opt_state,
    ema_params}); only the params subtree is read (load_params_subtree —
    the full-state device restore cost ~25 min for GPT-B over the tunnel).
    `ema=True` prefers the EMA params; `dtype` casts on host pre-upload."""
    from ..models.gpt import init_gpt_params
    sds = jax.eval_shape(lambda k: init_gpt_params(k, cfg),
                         jax.random.key(0))
    return load_params_subtree(directory, sds, step=step, ema=ema,
                               dtype=dtype)


def load_vq_orbax(directory: str, vcfg, step: Optional[int] = None,
                  ema: bool = False, dtype: Optional[Any] = None) -> Any:
    """Load VQ generator params from a train_vq orbax checkpoint dir
    (params subtree only — see load_params_subtree)."""
    from ..tokenizers.vq.model import init_vq_params
    sds = jax.eval_shape(lambda k: init_vq_params(k, vcfg),
                         jax.random.key(0))
    return load_params_subtree(directory, sds, step=step, ema=ema,
                               dtype=dtype)


def load_vae_orbax(directory: str, vcfg, step: Optional[int] = None,
                   ema: bool = False, dtype: Optional[Any] = None) -> Any:
    """Load CausalVAE generator params from a train_vae orbax checkpoint dir
    (the reference prefers 'ema_state_dict' when present, modeling_causalvae
    load path — mirrored by ema=True). Params subtree only."""
    from ..core.config import TrainConfig
    from ..train.train_vae import create_vae_train_state
    st = jax.eval_shape(
        lambda k: create_vae_train_state(k, vcfg, TrainConfig(ema=False)),
        jax.random.key(0))
    return load_params_subtree(directory, st.params, step=step, ema=ema,
                               dtype=dtype)


def save_params_npz(path: str, params: Any):
    """Flat .npz export for interchange/debugging."""
    flat = {}

    def visit(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(f"{prefix}/{k}" if prefix else str(k), v)
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                visit(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(tree)

    visit("", params)
    np.savez(path, **flat)
