"""Device mesh construction + named-sharding helpers.

TPU-native replacement for the reference's NCCL process-group bring-up
(utils/distributed.py:20-58) and vLLM's pynccl/custom all-reduce
(serve/worker.py:282-320). There is no user-level backend here: we build one
`jax.sharding.Mesh` with logical axes (data, fsdp, tp, cp) and let XLA lower
collectives onto ICI/DCN.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MeshConfig


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (the reference's init_distributed_mode analog,
    utils/distributed.py:20-58 — NCCL env:// / SLURM rank derivation).

    On TPU pods `jax.distributed.initialize()` autodetects everything from the
    TPU metadata; explicit args cover GPU/CPU clusters. Call once per process
    before building the mesh; afterwards jax.devices() spans all hosts and the
    same pjit code runs SPMD (collectives ride ICI/DCN — no backend code)."""
    import jax.distributed
    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-host barrier (the reference's dist.barrier() after checkpoints,
    train_t2v.py:396)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Build a Mesh with axes (data, fsdp, tp, cp) over the given devices."""
    if devices is None:
        devices = jax.devices()
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(cfg.shape)
    return Mesh(dev_array, cfg.axis_names)


def single_device_mesh() -> Mesh:
    """1-device mesh so the same pjit code path runs on one chip."""
    return make_mesh(MeshConfig())


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------
# Rules are (regex over the param path, PartitionSpec). First match wins.
# Paths look like "layers/attention/wqkv", "tok_embeddings", ...
#
# FSDP shards the largest axis of each weight over the fsdp axis (ZeRO-3
# analog of the reference's absent-but-intended train_c2i_fsdp.py; see
# SURVEY.md §2.9). TP shards attention heads / ffn hidden over tp
# (the training-side analog of vLLM's tensor_parallel_size).

GPT_SHARDING_RULES: Tuple[Tuple[str, P], ...] = (
    # attention: qkv projection sharded over heads (output dim), out-proj input dim
    (r".*attention/wqkv$", P("fsdp", "tp")),
    (r".*attention/wo$", P("tp", "fsdp")),
    # SwiGLU: w1/w3 shard hidden (out) over tp; w2 input over tp
    (r".*ffn/w[13]$", P("fsdp", "tp")),
    (r".*ffn/w2$", P("tp", "fsdp")),
    # embeddings / heads: shard vocab over tp, dim over fsdp
    (r".*tok_embeddings$", P("tp", "fsdp")),
    (r".*output$", P("fsdp", "tp")),
    (r".*cls_embedding/embedding$", P(None, "fsdp")),
    # int8 QuantizedLinear leaves (ops/quant.py NamedTuple -> GetAttrKey path
    # suffixes /.q (in, out) and /.scale (out,)): q shards like the bf16
    # weight, scale follows the output dim's axis
    (r".*(attention/wqkv|ffn/w[13]|output)/\.q$", P("fsdp", "tp")),
    (r".*(attention/wqkv|ffn/w[13]|output)/\.scale$", P("tp")),
    (r".*(attention/wo|ffn/w2)/\.q$", P("tp", "fsdp")),
    (r".*(attention/wo|ffn/w2)/\.scale$", P("fsdp")),
    # int4 QuantizedLinear4 gscale (in//group, out) follows the q sharding:
    # groups tile the input dim, so the input axis's mesh axis shards them
    (r".*(attention/wqkv|ffn/w[13]|output)/\.gscale$", P("fsdp", "tp")),
    (r".*(attention/wo|ffn/w2)/\.gscale$", P("tp", "fsdp")),
    # PackedLinear4 pq (in//2, out): packed bytes tile the input dim the
    # same way (group-half pairs stay within one group, so any fsdp shard
    # boundary at a group multiple keeps bytes whole)
    (r".*(attention/wqkv|ffn/w[13]|output)/\.pq$", P("fsdp", "tp")),
    (r".*(attention/wo|ffn/w2)/\.pq$", P("tp", "fsdp")),
    # everything else (norms, small MLPs, biases) replicated
    (r".*", P()),
)


def _spec_for(path: str, rules: Sequence[Tuple[str, P]], ndim: int, stacked: bool) -> P:
    for pat, spec in rules:
        if re.fullmatch(pat, path):
            parts = list(spec)
            if stacked:
                parts = [None] + parts  # leading layer-stack axis stays unsharded
            # pad/truncate to rank
            parts = (parts + [None] * ndim)[:ndim]
            return P(*parts)
    return P()


def flatten_path(path) -> str:
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(str(p.key))
        elif hasattr(p, "idx"):
            keys.append(str(p.idx))
        else:
            keys.append(str(p))
    return "/".join(keys)


def param_shardings(params: Any, mesh: Mesh,
                    rules: Sequence[Tuple[str, P]] = GPT_SHARDING_RULES,
                    stacked_prefixes: Tuple[str, ...] = ("layers",)) -> Any:
    """Build a NamedSharding pytree matching `params` from path-regex rules.

    Leaves under `stacked_prefixes` are treated as layer-stacked: their leading
    axis is the layer axis and the rule applies to the remaining dims.
    """

    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def _axis_size(entry) -> int:
        if entry is None:
            return 1
        if isinstance(entry, tuple):
            n = 1
            for a in entry:
                n *= axis_sizes.get(a, 1)
            return n
        return axis_sizes.get(entry, 1)

    def assign(path, leaf):
        p = flatten_path(path)
        stacked = any(p.startswith(pref) for pref in stacked_prefixes)
        spec = _spec_for(p, rules, np.ndim(leaf), stacked)
        # drop axes that don't divide the dim (e.g. odd vocab over tp) —
        # replicating that dim beats crashing, matching GSPMD best practice
        shape = np.shape(leaf)
        parts = [
            (entry if shape[i] % _axis_size(entry) == 0 else None)
            for i, entry in enumerate(spec)
        ]
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map_with_path(assign, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over data×fsdp (standard DP batch split)."""
    return NamedSharding(mesh, P(("data", "fsdp"), *([None] * (ndim - 1))))


def shard_params(params: Any, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = GPT_SHARDING_RULES) -> Any:
    shardings = param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
