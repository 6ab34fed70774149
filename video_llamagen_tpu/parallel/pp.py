"""Pipeline parallelism (pp mesh axis) for GPT training.

TPU-native counterpart of the reference's pipeline-parallel surface: vLLM's
worker brings up `ensure_model_parallel_initialized(tensor_parallel_size,
pipeline_parallel_size)` (ref autoregressive/serve/worker.py:282-320) and the
training side leans on DeepSpeed, whose config carries a pipeline engine. On
TPU we do not port a send/recv runtime; instead we use the collective-permute
rotation schedule (the GSPMD pipelining pattern from the scaling-book /
praxis `LayerwiseShardablePipelined`):

* the stacked block params (L, ...) are viewed as (P, L/P, ...) — P pipeline
  stages of L/P layers each — and sharded over the `pp` mesh axis on the
  leading dim. Because the view is a leading-axis reshape, the canonical
  (L, ...) tree in TrainState/checkpoints/EMA is untouched; the reshape
  happens inside the jitted step and is free.
* activations live in a (P, mb, S, D) rotating buffer, also sharded over
  `pp`. One schedule step = `jnp.roll(buf, 1, axis=0)` — XLA lowers the roll
  on a sharded axis to a single-hop `CollectivePermute` ring on ICI — then a
  `vmap` over the stage axis applies each stage's L/P-layer `lax.scan` to its
  current microbatch. GSPMD partitions the vmap over `pp`, so each device
  runs exactly its own stage.
* GPipe schedule: M microbatches drain through P stages in M + P - 1 steps
  (bubble fraction (P-1)/(M+P-1)); stage 0 injects microbatch t at step t,
  stage P-1 emits microbatch t-(P-1). Autodiff through roll/vmap/scan gives
  the backward pipeline for free; `cfg.remat` reuses the same per-block
  checkpointing as the non-PP path.

Embedding, final norm, output head, and the loss run outside the pipeline on
the full batch (they are O(dim) or one matmul — cheap and replicated over pp,
exactly like the reference keeps embeddings on stage 0/-1).

Composes with dp/fsdp on the same mesh: the microbatch axis stays sharded
over (data, fsdp) while stages shard over pp.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import GPTConfig
from ..core.rope import precompute_freqs_2d
from ..models import gpt
from ..ops.nn import rms_norm, linear, dropout

Params = Dict[str, Any]


def split_stages(layers: Params, num_stages: int) -> Params:
    """View stacked block params (L, ...) as (P, L/P, ...). Pure reshape —
    when the L axis is sharded over `pp` (see pp_sharding_rules) the split
    keeps every stage's slice on its own device."""
    def r(x):
        l = x.shape[0]
        assert l % num_stages == 0, f"n_layer {l} % pp {num_stages} != 0"
        return x.reshape(num_stages, l // num_stages, *x.shape[1:])
    return jax.tree_util.tree_map(r, layers)


def pp_sharding_rules(rules=None) -> Tuple[Tuple[str, P], ...]:
    """Sharding rules for PP training: stacked `layers` leaves get their
    leading layer axis sharded over `pp` (stage-major layout), remaining dims
    follow the usual fsdp/tp rules. parallel/mesh.param_shardings already
    prepends a leading entry for stacked leaves; here that entry is 'pp'
    instead of None — see pp_param_shardings."""
    from . import mesh as pmesh
    return rules if rules is not None else pmesh.GPT_SHARDING_RULES


def pp_param_shardings(params: Params, mesh: Mesh, rules=None) -> Params:
    """Like mesh.param_shardings but layer-stacked leaves shard their leading
    (layer) axis over `pp`. Non-stacked leaves (embeddings, norms, head) are
    replicated over pp (every stage computes embed/head identically)."""
    from . import mesh as pmesh
    rules = pp_sharding_rules(rules)
    base = pmesh.param_shardings(params, mesh, rules)

    def fix(path, leaf, sh):
        p = pmesh.flatten_path(path)
        if not p.startswith("layers"):
            return sh
        spec = list(sh.spec) + [None] * (jnp.ndim(leaf) - len(sh.spec))
        spec[0] = "pp"
        # drop if the layer axis doesn't divide (guarded by split_stages too)
        if leaf.shape[0] % mesh.shape.get("pp", 1) != 0:
            spec[0] = None
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(fix, params, base)


def _stage_apply(cfg: GPTConfig, stage_layers: Params, dp_rates: jnp.ndarray,
                 x: jnp.ndarray, freqs: jnp.ndarray,
                 mask: Optional[jnp.ndarray], rngs, train: bool) -> jnp.ndarray:
    """Run one stage's L/P layers over one microbatch (called under vmap)."""

    def body(carry, xs):
        layer, rate = xs
        h = gpt.block_forward(layer, cfg, carry, freqs, mask, rngs, train, rate)
        return h, None

    fn = jax.checkpoint(body) if (cfg.remat and train) else body
    h, _ = jax.lax.scan(fn, x, (stage_layers, dp_rates))
    return h


def pipeline_layers(layers: Params, cfg: GPTConfig, h: jnp.ndarray,
                    freqs: jnp.ndarray, mask: Optional[jnp.ndarray],
                    rngs, train: bool, *,
                    num_stages: int, num_microbatches: int,
                    mesh: Optional[Mesh] = None) -> jnp.ndarray:
    """GPipe-schedule the stacked block stack over already-embedded h.

    The shared scheduler behind pipeline_forward (image GPT) and
    gpt_video.trunk_forward(pp_ctx=...) (video GPT): h (B, S, D) in, h out,
    identical math to `lax.scan` over (L, ...) layers up to fp reassociation.
    See the module docstring for the rotation schedule.
    """
    P_ = num_stages
    M = num_microbatches
    dtype = h.dtype
    b, seq_len, dim = h.shape
    assert b % M == 0, f"batch {b} % microbatches {M} != 0"
    mb = b // M

    def wsc(x, spec):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    dp_rates = jnp.linspace(0.0, cfg.drop_path_rate, cfg.n_layer)
    stage_layers = split_stages(layers, P_)
    stage_rates = dp_rates.reshape(P_, cfg.n_layer // P_)

    embs = h.reshape(M, mb, seq_len, dim)
    embs = wsc(embs, P(None, ("data", "fsdp"), None, None))
    if mask is not None and mask.ndim >= 3 and mask.shape[0] == b and b > 1:
        # a per-sample mask would have to ride the rotation buffer with the
        # activations; the PP training use cases are pure-causal
        raise NotImplementedError(
            "pipeline supports mask=None or a batch-shared mask")
    mask_mb = mask  # shared mask (or None) broadcast to all microbatches

    buf_spec = P("pp", ("data", "fsdp"), None, None)

    def apply_stages(x):
        # x: (P, mb, S, D) — one schedule tick across all stages
        x = wsc(x, buf_spec)
        y = jax.vmap(
            lambda lp, rp, xb: _stage_apply(cfg, lp, rp, xb, freqs,
                                            mask_mb, rngs or None, train)
        )(stage_layers, stage_rates, x)
        return wsc(y, buf_spec)

    def tick(carry, t):
        y_prev, outputs = carry
        # rotate: stage s receives stage s-1's last output (ring permute on pp)
        rolled = jnp.roll(y_prev, 1, axis=0)
        inject = jax.lax.dynamic_index_in_dim(
            embs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
        x = rolled.at[0].set(inject)
        y = apply_stages(x)
        # collect stage P-1's finished microbatch (valid once t >= P-1)
        out_idx = t - (P_ - 1)
        upd = jax.lax.dynamic_update_slice_in_dim(
            outputs, y[P_ - 1][None], jnp.maximum(out_idx, 0), 0)
        outputs = jnp.where(out_idx >= 0, upd, outputs)
        return (y, outputs), None

    y0 = jnp.zeros((P_, mb, seq_len, dim), dtype)
    outs0 = jnp.zeros((M, mb, seq_len, dim), dtype)
    (_, outputs), _ = jax.lax.scan(
        tick, (wsc(y0, buf_spec),
               wsc(outs0, P(None, ("data", "fsdp"), None, None))),
        jnp.arange(M + P_ - 1))

    h = outputs.reshape(b, seq_len, dim)
    return wsc(h, P(("data", "fsdp"), None, None))


def pipeline_forward(params: Params, cfg: GPTConfig,
                     idx: Optional[jnp.ndarray],
                     cond: jnp.ndarray,
                     targets: Optional[jnp.ndarray] = None,
                     mask: Optional[jnp.ndarray] = None,
                     valid: Optional[jnp.ndarray] = None,
                     rng: Optional[jax.Array] = None,
                     train: bool = False,
                     freqs_cis: Optional[jnp.ndarray] = None,
                     *,
                     num_stages: int,
                     num_microbatches: int,
                     mesh: Optional[Mesh] = None):
    """Drop-in pipeline-parallel replacement for models/gpt.forward.

    Identical math (same logits/loss up to fp reassociation when dropout is
    off — parity-tested in tests/test_pp.py); the layer stack executes as a
    P-stage, M-microbatch GPipe schedule. Train-time block dropout draws its
    masks at microbatch shape with the same per-kind keys as the non-PP path
    (which already shares keys across layers), so masks are correlated across
    microbatches — statistically equivalent regularization, not bit-identical
    to the full-batch draw. With `mesh` given, activations and
    stage params carry sharding constraints on the `pp` axis; without it the
    same code runs single-device (useful for tests / P=1 degenerate case).
    """
    dtype = jnp.dtype(cfg.dtype)

    rngs = {}
    if rng is not None:
        keys = jax.random.split(rng, 6)
        rngs = dict(zip(["cond", "tok", "resid", "ffn", "drop_path",
                         "drop_path2"], keys))

    # ---- embeddings on the full batch (replicated over pp) -----------------
    cond_emb = gpt.embed_cond(params, cfg, cond, rngs.get("cond"), train, dtype)
    if idx is not None:
        tok = params["tok_embeddings"][idx].astype(dtype)
        h = jnp.concatenate([cond_emb, tok], axis=1)
    else:
        h = cond_emb
    if train:
        h = dropout(rngs.get("tok"), h, cfg.token_dropout_p, not train)

    seq_len = h.shape[1]
    if freqs_cis is None:
        freqs_cis = precompute_freqs_2d(cfg.grid_size, cfg.head_dim,
                                        cfg.rope_base, cfg.cls_token_num)
    freqs = freqs_cis[:seq_len]

    h = pipeline_layers(params["layers"], cfg, h, freqs, mask, rngs, train,
                        num_stages=num_stages,
                        num_microbatches=num_microbatches, mesh=mesh)

    # ---- head + loss, identical to gpt.forward -----------------------------
    h = rms_norm(h, params["norm"], cfg.norm_eps)
    logits = linear(h, params["output"]).astype(jnp.float32)
    logits = logits[:, cfg.cls_token_num - 1:]

    loss = None
    if targets is not None:
        loss = gpt.cross_entropy_loss(logits[:, : targets.shape[1]], targets,
                                      valid)
    return logits, loss
