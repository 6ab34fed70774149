"""In-graph token sampling: temperature / top-k / top-p / categorical.

TPU-native replacement for the reference's host-side filtering + multinomial
(autoregressive/models/generate.py:16-72) and vLLM's triton sampler
(serve/sampler.py). Everything here is pure jnp and jit-safe, so it can live
inside the compiled decode `lax.scan` — no host sync per token.

Static args (top_k as int, top_p as float) become compile-time constants; the
decode loop is compiled once per sampler setting.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e10  # finite filter value: keeps softmax numerics well-defined in bf16/f32


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep only the k highest logits per row (ref generate.py:34-38 semantics)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (ref generate.py:40-56 semantics).

    Tokens are sorted by logit descending; those whose *preceding* cumulative
    probability already exceeds p are dropped (the first token crossing the
    threshold is kept, matching the reference's shift-right).
    """
    if p >= 1.0:
        return logits
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # shift right: a token is removed iff cumulative prob *before* it > p
    remove = (cum - probs) > p
    sorted_filtered = jnp.where(remove, NEG_INF, sorted_logits)
    # scatter back to vocabulary order via the inverse permutation
    inv = jnp.argsort(sort_idx, axis=-1)
    return jnp.take_along_axis(sorted_filtered, inv, axis=-1)


def sample_token(rng: jax.Array, logits: jnp.ndarray, temperature: float = 1.0,
                 top_k: int = 0, top_p: float = 1.0,
                 sample_logits: bool = True) -> jnp.ndarray:
    """Sample token ids (B,) from (B, V) logits (ref generate.py:59-68)."""
    logits = logits.astype(jnp.float32) / max(temperature, 1e-5)
    if top_k > 0:
        logits = top_k_filter(logits, top_k)
    if top_p < 1.0:
        logits = top_p_filter(logits, top_p)
    if sample_logits:
        return jax.random.categorical(rng, logits, axis=-1)
    return jnp.argmax(logits, axis=-1)


def logits_to_probs(logits: jnp.ndarray, temperature: float = 1.0,
                    top_k: int = 0, top_p: float = 1.0) -> jnp.ndarray:
    logits = logits.astype(jnp.float32) / max(temperature, 1e-5)
    if top_k > 0:
        logits = top_k_filter(logits, top_k)
    if top_p < 1.0:
        logits = top_p_filter(logits, top_p)
    return jax.nn.softmax(logits, axis=-1)


def apply_penalties_batched(logits: jnp.ndarray, counts: jnp.ndarray,
                            presence: jnp.ndarray, frequency: jnp.ndarray,
                            repetition: jnp.ndarray) -> jnp.ndarray:
    """Per-row repetition / presence / frequency penalties from output-token
    counts (ref serve/sampler.py:207-227 _apply_penalties, vLLM semantics).

    logits (B, V) raw (pre-temperature); counts (B, V) int — how many times
    each vocab token has been emitted by that row so far; presence/frequency
    (B,) additive penalties; repetition (B,) multiplicative (1.0 = off,
    applied only to already-seen tokens: positive logits divided, negative
    multiplied).
    """
    logits = logits.astype(jnp.float32)
    seen = counts > 0
    rep = jnp.where(seen, repetition[:, None], 1.0)
    logits = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = logits - frequency[:, None] * counts.astype(jnp.float32)
    logits = logits - presence[:, None] * seen.astype(jnp.float32)
    return logits


def filtered_logits_batched(logits: jnp.ndarray, temperature: jnp.ndarray,
                            top_k: jnp.ndarray, top_p: jnp.ndarray,
                            min_p: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
    """Temperature + per-row top-k/top-p (and optional min-p) filtering,
    vectorized over rows.

    logits (B, V); temperature/top_k/top_p each (B,). top_k<=0 disables
    top-k for that row; top_p>=1 disables nucleus; min_p (if given, (B,))
    drops tokens whose probability is below min_p * max-prob (ref
    serve/sampler.py:262-277 _apply_min_p); min_p<=0 disables. Returns the
    filtered (B, V) f32 logits — softmax of these IS the row's sampling
    distribution (speculative serving computes acceptance probabilities
    from it).
    """
    b, v = logits.shape
    logits = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-5)[:, None]

    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)

    # per-row top-k: threshold at the (k-1)th sorted logit
    k = jnp.where(top_k <= 0, v, jnp.clip(top_k, 1, v)).astype(jnp.int32)
    kth = jnp.take_along_axis(sorted_logits, (k - 1)[:, None], axis=-1)
    keep_k = logits >= kth

    # per-row top-p on the sorted order
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    remove_sorted = (cum - probs) > top_p[:, None]
    inv = jnp.argsort(sort_idx, axis=-1)
    keep_p = ~jnp.take_along_axis(remove_sorted, inv, axis=-1)

    keep = keep_k & keep_p
    if min_p is not None:
        probs_v = jnp.take_along_axis(probs, inv, axis=-1)   # vocab order
        thresh = min_p[:, None] * probs[:, :1]               # min_p * p_max
        keep = keep & (probs_v >= thresh)    # min_p<=0 -> thresh<=0 -> no-op
    return jnp.where(keep, logits, NEG_INF)


def sample_token_batched(rng: jax.Array, logits: jnp.ndarray,
                         temperature: jnp.ndarray, top_k: jnp.ndarray,
                         top_p: jnp.ndarray) -> jnp.ndarray:
    """Vectorized sampling with PER-ROW parameters (serving hot path).

    One traced program regardless of the parameter mix — the engine calls
    this once per step for the whole batch (vLLM's triton sampler analog).
    """
    filtered = filtered_logits_batched(logits, temperature, top_k, top_p)
    return jax.random.categorical(rng, filtered, axis=-1)


def cfg_mix(logits: jnp.ndarray, cfg_scale: float,
            cfg_flag: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Classifier-free-guidance mix for a batch holding [cond; uncond] halves.

    (ref generate.py:80-84, 93-101). Returns the mixed (B, V) logits. If
    cfg_flag (scalar bool) is given, guidance is applied only when it's true —
    used by cfg_interval in the decode scan without retracing.
    """
    cond, uncond = jnp.split(logits, 2, axis=0)
    mixed = uncond + (cond - uncond) * cfg_scale
    if cfg_flag is not None:
        mixed = jnp.where(cfg_flag, mixed, cond)
    return mixed
