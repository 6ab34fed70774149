"""Block-sparse attention ("fixed" pattern) for the legacy video tokenizer.

Parity target: the reference's tokenizer_video/attention.py:250-340 sparse
path, which calls DeepSpeed's triton sparse-attention ops with a
FixedSparsityConfig (Sparse Transformers, Child et al. 2019): each query
block attends to its `num_local_blocks` most recent key blocks plus a
"summary" stripe — the last `num_global` positions of every earlier block.

Two TPU-native implementations with identical numerics:
- sparse_attention_masked: dense scores + pattern mask (exact semantics,
  O(S^2) memory) — the ground truth.
- sparse_attention_blocked: gathers only the allowed key blocks per query
  block, O(S * (L*B + G)) memory — the production path; XLA lowers the
  per-block einsums onto the MXU without materializing (S, S).

Both support the non-causal tokenizer use and a causal flag for AR priors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fixed_pattern_mask(seq: int, block: int, num_local_blocks: int,
                       num_global: int, causal: bool) -> jnp.ndarray:
    """(S, S) bool mask of the 'fixed' sparsity pattern."""
    assert seq % block == 0, f"seq {seq} must be a multiple of block {block}"
    idx = jnp.arange(seq)
    bq = (idx // block)[:, None]
    bk = (idx // block)[None, :]
    local = (bq - bk >= 0) & (bq - bk < num_local_blocks)
    summary = ((idx[None, :] % block) >= block - num_global) & (bk < bq)
    mask = local | summary
    if causal:
        mask = mask & (idx[None, :] <= idx[:, None])
    return mask


def sparse_attention_masked(q, k, v, block: int = 16,
                            num_local_blocks: int = 4, num_global: int = 1,
                            causal: bool = False) -> jnp.ndarray:
    """q/k/v (B, S, H, D). Exact masked-dense reference implementation."""
    s = q.shape[1]
    mask = fixed_pattern_mask(s, block, num_local_blocks, num_global, causal)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jnp.nan_to_num(jax.nn.softmax(scores, axis=-1))
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


def sparse_attention_blocked(q, k, v, block: int = 16,
                             num_local_blocks: int = 4, num_global: int = 1,
                             causal: bool = False) -> jnp.ndarray:
    """Memory-efficient path: per query block, attend to the gathered local
    window + the global summary stripe instead of all S keys."""
    b, s, h, d = q.shape
    assert s % block == 0
    nb = s // block
    scale = 1.0 / (d ** 0.5)

    # summary stripe: last num_global positions of every block (static gather)
    sum_idx = (jnp.arange(nb)[:, None] * block
               + (block - num_global) + jnp.arange(num_global)[None, :]
               ).reshape(-1)                                   # (nb*G,)
    k_sum = k[:, sum_idx]                                      # (B, nb*G, H, D)
    v_sum = v[:, sum_idx]

    qb = q.reshape(b, nb, block, h, d)
    kb = k.reshape(b, nb, block, h, d)
    vb = v.reshape(b, nb, block, h, d)
    pos = jnp.arange(s)

    def one_block(i):
        qi = qb[:, i]                                          # (B, blk, H, D)
        q_pos = i * block + jnp.arange(block)

        # local window: blocks [i - L + 1, i], clamped; out-of-range blocks
        # are gathered but masked off below
        offs = jnp.arange(num_local_blocks) - (num_local_blocks - 1)
        blk_ids = i + offs                                     # (L,)
        blk_ids_c = jnp.clip(blk_ids, 0, nb - 1)
        k_loc = kb[:, blk_ids_c].reshape(b, num_local_blocks * block, h, d)
        v_loc = vb[:, blk_ids_c].reshape(b, num_local_blocks * block, h, d)
        loc_pos = (blk_ids_c[:, None] * block
                   + jnp.arange(block)[None, :]).reshape(-1)
        loc_ok = jnp.repeat(blk_ids >= 0, block)               # (L*blk,)

        # summary keys: only strictly-earlier blocks
        sum_ok = (sum_idx // block) < i                        # (nb*G,)

        kk = jnp.concatenate([k_loc, k_sum], axis=1)
        vv = jnp.concatenate([v_loc, v_sum], axis=1)
        ok = jnp.concatenate([loc_ok, sum_ok])                 # (K,)
        kpos = jnp.concatenate([loc_pos, sum_idx])
        # gathered local + summary can overlap (a summary position inside the
        # local window); keep the LOCAL copy and drop the summary duplicate
        dup = jnp.zeros_like(ok)
        in_window = (sum_idx // block >= i - (num_local_blocks - 1)) & \
                    (sum_idx // block <= i)
        dup = dup.at[num_local_blocks * block:].set(in_window)
        ok = ok & ~dup
        if causal:
            allowed = ok[None, :] & (kpos[None, :] <= q_pos[:, None])
        else:
            allowed = jnp.broadcast_to(ok[None, :],
                                       (block, ok.shape[0]))

        scores = jnp.einsum("bqhd,bkhd->bhqk", qi, kk).astype(jnp.float32)
        scores = scores * scale
        scores = jnp.where(allowed[None, None], scores, -jnp.inf)
        probs = jnp.nan_to_num(jax.nn.softmax(scores, axis=-1))
        return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vv.dtype), vv)

    out = jax.lax.map(one_block, jnp.arange(nb))               # (nb, B, blk, H, D)
    return out.transpose(1, 0, 2, 3, 4).reshape(b, s, h, d)


def sparse_attention(q, k, v, block: int = 16, num_local_blocks: int = 4,
                     num_global: int = 1, causal: bool = False,
                     blocked: bool = True) -> jnp.ndarray:
    """Dispatcher (ref attention.py sparse path surface)."""
    fn = sparse_attention_blocked if blocked else sparse_attention_masked
    return fn(q, k, v, block=block, num_local_blocks=num_local_blocks,
              num_global=num_global, causal=causal)
