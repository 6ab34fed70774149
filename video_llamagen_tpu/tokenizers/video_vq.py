"""VideoGPT-style 3D VQ-VAE with EMA codebook — legacy video tokenizer.

Capability parity with reference tokenizer/tokenizer_video/vqvae.py: SamePad
3D conv encoder/decoder with stride-2 downsampling, axial-attention residual
stacks, and the EMA `Codebook` with dead-code restarts
(CausalVideoVAE quant.py:8-110 / vqvae.py:127-214 semantics: N/z running
sums, Laplace-smoothed usage, random restart of codes unused for an update).

TPU-first: NDHWC layout; the EMA update is a pure function returning new
codebook state (the reference mutates buffers + dist.broadcast; here the
caller runs the update inside pjit and XLA inserts the cross-replica mean).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.nn import init_conv, group_norm, silu
from ..ops.vq_lookup import vq_lookup

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# SamePad 3D conv
# ---------------------------------------------------------------------------

def conv3d_same(x: jnp.ndarray, p: Params,
                strides: Tuple[int, int, int] = (1, 1, 1)) -> jnp.ndarray:
    """'SAME' 3D conv with torch SamePadConv3d's asymmetric padding."""
    kt, kh, kw = p["kernel"].shape[:3]

    def pad_for(k, s, size):
        total = max(k - s, 0) if size % s == 0 else max(k - size % s, 0)
        # torch F.pad style: more padding on the trailing side
        return (total // 2, total - total // 2)

    pads = tuple(pad_for(k, s, d) for k, s, d in
                 zip((kt, kh, kw), strides, x.shape[1:4]))
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), strides, padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + p["bias"].astype(x.dtype)


def conv3d_transpose_same(x: jnp.ndarray, p: Params,
                          strides: Tuple[int, int, int]) -> jnp.ndarray:
    """Stride-s transposed conv producing exactly s x upsampling."""
    out = jax.lax.conv_transpose(
        x, p["kernel"].astype(x.dtype), strides, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + p["bias"].astype(x.dtype)


# ---------------------------------------------------------------------------
# EMA codebook (ref quant.py:8-110)
# ---------------------------------------------------------------------------

class CodebookState(NamedTuple):
    embeddings: jnp.ndarray   # (K, D)
    cluster_size: jnp.ndarray  # (K,) EMA of assignment counts ("N")
    embed_avg: jnp.ndarray     # (K, D) EMA of assigned vectors ("z_avg")
    initialized: jnp.ndarray   # () bool


def init_codebook(rng: jax.Array, n_codes: int, embedding_dim: int) -> CodebookState:
    emb = jax.random.normal(rng, (n_codes, embedding_dim)).astype(jnp.float32)
    return CodebookState(
        embeddings=emb,
        cluster_size=jnp.ones((n_codes,), jnp.float32),
        embed_avg=emb.astype(jnp.float32),
        initialized=jnp.asarray(False),
    )


def codebook_lookup(state: CodebookState, z_flat: jnp.ndarray) -> jnp.ndarray:
    # stop_gradient: index lookup is non-differentiable (EMA/STE carry the
    # learning signal) and the Pallas TPU kernel has no VJP — same fix as
    # tokenizers/vq/model.quantize
    return vq_lookup(jax.lax.stop_gradient(z_flat.astype(jnp.float32)),
                     jax.lax.stop_gradient(state.embeddings))


def codebook_quantize(state: CodebookState, z: jnp.ndarray,
                      train: bool = False, rng: jax.Array = None,
                      decay: float = 0.99, eps: float = 1e-5):
    """z (..., D) -> (z_q STE, new_state, indices, commitment_loss).

    Training updates: EMA of counts/sums, Laplace smoothing, and random
    restart of dead codes from batch vectors (ref quant.py:61-95). Cross-
    replica reduction happens automatically under pjit (the reference's
    dist.all_reduce).
    """
    flat = z.reshape(-1, z.shape[-1]).astype(jnp.float32)
    idx = codebook_lookup(state, flat)
    z_q = state.embeddings[idx].reshape(z.shape)
    commit = 0.25 * jnp.mean((jax.lax.stop_gradient(z_q.astype(z.dtype)) - z) ** 2)

    new_state = state
    if train:
        k = state.embeddings.shape[0]
        onehot = jax.nn.one_hot(idx, k, dtype=jnp.float32)        # (N, K)
        counts = onehot.sum(axis=0)                               # (K,)
        sums = onehot.T @ flat                                    # (K, D)
        n_total = flat.shape[0]

        cluster_size = state.cluster_size * decay + counts * (1 - decay)
        embed_avg = state.embed_avg * decay + sums * (1 - decay)
        # Laplace smoothing (ref quant.py:80-84)
        smoothed = ((cluster_size + eps)
                    / (cluster_size.sum() + k * eps) * cluster_size.sum())
        embeddings = embed_avg / smoothed[:, None]

        # dead-code restart: codes with tiny usage get random batch vectors
        if rng is not None:
            usage = (cluster_size >= 1.0)
            pick = jax.random.randint(rng, (k,), 0, n_total)
            random_vecs = flat[pick]
            embeddings = jnp.where(usage[:, None], embeddings, random_vecs)
            cluster_size = jnp.where(usage, cluster_size,
                                     jnp.ones_like(cluster_size))
            embed_avg = jnp.where(usage[:, None], embed_avg, random_vecs)
        new_state = CodebookState(embeddings, cluster_size, embed_avg,
                                  jnp.asarray(True))

    z_q = z + jax.lax.stop_gradient(z_q.astype(z.dtype) - z)
    return z_q, new_state, idx.reshape(z.shape[:-1]), commit


def perplexity(indices: jnp.ndarray, n_codes: int) -> jnp.ndarray:
    onehot = jax.nn.one_hot(indices.reshape(-1), n_codes, dtype=jnp.float32)
    avg = onehot.mean(axis=0)
    return jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))


# ---------------------------------------------------------------------------
# Axial attention residual block (ref vqvae.py:89-126, attention.py axial path)
# ---------------------------------------------------------------------------

def init_axial_block(rng: jax.Array, c: int) -> Params:
    r = jax.random.split(rng, 8)
    d = {"norm": {"scale": jnp.ones((c,), jnp.float32),
                  "bias": jnp.zeros((c,), jnp.float32)}}
    for i, ax in enumerate(("t", "h", "w")):
        d[f"qkv_{ax}"] = {"w": (jax.random.normal(r[i], (c, 3 * c)) *
                                (1.0 / math.sqrt(c))).astype(jnp.float32)}
    d["proj"] = {"w": jnp.zeros((c, c), jnp.float32)}
    return d


def _axial_attn(x: jnp.ndarray, qkv_w: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Self-attention along one axis of (B, T, H, W, C)."""
    moved = jnp.moveaxis(x, axis, -2)             # (..., L, C)
    shape = moved.shape
    flat = moved.reshape(-1, shape[-2], shape[-1])
    qkv = flat @ qkv_w.astype(flat.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scores = jnp.einsum("blc,bmc->blm", q, k).astype(jnp.float32)
    scores = scores / math.sqrt(q.shape[-1])
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("blm,bmc->blc", probs, v).reshape(shape)
    return jnp.moveaxis(out, -2, axis)


def axial_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = group_norm(x, p["norm"]["scale"], p["norm"]["bias"])
    out = (_axial_attn(h, p["qkv_t"]["w"], 1)
           + _axial_attn(h, p["qkv_h"]["w"], 2)
           + _axial_attn(h, p["qkv_w"]["w"], 3))
    return x + out @ p["proj"]["w"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Encoder / decoder / model
# ---------------------------------------------------------------------------

def init_video_vq_params(rng: jax.Array, n_codes: int = 2048,
                         embedding_dim: int = 256, n_hiddens: int = 240,
                         n_res_layers: int = 4,
                         downsample: Tuple[int, int, int] = (4, 4, 4),
                         in_channels: int = 3) -> Params:
    n_times = tuple(int(math.log2(d)) for d in downsample)
    max_ds = max(n_times)
    r = iter(jax.random.split(rng, 8 + 2 * max_ds + 2 * n_res_layers))

    enc_convs = []
    cin = in_channels
    for i in range(max_ds):
        strides = tuple(2 if n_times[ax] > i else 1 for ax in range(3))
        enc_convs.append({"conv": init_conv(next(r), (4, 4, 4, cin, n_hiddens)),
                          "strides": strides})
        cin = n_hiddens
    enc_res = [init_axial_block(next(r), n_hiddens) for _ in range(n_res_layers)]

    dec_convs = []
    for i in reversed(range(max_ds)):
        strides = tuple(2 if n_times[ax] > i else 1 for ax in range(3))
        cout = in_channels if i == 0 else n_hiddens
        dec_convs.append({"conv": init_conv(next(r), (4, 4, 4, n_hiddens, cout)),
                          "strides": strides})
    dec_res = [init_axial_block(next(r), n_hiddens) for _ in range(n_res_layers)]

    return {
        "enc_convs": enc_convs,
        "enc_res": enc_res,
        "pre_vq": init_conv(next(r), (1, 1, 1, n_hiddens, embedding_dim)),
        "post_vq": init_conv(next(r), (1, 1, 1, embedding_dim, n_hiddens)),
        "dec_res": dec_res,
        "dec_convs": dec_convs,
        "codebook": init_codebook(next(r), n_codes, embedding_dim),
    }


def encode(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = x
    for layer in params["enc_convs"]:
        h = silu(conv3d_same(h, layer["conv"], layer["strides"]))
    for blk in params["enc_res"]:
        h = axial_block(blk, h)
    return conv3d_same(h, params["pre_vq"])


def decode(params: Params, z_q: jnp.ndarray) -> jnp.ndarray:
    h = conv3d_same(z_q, params["post_vq"])
    for blk in params["dec_res"]:
        h = axial_block(blk, h)
    for i, layer in enumerate(params["dec_convs"]):
        h = conv3d_transpose_same(h, layer["conv"], layer["strides"])
        if i < len(params["dec_convs"]) - 1:
            h = silu(h)
    return h


def forward(params: Params, x: jnp.ndarray, train: bool = False,
            rng: jax.Array = None):
    """x (B, T, H, W, 3) -> (recon, new_codebook, indices, commit_loss)."""
    z = encode(params, x)
    z_q, new_cb, idx, commit = codebook_quantize(params["codebook"], z,
                                                 train=train, rng=rng)
    recon = decode(params, z_q)
    return recon, new_cb, idx, commit
