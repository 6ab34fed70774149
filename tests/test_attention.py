"""Attention dispatch + ring attention (cp axis) correctness."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from video_llamagen_tpu.ops.attention import (
    multi_head_attention, ring_attention, _einsum_attention)


def _ref_attention(q, k, v, causal=True):
    s = q.shape[1]
    mask = np.tril(np.ones((s, s), bool)) if causal else np.ones((s, s), bool)
    scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(q.shape[-1])
    scores = np.where(mask[None, None], scores, -np.inf)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


def test_einsum_attention_matches_reference():
    rs = np.random.RandomState(0)
    q = rs.randn(2, 16, 4, 8).astype(np.float32)
    k = rs.randn(2, 16, 4, 8).astype(np.float32)
    v = rs.randn(2, 16, 4, 8).astype(np.float32)
    got = np.asarray(multi_head_attention(jnp.asarray(q), jnp.asarray(k),
                                          jnp.asarray(v), use_flash=False))
    np.testing.assert_allclose(got, _ref_attention(q, k, v), atol=1e-5)


def test_ring_attention_matches_full():
    """Ring attention over 4 cp shards == dense causal attention."""
    devices = jax.devices()[:4]
    mesh = Mesh(np.asarray(devices).reshape(4), ("cp",))
    rs = np.random.RandomState(1)
    b, s, h, d = 2, 32, 2, 8
    q = rs.randn(b, s, h, d).astype(np.float32)
    k = rs.randn(b, s, h, d).astype(np.float32)
    v = rs.randn(b, s, h, d).astype(np.float32)

    ring = shard_map(
        functools.partial(ring_attention, axis_name="cp"),
        mesh=mesh,
        in_specs=(P(None, "cp"), P(None, "cp"), P(None, "cp")),
        out_specs=P(None, "cp"),
    )
    got = np.asarray(ring(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = _ref_attention(q, k, v, causal=True)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_ring_attention_noncausal():
    devices = jax.devices()[:2]
    mesh = Mesh(np.asarray(devices).reshape(2), ("cp",))
    rs = np.random.RandomState(2)
    q = rs.randn(1, 8, 2, 4).astype(np.float32)
    k = rs.randn(1, 8, 2, 4).astype(np.float32)
    v = rs.randn(1, 8, 2, 4).astype(np.float32)
    ring = shard_map(
        functools.partial(ring_attention, axis_name="cp", causal=False),
        mesh=mesh,
        in_specs=(P(None, "cp"), P(None, "cp"), P(None, "cp")),
        out_specs=P(None, "cp"),
    )
    got = np.asarray(ring(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = _ref_attention(q, k, v, causal=False)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_dense_mask_path():
    rs = np.random.RandomState(3)
    q = rs.randn(1, 6, 2, 4).astype(np.float32)
    mask = np.tril(np.ones((6, 6), bool))
    mask[:, 0] = False  # column 0 invisible
    mask[0, 0] = True   # forced diagonal
    got = np.asarray(multi_head_attention(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
        mask=jnp.asarray(mask)[None, None], use_flash=False))
    assert np.isfinite(got).all()


def test_cp_trunk_matches_dense():
    """cp-sharded trunk == dense trunk on the same inputs."""
    from video_llamagen_tpu.core.config import GPTConfig, MeshConfig
    from video_llamagen_tpu.parallel import mesh as pmesh
    from video_llamagen_tpu.parallel.cp import cp_trunk_forward
    from video_llamagen_tpu.models import gpt as gpt_mod
    from video_llamagen_tpu.core.rope import precompute_freqs_2d
    from video_llamagen_tpu.ops.nn import rms_norm

    cfg = GPTConfig(dim=32, n_layer=2, n_head=2, vocab_size=64, num_classes=8,
                    block_size=16, cls_token_num=1, model_type="c2i",
                    dtype="float32")
    params = gpt_mod.init_gpt_params(jax.random.key(0), cfg)
    mesh = pmesh.make_mesh(MeshConfig(cp=4))
    freqs = precompute_freqs_2d(cfg.grid_size, cfg.head_dim, cfg.rope_base,
                                cfg.cls_token_num)
    embeds = jax.random.normal(jax.random.key(1), (2, 16, cfg.dim))

    got = np.asarray(cp_trunk_forward(params, cfg, embeds, mesh, freqs))

    # dense reference: same blocks + causal mask
    h = embeds
    mask = jnp.tril(jnp.ones((16, 16), bool))[None, None]

    def body(h, xs):
        lp, dp = xs
        return gpt_mod.block_forward(lp, cfg, h, freqs[:16], mask), None

    dp = jnp.zeros((cfg.n_layer,))
    h, _ = jax.lax.scan(body, h, (params["layers"], dp))
    want = np.asarray(rms_norm(h, params["norm"], cfg.norm_eps))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_gpt3b_fsdp_sharding_lowers():
    """GPT-3B param shardings + train step LOWER on an 8-dev mesh (no memory:
    abstract lowering only) — validates the FSDP path at real scale."""
    from video_llamagen_tpu.core.config import gpt_config, TrainConfig, MeshConfig
    from video_llamagen_tpu.parallel import mesh as pmesh
    from video_llamagen_tpu.train.train_state import (
        create_train_state, make_train_step, train_state_shardings, TrainState)
    from video_llamagen_tpu.models import gpt as gpt_mod
    import jax.numpy as jnp

    cfg = gpt_config("GPT-3B", vocab_size=16384, block_size=256,
                     num_classes=1000, cls_token_num=1, model_type="c2i",
                     remat=True)
    tcfg = TrainConfig()
    mesh = pmesh.make_mesh(MeshConfig(data=2, fsdp=4))

    state_shape = jax.eval_shape(
        lambda: create_train_state(jax.random.key(0), cfg, tcfg))
    shardings = train_state_shardings(state_shape, mesh)
    # every large weight must actually be sharded over fsdp
    wqkv_sh = shardings.params["layers"]["attention"]["wqkv"]
    assert "fsdp" in str(wqkv_sh.spec)

    step_fn = make_train_step(cfg, tcfg, mesh, shardings)
    b = 8
    batch = {
        "idx": jax.ShapeDtypeStruct((b, cfg.block_size - 1), jnp.int32),
        "cond": jax.ShapeDtypeStruct((b,), jnp.int32),
        "targets": jax.ShapeDtypeStruct((b, cfg.block_size), jnp.int32),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    lowered = step_fn.lower(state_shape, batch, jax.eval_shape(lambda: jax.random.key(0)))
    assert lowered is not None


def test_dense_cache_paging_roundtrip():
    from video_llamagen_tpu.ops.paged_attention import dense_cache_as_pages
    rs = np.random.RandomState(0)
    cache = jnp.asarray(rs.randn(2, 3, 8, 4).astype(np.float32))
    pages, idx = dense_cache_as_pages(cache, page_size=4)
    assert pages.shape == (3, 4, 4, 4)  # (KH, B*2pages, ps, D)
    assert idx.shape == (2, 2)
    # page idx[b, p] must map back to cache[b, :, p*ps:(p+1)*ps]
    for b in range(2):
        for p in range(2):
            np.testing.assert_array_equal(
                np.asarray(pages[:, idx[b, p]]),
                np.asarray(cache[b, :, p * 4:(p + 1) * 4]))


def test_reference_decode_attention_lengths():
    from video_llamagen_tpu.ops.paged_attention import reference_decode_attention
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(1, 1, 2, 4).astype(np.float32))
    ck = jnp.asarray(rs.randn(1, 2, 6, 4).astype(np.float32))
    cv = jnp.asarray(rs.randn(1, 2, 6, 4).astype(np.float32))
    # with length=3, changing positions >=3 must not affect the output
    out1 = reference_decode_attention(q, ck, cv, jnp.asarray([3]))
    ck2 = ck.at[:, :, 4].set(99.0)
    out2 = reference_decode_attention(q, ck2, cv, jnp.asarray([3]))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
