"""Packed-nibble W4 Pallas matmul (ops/qmatmul4.py).

Pins: packing layout roundtrips exactly; the kernel (interpret mode on CPU
— TPU perf is probe_w4_kernel.py's job) matches the dequantized matmul and
the XLA qlinear4 path within bf16 tolerance; row padding and multi-tile
output grids are correct."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import randomize_head
from video_llamagen_tpu.ops.qmatmul4 import (PackedLinear4, pack_gpt_params4,
                                             pack_int4, qmatmul4,
                                             qmatmul4_pallas)
from video_llamagen_tpu.ops.quant import (dequantize_weight4, qlinear4,
                                          quantize_weight4)


def _unpack(packed: PackedLinear4):
    half, out = packed.pq.shape
    g = packed.gscale.shape[0]
    gs = 2 * half // g
    p = np.asarray(packed.pq).astype(np.int32).reshape(g, gs // 2, out)
    lo = (p & 15) - 8
    hi = ((p >> 4) & 15) - 8
    return np.concatenate([lo, hi], axis=1).reshape(2 * half, out)


def test_pack_roundtrip_exact():
    w = jax.random.normal(jax.random.key(0), (128, 96)) * 0.05
    wq = quantize_weight4(w, group=32)
    assert _unpack(pack_int4(wq)).tolist() == np.asarray(
        wq.q.astype(jnp.int32)).tolist()


@pytest.mark.parametrize("r,in_dim,out_dim,group,out_tile",
                         [(2, 256, 512, 64, 256),   # padded rows, 2 tiles
                          (16, 128, 128, 128, 128),  # one group, one tile
                          (9, 192, 384, 48, 384)])   # odd rows, odd-ish dims
def test_kernel_matches_dequant(r, in_dim, out_dim, group, out_tile):
    w = jax.random.normal(jax.random.key(1), (in_dim, out_dim)) * 0.03
    wq = quantize_weight4(w, group=group)
    packed = pack_int4(wq)
    x = (jax.random.normal(jax.random.key(2), (r, in_dim)) * 0.1
         ).astype(jnp.bfloat16)
    got = qmatmul4_pallas(x, packed, out_tile=out_tile, interpret=True)
    assert got.shape == (r, out_dim) and got.dtype == x.dtype
    want = x.astype(jnp.float32) @ dequantize_weight4(wq, jnp.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0, atol=0.05)
    # and agrees with the XLA s4 path on identical values (f32 there: the
    # CPU dot thunk can't run the bf16 einsum this compares against)
    xla = qlinear4(x.astype(jnp.float32), wq)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(xla, np.float32), rtol=0, atol=0.05)


def test_qmatmul4_wrapper_3d_batch():
    w = jax.random.normal(jax.random.key(3), (128, 256)) * 0.03
    packed = pack_int4(quantize_weight4(w, group=64))
    x = (jax.random.normal(jax.random.key(4), (2, 5, 128)) * 0.1
         ).astype(jnp.bfloat16)
    got = qmatmul4(x, packed)        # backend != tpu -> interpret mode
    assert got.shape == (2, 5, 256)
    want = x.reshape(-1, 128).astype(jnp.float32) @ \
        dequantize_weight4(quantize_weight4(w, group=64), jnp.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32).reshape(-1, 256),
                               np.asarray(want), rtol=0, atol=0.05)


def test_sharding_rules_place_pq_like_q():
    from jax.sharding import Mesh
    from video_llamagen_tpu.core.config import GPTConfig
    from video_llamagen_tpu.models import gpt
    from video_llamagen_tpu.ops.quant import quantize_gpt_params4
    from video_llamagen_tpu.parallel import mesh as pmesh

    cfg = GPTConfig(dim=128, n_layer=2, n_head=4, vocab_size=256,
                    num_classes=10, block_size=16, cls_token_num=1,
                    model_type="c2i", dtype="float32")
    packed = pack_gpt_params4(
        quantize_gpt_params4(gpt.init_gpt_params(jax.random.key(0), cfg),
                             group=32))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 2, 4),
                ("data", "fsdp", "tp"))
    shardings = pmesh.param_shardings(packed, mesh)
    flat = {pmesh.flatten_path(p): s.spec for p, s in
            jax.tree_util.tree_flatten_with_path(shardings)[0]}
    wqkv_pq = [v for k, v in flat.items() if "wqkv" in k and k.endswith(".pq")]
    w2_pq = [v for k, v in flat.items() if "/w2" in k and k.endswith(".pq")]
    assert wqkv_pq and w2_pq
    assert all(tuple(s) == (None, "fsdp", "tp") for s in wqkv_pq)
    assert all(tuple(s) == (None, "tp", "fsdp") for s in w2_pq)
    sharded = pmesh.shard_params(packed, mesh)
    assert jax.tree_util.tree_leaves(sharded)[0] is not None


def test_packed_tree_through_full_decode_and_engine():
    """quantize -> pack -> nn.linear dispatch: generate() and ServeEngine
    over a PackedLinear4 tree track the s4-einsum tree's outputs (same
    int4 values, bf16-dot rounding only)."""
    from video_llamagen_tpu.core.config import GPTConfig
    from video_llamagen_tpu.inference.generate import generate
    from video_llamagen_tpu.models import gpt
    from video_llamagen_tpu.ops.quant import quantize_gpt_params4
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine

    cfg = GPTConfig(dim=128, n_layer=2, n_head=4, vocab_size=256,
                    num_classes=10, block_size=16, cls_token_num=1,
                    model_type="c2i", dtype="float32")
    params = randomize_head(gpt.init_gpt_params(jax.random.key(0), cfg))
    q4 = quantize_gpt_params4(params, group=64)
    packed = pack_gpt_params4(q4)
    toks_q = generate(q4, cfg, jnp.asarray([1, 2]), jax.random.key(0),
                      cfg.block_size, cfg_scale=1.5, top_k=1)
    toks_p = generate(packed, cfg, jnp.asarray([1, 2]), jax.random.key(0),
                      cfg.block_size, cfg_scale=1.5, top_k=1)
    assert (np.asarray(toks_q) == np.asarray(toks_p)).mean() > 0.85

    eng = ServeEngine(packed, cfg, max_batch=2, dtype=jnp.float32,
                      weight_int4=True)   # pass-through: already quantized
    out = eng.generate([3], SamplingParams(max_tokens=8, top_k=1,
                                           cfg_scale=2.0),
                       offline_fast_path=False)
    assert len(out[0].tokens) == 8
