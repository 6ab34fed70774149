"""Grouped int4 weight-only quantization (W4A16, ops/quant.QuantizedLinear4).

The vLLM the reference vendors (0.4.1) serves AWQ/GPTQ 4-bit checkpoints —
grouped symmetric int4 along the input dim is that feature's TPU-native
analog. Pins: (1) qlinear4 is EXACTLY x @ dequant(w) in f32, (2) the full
GPT decode path runs quantized trees end to end with engine-side and
pre-quantized trees byte-identical, (3) quantization error is bounded and
strictly better with smaller groups, (4) sharding rules place gscale like q.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import randomize_head
from video_llamagen_tpu.core.config import GPTConfig
from video_llamagen_tpu.models import gpt
from video_llamagen_tpu.ops.quant import (QuantizedLinear4, dequantize_weight4,
                                          qlinear4, quantize_gpt_params4,
                                          quantize_weight4)

TINY = GPTConfig(dim=128, n_layer=2, n_head=4, vocab_size=256, num_classes=10,
                 block_size=16, cls_token_num=1, model_type="c2i",
                 dtype="float32")


def test_qlinear4_matches_dequant_matmul():
    w = jax.random.normal(jax.random.key(0), (256, 96)) * 0.05
    wq = quantize_weight4(w, group=64)
    assert wq.q.dtype == jnp.int4 and wq.gscale.shape == (4, 96)
    x = jax.random.normal(jax.random.key(1), (5, 256))
    got = qlinear4(x, wq)
    want = x @ dequantize_weight4(wq, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_quantization_error_bounded_and_grouping_helps():
    w = jax.random.normal(jax.random.key(2), (512, 64)) * 0.02
    def err(group):
        d = dequantize_weight4(quantize_weight4(w, group), jnp.float32)
        return float(jnp.sqrt(jnp.mean((d - w) ** 2) / jnp.mean(w ** 2)))
    e128, e32 = err(128), err(32)
    # Gaussian weights, scale = group-max/7: step ~ 2.8 sigma/7, RMS err
    # ~ step/sqrt(12) ~ 11.5% relative at group 128 (measured 11.8%)
    assert e128 < 0.15
    assert e32 < e128           # finer groups strictly reduce error


def test_group_size_fallback_non_divisible():
    w = jax.random.normal(jax.random.key(3), (100, 8))
    wq = quantize_weight4(w, group=128)   # 100 < 128 -> one group of 100
    assert wq.gscale.shape[0] * (100 // wq.gscale.shape[0]) == 100
    x = jnp.ones((2, 100))
    np.testing.assert_allclose(np.asarray(qlinear4(x, wq)),
                               np.asarray(x @ dequantize_weight4(wq, jnp.float32)),
                               rtol=0, atol=1e-5)


@pytest.fixture(scope="module")
def params():
    return randomize_head(gpt.init_gpt_params(jax.random.key(0), TINY))


def test_decode_path_runs_int4_and_matches_dequant(params):
    """generate() over an int4 tree ≈ generate() over its dequantized tree
    (same group order of operations up to one f32 rounding)."""
    from video_llamagen_tpu.inference.generate import generate
    qp = quantize_gpt_params4(params, group=64)
    # dequantize back to a dense tree with the SAME values (walk explicitly:
    # stacked QuantizedLinear4 leaves need a vmap'd dequant)
    def walk(t):
        if isinstance(t, QuantizedLinear4):
            if t.q.ndim == 3:   # stacked layers
                return jax.vmap(lambda q, s: dequantize_weight4(
                    QuantizedLinear4(q, s), jnp.float32))(t.q, t.gscale)
            return dequantize_weight4(t, jnp.float32)
        if isinstance(t, dict):
            return {k: walk(v) for k, v in t.items()}
        return t
    dq = walk(qp)
    toks_q = generate(qp, TINY, jnp.asarray([1, 2]), jax.random.key(0),
                      TINY.block_size, cfg_scale=1.5, top_k=1)
    toks_d = generate(dq, TINY, jnp.asarray([1, 2]), jax.random.key(0),
                      TINY.block_size, cfg_scale=1.5, top_k=1)
    assert (np.asarray(toks_q) == np.asarray(toks_d)).mean() > 0.9


def test_engine_int4_matches_prequantized(params):
    """Engine-side weight_int4 quantization == handing it a pre-quantized
    tree (the GPT-3B fused-fabrication path), bit-identical outputs."""
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine
    sp = SamplingParams(max_tokens=12, cfg_scale=2.0, top_k=1)
    e1 = ServeEngine(params, TINY, max_batch=2, dtype=jnp.float32,
                     weight_int4=True)
    out1 = e1.generate([3, 7], sp, offline_fast_path=False)
    pre = quantize_gpt_params4(gpt.cast_params(params, jnp.float32))
    e2 = ServeEngine(pre, TINY, max_batch=2, dtype=jnp.float32,
                     weight_int4=True)
    out2 = e2.generate([3, 7], sp, offline_fast_path=False)
    assert [r.tokens for r in out1] == [r.tokens for r in out2]
    # int4 weights compose with int8 KV (independent axes)
    e3 = ServeEngine(params, TINY, max_batch=2, dtype=jnp.float32,
                     weight_int4=True, kv_int8=True)
    out3 = e3.generate([3, 7], sp, offline_fast_path=False)
    assert all(len(r.tokens) == 12 for r in out3)


def test_engine_rejects_both_weight_quant(params):
    from video_llamagen_tpu.serve.engine import ServeEngine
    with pytest.raises(AssertionError):
        ServeEngine(params, TINY, weight_int8=True, weight_int4=True)


def test_int4_logits_close_to_f32(params):
    """Quality bound: int4 CFG logits stay within a few % relative RMS of
    f32 — same check style the int4 KV path pins (tests/test_int4.py)."""
    idx = jnp.asarray([[5, 9, 3]], jnp.int32)
    cond = jnp.asarray([2])
    lg_f, _ = gpt.forward(params, TINY, idx, cond)
    qp = quantize_gpt_params4(params, group=64)
    lg_q, _ = gpt.forward(qp, TINY, idx, cond)
    rel = float(jnp.sqrt(jnp.mean((lg_q - lg_f) ** 2)
                         / jnp.maximum(jnp.mean(lg_f ** 2), 1e-9)))
    # ~12% per-matrix RMS (see grouping test) amplifies through the 2-layer
    # tiny trunk to ~20%; this pins "bounded", the real-quality question is
    # the chip-side score-noise measurement (README int4 section)
    assert rel < 0.30, rel


def test_sharding_rules_place_gscale_like_q(params):
    from jax.sharding import Mesh
    from video_llamagen_tpu.parallel import mesh as pmesh
    devs = np.array(jax.devices()[:8]).reshape(1, 2, 4)
    mesh = Mesh(devs, ("data", "fsdp", "tp"))
    # group=32 so dim=128 gives 4 groups — divisible by fsdp=2
    qp = quantize_gpt_params4(params, group=32)
    shardings = pmesh.param_shardings(qp, mesh)
    flat = {pmesh.flatten_path(p): s.spec for p, s in
            jax.tree_util.tree_flatten_with_path(shardings)[0]}
    wqkv_q = [v for k, v in flat.items() if "wqkv" in k and k.endswith(".q")]
    wqkv_s = [v for k, v in flat.items() if "wqkv" in k and "gscale" in k]
    assert wqkv_q and wqkv_s
    # stacked layer axis + (fsdp, tp) for both
    assert all(tuple(s) == (None, "fsdp", "tp") for s in wqkv_q)
    assert all(tuple(s) == (None, "fsdp", "tp") for s in wqkv_s)
    w2_s = [v for k, v in flat.items() if "/w2" in k and "gscale" in k]
    assert all(tuple(s) == (None, "tp", "fsdp") for s in w2_s)
    # and device_put over the full int4 tree succeeds (s4 leaves shard fine)
    sharded = pmesh.shard_params(qp, mesh)
    assert jax.tree_util.tree_leaves(sharded)[0] is not None


def _tree_eq(a, b):
    """Leaf equality up to 1-ulp fusion noise: scan-vs-vmap init fuses the
    f32 RNG -> *std -> bf16 cast differently on a handful of elements
    (~2/131072 observed), which can also flip a rounded int quant by 1.
    A key-discipline bug would mismatch essentially every element."""
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for x, y in zip(la, lb):
        assert x.dtype == y.dtype and x.shape == y.shape
        xf = np.asarray(x).astype(np.float32)
        yf = np.asarray(y).astype(np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating):
            mismatch = ~np.isclose(xf, yf, rtol=1e-2, atol=1e-4)
        elif np.asarray(x).dtype == np.uint8:  # packed: two nibbles per byte
            xi, yi = np.asarray(x), np.asarray(y)
            mismatch = (np.abs((xi // 16).astype(int) - (yi // 16)) > 1) \
                | (np.abs((xi % 16).astype(int) - (yi % 16)) > 1)
        else:
            mismatch = np.abs(xf - yf) > 1.5   # ints: off-by-one rounding ok
        assert mismatch.mean() < 1e-3, f"{mismatch.sum()} / {mismatch.size}"


@pytest.mark.parametrize("quant", [None, "int8", "int4", "int4_packed"])
def test_fabricate_matches_fused_pipeline(quant):
    """Layer-sequential fabrication (the GPT-7B OOM fix) is leaf-for-leaf
    identical to quantize(cast(init)) — same key-split discipline."""
    from video_llamagen_tpu.ops.quant import (quantize_gpt_params,
                                              quantize_gpt_params4)
    key = jax.random.key(7)
    want = gpt.cast_params(gpt.init_gpt_params(key, TINY), jnp.bfloat16)
    if quant == "int8":
        want = quantize_gpt_params(want)
    elif quant in ("int4", "int4_packed"):
        want = quantize_gpt_params4(want, group=64)
        if quant == "int4_packed":
            from video_llamagen_tpu.ops.qmatmul4 import pack_gpt_params4
            want = pack_gpt_params4(want)
    got = jax.jit(lambda k: gpt.fabricate_gpt_params(
        k, TINY, jnp.bfloat16, quant=quant, group=64))(key)
    _tree_eq(got, want)


def test_init_kv_cache_int4_buffers_distinct_and_donatable():
    """init_kv_cache_int4 builds under ONE jit (eager s4 fill crashes over
    the axon tunnel) — outputs must still be distinct, donation-safe
    buffers for the engine's donated decode graphs."""
    cache = gpt.init_kv_cache_int4(TINY, 2, 8)
    ptrs = [v.unsafe_buffer_pointer() for e in cache for v in e.values()]
    assert len(set(ptrs)) == len(ptrs)
    bump = jax.jit(lambda c: jax.tree_util.tree_map(lambda x: x + 1, c),
                   donate_argnums=(0,))
    out = bump(cache)
    assert out[0]["kT4"].dtype == jnp.int4
