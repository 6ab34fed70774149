"""int8 weight-only (W8A16) inference: accuracy vs bf16/f32 weights through
the full decode stack, engine integration (vLLM weight-quantization analog).

quantize_gpt_params replaces the big matrices with QuantizedLinear leaves;
ops/nn.linear dispatches on leaf structure, so forward/prefill/decode paths
need no changes. Per-output-channel symmetric int8 keeps logits within ~1e-2
of full precision on smoke models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.core.config import gpt_config
from video_llamagen_tpu.models import gpt
from conftest import randomize_head
from video_llamagen_tpu.ops.quant import (QuantizedLinear, dequantize_weight,
                                          qlinear, quantize_gpt_params,
                                          quantize_weight)

CFG = gpt_config("GPT-nano", vocab_size=128, block_size=16, num_classes=10,
                 cls_token_num=1, model_type="c2i", dtype="float32")


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.key(0), (64, 32)) * 0.05
    wq = quantize_weight(w)
    back = dequantize_weight(wq, jnp.float32)
    # per-channel int8: worst-case error is scale/2 = max|w_col| / 254
    err = np.abs(np.asarray(back - w))
    bound = np.abs(np.asarray(w)).max(axis=0) / 254.0 + 1e-8
    assert (err <= bound[None, :] + 1e-7).all()


def test_qlinear_matches_dense():
    x = jax.random.normal(jax.random.key(1), (4, 64)) * 0.5
    w = jax.random.normal(jax.random.key(2), (64, 32)) * 0.05
    got = np.asarray(qlinear(x, quantize_weight(w)))
    want = np.asarray(x @ w)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=0.05)


def test_forward_logits_close():
    params = randomize_head(gpt.init_gpt_params(jax.random.key(0), CFG))
    qparams = quantize_gpt_params(params)
    idx = jax.random.randint(jax.random.key(1), (2, 15), 0, 128)
    cond = jnp.asarray([1, 2], jnp.int32)
    lg, _ = gpt.forward(params, CFG, idx, cond)
    lgq, _ = gpt.forward(qparams, CFG, idx, cond)
    lg, lgq = np.asarray(lg), np.asarray(lgq)
    # W8A16 budget: per-channel int8 weights through 2 blocks + head —
    # ~1% of the logit scale mean, 5% worst-case
    scale = np.abs(lg).max()
    assert np.abs(lg - lgq).mean() < 1e-2 * scale
    assert np.abs(lg - lgq).max() < 5e-2 * scale
    assert (lg.argmax(-1) == lgq.argmax(-1)).mean() >= 0.9


def test_generate_with_quantized_params():
    from video_llamagen_tpu.inference.generate import generate
    params = randomize_head(gpt.init_gpt_params(jax.random.key(3), CFG), key=3)
    qparams = quantize_gpt_params(params)
    cond = jnp.asarray([4, 5], jnp.int32)
    t_full = generate(params, CFG, cond, jax.random.key(4), 8,
                      cfg_scale=1.5, sample_logits=False)
    t_q = generate(qparams, CFG, cond, jax.random.key(4), 8,
                   cfg_scale=1.5, sample_logits=False)
    assert t_q.shape == (2, 8)
    # greedy path survives weight quantization on the smoke model
    assert np.mean(np.asarray(t_full) == np.asarray(t_q)) >= 0.75


def test_engine_weight_int8_smoke():
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine
    params = gpt.init_gpt_params(jax.random.key(5), CFG)
    eng = ServeEngine(params, CFG, max_batch=2, dtype=jnp.float32,
                      weight_int8=True, kv_int8=True)
    out = eng.generate([np.int32(3), np.int32(6)],
                       SamplingParams(max_tokens=4), offline_fast_path=False)
    assert all(len(o.tokens) == 4 for o in out)
    # the big matrices really are int8 on device
    leaf = eng.model_params["layers"]["attention"]["wqkv"]
    assert isinstance(leaf, QuantizedLinear) and leaf.q.dtype == jnp.int8


def test_quantized_params_shard_and_run():
    """TP/FSDP sharding rules cover QuantizedLinear leaves: the q matrices
    shard like their bf16 counterparts, scales follow the output axis, and a
    sharded quantized forward matches the unsharded one."""
    from video_llamagen_tpu.core.config import MeshConfig
    from video_llamagen_tpu.parallel import mesh as pmesh

    cfg = gpt_config("GPT-nano", vocab_size=128, block_size=16,
                     num_classes=10, cls_token_num=1, model_type="c2i",
                     dtype="float32")
    params = gpt.init_gpt_params(jax.random.key(0), cfg)
    qparams = quantize_gpt_params(params)
    idx = jax.random.randint(jax.random.key(1), (2, 15), 0, 128)
    cond = jnp.asarray([1, 2], jnp.int32)
    want, _ = gpt.forward(qparams, cfg, idx, cond)

    mesh = pmesh.make_mesh(MeshConfig(data=2, fsdp=2, tp=2))
    qsharded = pmesh.shard_params(qparams, mesh)
    leaf = qsharded["layers"]["attention"]["wqkv"]
    assert leaf.q.dtype == jnp.int8
    # q really lands sharded over real mesh axes (not the replicate rule);
    # stacked layer axis stays unsharded, then (fsdp, tp)
    assert tuple(leaf.q.sharding.spec) == (None, "fsdp", "tp")
    assert "tp" in tuple(leaf.scale.sharding.spec)
    got, _ = gpt.forward(qsharded, cfg, idx, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_engine_accepts_prequantized_params(dtype):
    """A tree that is ALREADY QuantizedLinear passes through ServeEngine's
    weight_int8 path untouched (no double quantization) and generates
    identically to engine-side quantization — HBM-tight models (GPT-3B) are
    fabricated/loaded int8 up front so bf16+int8 never coexist on device.
    bfloat16 covers the cast_params path: QuantizedLinear scales must stay
    f32 through the engine's initial cast (advisor r2 finding)."""
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine

    params = gpt.init_gpt_params(jax.random.key(7), CFG)
    sp = SamplingParams(max_tokens=6, cfg_scale=1.5, top_k=0,
                        temperature=1.0)

    eng_inside = ServeEngine(params, CFG, max_batch=2, dtype=dtype,
                             weight_int8=True)
    eng_pre = ServeEngine(quantize_gpt_params(params), CFG, max_batch=2,
                          dtype=dtype, weight_int8=True)
    pre_scale = eng_pre.model_params["layers"]["attention"]["wqkv"].scale
    assert pre_scale.dtype == jnp.float32
    leaf = eng_pre.model_params["layers"]["attention"]["wqkv"]
    assert isinstance(leaf, QuantizedLinear) and leaf.q.dtype == jnp.int8

    conds = [np.int32(1), np.int32(2)]
    a = eng_inside.generate(conds, sp)
    b = eng_pre.generate(conds, sp)
    assert [x.tokens for x in a] == [x.tokens for x in b]
