"""int8 KV cache: accuracy vs bf16 cache, all write paths, engine smoke.

The int8 cache (gpt.init_kv_cache_int8) is the TPU analog of vLLM's
kv_cache_dtype=int8: half the HBM per slot for ~0.4% per-row quantization
error. These tests pin the error bound against the bf16-cache reference on
every cache write path (full prefill, slot prefill, scalar decode, per-slot
decode) and check the serving engine runs with it end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.core.config import gpt_config
from video_llamagen_tpu.models import gpt
from conftest import randomize_head

CFG = gpt_config("GPT-nano", vocab_size=256, block_size=16, num_classes=10,
                 cls_token_num=1, model_type="c2i", dtype="float32")


@pytest.fixture(scope="module")
def params():
    # randomize_head: the zero-init head made every parity assert here
    # vacuous (zero logits on both sides) until round 3 caught it
    return randomize_head(gpt.init_gpt_params(jax.random.key(0), CFG))


def _freqs():
    from video_llamagen_tpu.core.rope import precompute_freqs_2d
    import math
    grid = int(math.isqrt(CFG.block_size))
    return precompute_freqs_2d(grid, CFG.head_dim, CFG.rope_base,
                               CFG.cls_token_num)


def _decode_n(params, cache, freqs, emb, t0, n, col_valid=None):
    logits = None
    for i in range(n):
        logits, cache = gpt.decode_step(params, CFG, emb[:, i:i + 1],
                                        jnp.int32(t0 + i), cache, col_valid,
                                        freqs)
    return logits, cache


def test_decode_matches_bf16_cache(params):
    """prefill_forward + decode_step: int8 cache logits ~= bf16 cache logits."""
    b, n_dec = 2, 6
    freqs = _freqs()
    cond = jax.random.randint(jax.random.key(1), (b,), 0, 10)
    cond_emb = gpt.embed_cond(params, CFG, cond, train=False,
                              dtype=jnp.float32)
    emb = jax.random.normal(jax.random.key(2), (b, n_dec, CFG.dim)) * 0.02

    outs = {}
    for name, cache in (("bf16", gpt.init_kv_cache(CFG, b, 16, jnp.float32)),
                        ("int8", gpt.init_kv_cache_int8(CFG, b, 16))):
        lg, cache = gpt.prefill_forward(params, CFG, cond_emb, cache, None,
                                        freqs)
        lg2, _ = _decode_n(params, cache, freqs, emb, cond_emb.shape[1], n_dec)
        outs[name] = (np.asarray(lg), np.asarray(lg2))

    for a, b_ in zip(outs["bf16"], outs["int8"]):
        # int8 KV budget: ~0.5% of the logit scale per element, 2% worst-case
        scale = np.abs(a).max()
        assert np.abs(a - b_).mean() < 5e-3 * scale
        assert np.abs(a - b_).max() < 2e-2 * scale
        # greedy path stable up to near-ties
        assert (a.argmax(-1) == b_.argmax(-1)).mean() >= 0.95


def test_slot_paths_match_bf16_cache(params):
    """prefill_into_slot + decode_step_multi parity across cache dtypes."""
    rows, s_max = 3, 16
    freqs = _freqs()
    cond = jax.random.randint(jax.random.key(3), (1,), 0, 10)
    cond_emb = gpt.embed_cond(params, CFG, cond, train=False,
                              dtype=jnp.float32)
    tok = jax.random.normal(jax.random.key(4), (rows, 1, CFG.dim)) * 0.02
    pos = jnp.asarray([1, 0, 0], jnp.int32)
    active = jnp.asarray([True, False, False])

    res = {}
    for name, cache in (("bf16",
                         gpt.init_kv_cache(CFG, rows, s_max, jnp.float32)),
                        ("int8", gpt.init_kv_cache_int8(CFG, rows, s_max))):
        lg, cache = gpt.prefill_into_slot(params, CFG, cond_emb,
                                          jnp.int32(0), cache, freqs)
        lg2, cache = gpt.decode_step_multi(params, CFG, tok, pos, cache,
                                           active, freqs)
        res[name] = (np.asarray(lg), np.asarray(lg2[0]))

    np.testing.assert_allclose(res["bf16"][0], res["int8"][0], atol=5e-2,
                               rtol=0.1)
    np.testing.assert_allclose(res["bf16"][1], res["int8"][1], atol=5e-2,
                               rtol=0.1)


def test_inactive_slots_untouched_int8(params):
    rows, s_max = 2, 8
    freqs = _freqs()
    cache = gpt.init_kv_cache_int8(CFG, rows, s_max)
    tok = jnp.zeros((rows, 1, CFG.dim))
    pos = jnp.asarray([0, 3], jnp.int32)
    active = jnp.asarray([True, False])
    _, cache2 = gpt.decode_step_multi(params, CFG, tok, pos, cache, active,
                                      freqs)
    # row 1 inactive: its cache rows (incl. scales) stay zero
    # (seq-minor int8 entries: kT (B,KH,D,S), kT_scale (B,KH,S))
    for e in cache2:
        assert not np.any(np.asarray(e["kT"][1]))
        assert not np.any(np.asarray(e["kT_scale"][1]))
        assert np.any(np.asarray(e["kT_scale"][0, :, 0]))   # row 0 written


def test_generate_kv_int8_tokens():
    cfg = CFG
    params = randomize_head(gpt.init_gpt_params(jax.random.key(5), cfg), key=5)
    from video_llamagen_tpu.inference.generate import generate
    cond = jnp.asarray([1, 2], jnp.int32)
    toks16 = generate(params, cfg, cond, jax.random.key(6), 8,
                      cfg_scale=1.5, sample_logits=False)
    toks8 = generate(params, cfg, cond, jax.random.key(6), 8,
                     cfg_scale=1.5, sample_logits=False, kv_int8=True)
    assert toks8.shape == (2, 8)
    # greedy decode on a random-init model: int8 KV keeps the argmax path
    assert np.mean(np.asarray(toks16) == np.asarray(toks8)) >= 0.75


def test_engine_kv_int8_smoke():
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine
    params = gpt.init_gpt_params(jax.random.key(7), CFG)
    eng = ServeEngine(params, CFG, max_batch=2, dtype=jnp.float32,
                      kv_int8=True)
    sp = SamplingParams(max_tokens=4)
    # offline_fast_path=False exercises the engine's own int8 slot cache
    # (the fast path exercises generate(kv_int8=True) instead)
    out = eng.generate([np.int32(3), np.int32(5)], sp,
                       offline_fast_path=False)
    assert all(len(o.tokens) == 4 for o in out)
