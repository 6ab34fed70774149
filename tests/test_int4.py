"""int4 KV cache: accuracy vs bf16, all write paths, engine + window parity.

gpt.init_kv_cache_int4 quarters the KV stream (s4 elements, packed
two-per-byte by XLA on TPU) with per-token per-group K scales and per-token
V scales. 4-bit quantization carries ~7% relative score noise (vs ~0.4% for
int8), so the logits budget here is wider; the asserts pin that the error
stays in the 4-bit regime (not sign flips / layout bugs) and that every
write path (prefill, slot prefill, scalar decode, per-slot decode, window
commit) agrees with the per-token path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import randomize_head
from video_llamagen_tpu.core.config import gpt_config
from video_llamagen_tpu.models import gpt

CFG = gpt_config("GPT-nano", vocab_size=256, block_size=16, num_classes=10,
                 cls_token_num=1, model_type="c2i", dtype="float32")


@pytest.fixture(scope="module")
def params():
    return randomize_head(gpt.init_gpt_params(jax.random.key(0), CFG))


def _freqs():
    from video_llamagen_tpu.core.rope import precompute_freqs_2d
    import math
    grid = int(math.isqrt(CFG.block_size))
    return precompute_freqs_2d(grid, CFG.head_dim, CFG.rope_base,
                               CFG.cls_token_num)


def test_quantize_kv4_bounds():
    x = jax.random.normal(jax.random.key(0), (3, 5, 64)) * 2.0
    q, s = gpt._quantize_kv4(x)
    assert q.dtype == jnp.int4
    assert s.shape == (3, 5, 64 // gpt.KV_INT4_GROUP)
    back = (np.asarray(q).astype(np.float32).reshape(3, 5, -1,
                                                     gpt.KV_INT4_GROUP)
            * np.asarray(s)[..., None]).reshape(3, 5, 64)
    err = np.abs(back - np.asarray(x))
    # per-group bound: half a quantization step
    bound = np.repeat(np.asarray(s), gpt.KV_INT4_GROUP, axis=-1) / 2 + 1e-6
    assert (err <= bound).all()


def test_decode_matches_bf16_cache(params):
    """prefill + decode_step: int4 cache logits within the 4-bit budget of
    the bf16 cache, and well BELOW a broken-path magnitude."""
    b, n_dec = 2, 6
    freqs = _freqs()
    cond = jax.random.randint(jax.random.key(1), (b,), 0, 10)
    cond_emb = gpt.embed_cond(params, CFG, cond, train=False,
                              dtype=jnp.float32)
    emb = jax.random.normal(jax.random.key(2), (b, n_dec, CFG.dim)) * 0.02

    outs = {}
    for name, cache in (("bf16", gpt.init_kv_cache(CFG, b, 16, jnp.float32)),
                        ("int4", gpt.init_kv_cache_int4(CFG, b, 16))):
        lg, cache = gpt.prefill_forward(params, CFG, cond_emb, cache, None,
                                        freqs)
        lg2 = lg
        for i in range(n_dec):
            lg2, cache = gpt.decode_step(params, CFG, emb[:, i:i + 1],
                                         jnp.int32(cond_emb.shape[1] + i),
                                         cache, None, freqs)
        outs[name] = (np.asarray(lg), np.asarray(lg2))

    for a, b_ in zip(outs["bf16"], outs["int4"]):
        ref = np.abs(a).mean()
        err = np.abs(a - b_).mean()
        assert err < 0.2 * ref + 1e-3, (err, ref)


def test_slot_and_block_paths_match_pertoken(params):
    """decode_step_multi and decode_block_multi over the SAME int4 cache
    must agree with each other (same write path, same read kernel)."""
    b, t, s_max = 2, 4, 16
    freqs = _freqs()
    cond = jax.random.randint(jax.random.key(3), (b,), 0, 10)
    emb = gpt.embed_cond(params, CFG, cond, train=False, dtype=jnp.float32)

    def init():
        return gpt.init_kv_cache_int4(CFG, b, s_max)

    _, cache_a = gpt.prefill_forward(params, CFG, emb, init(), None, freqs)
    _, cache_b = gpt.prefill_forward(params, CFG, emb, init(), None, freqs)

    toks = jax.random.randint(jax.random.key(4), (b, t), 0, CFG.vocab_size)
    te = params["tok_embeddings"][toks].astype(jnp.float32)
    pos0 = jnp.full((b,), CFG.cls_token_num, jnp.int32)
    active = jnp.ones((b,), bool)

    lg_blk, cache_a = gpt.decode_block_multi(params, CFG, te, pos0, cache_a,
                                             active, freqs)
    seq = []
    for j in range(t):
        lg, cache_b = gpt.decode_step_multi(params, CFG, te[:, j:j + 1],
                                            pos0 + j, cache_b, active, freqs)
        seq.append(lg)
    seq = np.stack([np.asarray(x) for x in seq], axis=1)
    # both run the identical int4 kernel; differences are only the extra
    # q/prob-row re-quantizations -> tight tolerance
    ref = np.abs(seq).mean()
    assert np.abs(np.asarray(lg_blk) - seq).mean() < 0.1 * ref + 1e-3
    for ea, eb in zip(cache_a, cache_b):
        for k in ea:
            np.testing.assert_array_equal(np.asarray(ea[k]), np.asarray(eb[k]))


def test_window_commit_matches_pertoken(params):
    """The engine's frozen-window path (int8 window bufs re-quantized to s4
    at commit) must stay within the int4 budget of the per-token path."""
    rows, s_max, k = 2, 16, 4
    freqs = _freqs()
    cond = jax.random.randint(jax.random.key(5), (rows,), 0, 10)
    emb = gpt.embed_cond(params, CFG, cond, train=False, dtype=jnp.float32)

    _, cache_a = gpt.prefill_forward(params, CFG, emb,
                                     gpt.init_kv_cache_int4(CFG, rows, s_max),
                                     None, freqs)
    _, cache_b = gpt.prefill_forward(params, CFG, emb,
                                     gpt.init_kv_cache_int4(CFG, rows, s_max),
                                     None, freqs)
    pos0 = jnp.full((rows,), CFG.cls_token_num, jnp.int32)
    active = jnp.ones((rows,), bool)
    toks = jax.random.randint(jax.random.key(6), (rows, k), 0, CFG.vocab_size)
    te = params["tok_embeddings"][toks].astype(jnp.float32)

    # window path
    reads, big_mask = gpt.window_sources(cache_a, pos0, None, None)
    bufs = gpt.init_window_bufs(CFG, rows, k, jnp.float32, int8=True)
    lg_win = None
    for i in range(k):
        lg_win, bufs = gpt.decode_step_window(params, CFG, te[:, i:i + 1],
                                              jnp.int32(i), pos0, reads,
                                              big_mask, bufs, freqs)
    cache_a = gpt.commit_window(cache_a, bufs, pos0, active)

    # per-token path
    lg_tok = None
    for i in range(k):
        lg_tok, cache_b = gpt.decode_step_multi(params, CFG, te[:, i:i + 1],
                                                pos0 + i, cache_b, active,
                                                freqs)

    ref = np.abs(np.asarray(lg_tok)).mean()
    assert np.abs(np.asarray(lg_win) - np.asarray(lg_tok)).mean() \
        < 0.15 * ref + 1e-3
    # committed cache ~ per-token cache (int8 round-trip inside the window
    # path adds a small extra error on top of the shared s4 rounding)
    # layer 0's K depends only on the (identical) token embeddings, so the
    # two paths' committed s4 ints must agree almost everywhere (the int8
    # round-trip can flip a value sitting on an s4 rounding boundary).
    # Later layers legitimately diverge more: the window path ATTENDS to
    # int8 window rows while the per-token path attends to s4-committed
    # rows, so activations differ slightly and compound — that end effect is
    # bounded by the logits assert above.
    written = CFG.cls_token_num + k      # only these columns were ever set
    a0 = np.asarray(cache_a[0]["kT4"][..., :written].astype(jnp.int8))
    b0 = np.asarray(cache_b[0]["kT4"][..., :written].astype(jnp.int8))
    assert (a0 == b0).mean() > 0.9
    assert np.abs(a0 - b0).max() <= 1


def test_generate_kv_int4_tokens():
    params = randomize_head(gpt.init_gpt_params(jax.random.key(7), CFG),
                            key=7)
    from video_llamagen_tpu.inference.generate import generate
    cond = jnp.asarray([1, 2], jnp.int32)
    t16 = generate(params, CFG, cond, jax.random.key(8), 8,
                   cfg_scale=1.5, sample_logits=False)
    t4 = generate(params, CFG, cond, jax.random.key(8), 8,
                  cfg_scale=1.5, sample_logits=False, kv_int4=True)
    assert t4.shape == (2, 8)
    assert int(t4.min()) >= 0 and int(t4.max()) < CFG.vocab_size
    # 4-bit KV shifts near-ties; the greedy stream should still mostly track
    assert np.mean(np.asarray(t16) == np.asarray(t4)) >= 0.5


def test_engine_kv_int4_smoke():
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine
    params = randomize_head(gpt.init_gpt_params(jax.random.key(9), CFG),
                            key=9)
    eng = ServeEngine(params, CFG, max_batch=2, dtype=jnp.float32,
                      kv_int4=True, decode_window=4)
    sp = SamplingParams(max_tokens=6, cfg_scale=2.0)
    out = eng.generate([np.int32(3), np.int32(5)], sp,
                       offline_fast_path=False)
    assert all(len(o.tokens) == 6 for o in out)
    assert all(0 <= t < CFG.vocab_size for o in out for t in o.tokens)
    with pytest.raises(AssertionError):
        ServeEngine(params, CFG, max_batch=2, kv_int8=True, kv_int4=True)
