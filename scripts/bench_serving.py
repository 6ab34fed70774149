"""Serving benchmarks: offline ladder rows + online continuous batching.

Offline (ref autoregressive/serve/README.md:12-16 table — batch-8 @576):
    python scripts/bench_serving.py offline GPT-B GPT-L ... [--weight-int8]
Online (VERDICT r1 next-step #5: staggered arrivals, tok/s + TTFT/E2E
latency percentiles):
    python scripts/bench_serving.py online GPT-L --rate 4 --num-requests 32

One model per invocation keeps each run under shell timeouts (never kill a
TPU client — tunnel-wedge hazard).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(model, max_batch, weight_int8=False, kv_int8=False,
          decode_window=1, n_tokens=576, kv_int4=False, draft_model=None,
          spec_k=4, weight_int4=False, cache_group=8, kv_merged=False,
          max_window=None):
    from video_llamagen_tpu.core.config import gpt_config
    from video_llamagen_tpu.models import gpt
    from video_llamagen_tpu.serve.engine import ServeEngine

    cfg = gpt_config(model, vocab_size=16384, block_size=n_tokens,
                     num_classes=1000, cls_token_num=1, model_type="c2i",
                     dtype="bfloat16")

    # Fabricate bench weights in ONE jit with LAYER-SEQUENTIAL peak memory
    # (gpt.fabricate_gpt_params lax.scan): eager fabrication OOMs GPT-3B
    # (12.4 GB f32 alone) and the earlier whole-tree-vmapped fused jit OOMed
    # GPT-7B (f32[32,4096,11008] init temps, results_chain/gpt7b_w4_kv8.log).
    quant = ("int4_packed" if weight_int4 == "packed" else
             "int4" if weight_int4 else
             "int8" if weight_int8 else None)

    def fabricate(key):
        return gpt.fabricate_gpt_params(key, cfg, jnp.bfloat16, quant=quant)

    params = jax.jit(fabricate)(jax.random.key(0))
    draft_params = draft_cfg = None
    if draft_model:
        draft_cfg = gpt_config(draft_model, vocab_size=16384,
                               block_size=n_tokens, num_classes=1000,
                               cls_token_num=1, model_type="c2i",
                               dtype="bfloat16")
        draft_params = jax.jit(lambda k: gpt.cast_params(
            gpt.init_gpt_params(k, draft_cfg), jnp.bfloat16))(
                jax.random.key(1))
    eng = ServeEngine(params, cfg, max_batch=max_batch,
                      weight_int8=weight_int8, weight_int4=weight_int4,
                      kv_int8=kv_int8,
                      kv_int4=kv_int4, kv_merged=kv_merged,
                      decode_window=decode_window, max_window=max_window,
                      draft_params=draft_params, draft_cfg=draft_cfg,
                      spec_k=spec_k, cache_group=cache_group)
    del params, draft_params
    return cfg, eng


def bench_offline(args):
    from video_llamagen_tpu.serve.engine import SamplingParams
    out = {}
    for model in args.models:
        cfg, eng = build(model, args.batch, args.weight_int8, args.kv_int8,
                         kv_int4=args.kv_int4, draft_model=args.draft_model,
                         spec_k=args.spec_k, weight_int4=args.weight_int4,
                         kv_merged=args.kv_merged, n_tokens=args.n_tokens)
        sp = SamplingParams(max_tokens=args.n_tokens, cfg_scale=2.0,
                            top_k=1000)
        conds = list(range(args.batch))
        eng.generate(conds, sp)                       # compile
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            eng.generate(conds, sp)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rec = {"model": model, "batch": args.batch, "n_tokens": args.n_tokens,
               "weight_int8": args.weight_int8,
               "weight_int4": args.weight_int4, "kv_int8": args.kv_int8,
               "kv_int4": args.kv_int4, "kv_merged": args.kv_merged,
               "total_s": round(dt, 3),
               "tok_s": round(args.batch * args.n_tokens / dt, 1),
               "iter_times": [round(t, 3) for t in times]}
        if args.draft_model:
            rec["draft_model"] = args.draft_model
            rec["spec_k"] = args.spec_k
            stats = eng.log_stats()
            if "spec_alpha" in stats:
                rec["spec_alpha"] = stats["spec_alpha"]
        print(json.dumps(rec), flush=True)
        # key must disambiguate every config that changes the number:
        # quantization AND batch AND n_tokens AND spec mode (a spec-b32 row
        # once clobbered the plain GPT-L b8 row because neither was keyed).
        # Non-default values are compared against the PARSER defaults, not
        # hard-coded literals, so changing a default can't silently re-alias
        # old keys.
        key = model + ("_w8" if args.weight_int8 else "") \
                    + ("_w4p" if args.weight_int4 == "packed"
                       else "_w4" if args.weight_int4 else "") \
                    + ("_kv8" if args.kv_int8 else "") \
                    + ("_kv4" if args.kv_int4 else "") \
                    + ("_kvm" if args.kv_merged else "")
        if args.batch != args.parser_defaults["batch"]:
            key += f"_b{args.batch}"
        if args.n_tokens != args.parser_defaults["n_tokens"]:
            key += f"_t{args.n_tokens}"
        if args.draft_model:
            key += f"_spec{args.spec_k}_{args.draft_model}"
        out[key] = rec
        del eng
    _merge("bench_serving_offline.json", out)


def bench_online(args):
    """Poisson arrivals into the continuous-batching engine; reports online
    tok/s and TTFT / E2E latency percentiles."""
    from video_llamagen_tpu.serve.engine import SamplingParams
    _, eng = build(args.models[0], args.batch, args.weight_int8,
                   args.kv_int8, decode_window=args.decode_window,
                   n_tokens=args.n_tokens, kv_int4=args.kv_int4,
                   draft_model=args.draft_model, spec_k=args.spec_k,
                   weight_int4=args.weight_int4,
                   cache_group=args.cache_group,
                   max_window=args.max_window, kv_merged=args.kv_merged)
    sp = SamplingParams(max_tokens=args.n_tokens, cfg_scale=2.0, top_k=1000)

    # Compile every dispatchable graph BEFORE the clock starts — decode
    # windows x read buckets AND the full admission set (prefill buckets,
    # cohort sampler, device-arg updates): engine.prewarm() owns the
    # complete set since the round-3 runs compiled the solo-admission
    # (jobs=1) prefill cold MID-RUN, a ~60 s stall that queued every
    # arrival behind it (TTFT p50 42-70 s at 2 req/s). Two short real
    # drains after prewarm exercise the host paths end to end.
    print(f"prewarm: {eng.prewarm()} graphs", flush=True)
    warm_sp = SamplingParams(max_tokens=3 * args.decode_window, cfg_scale=2.0,
                             top_k=1000)
    n_warmed = 0
    for m in (1, args.batch):
        for i in range(m):     # distinct warm conds, below the CFG null class
            eng.add_request(np.int32(100 + n_warmed % 899), warm_sp)
            n_warmed += 1
        while eng.has_unfinished():
            eng.step()
    # Drop every prefix-cache entry the warm-up populated: for
    # --num-requests > 100 the warm conds (100..998) overlap the measured
    # run's conds (i % 1000), and serving warm entries would inflate
    # prefix_hits / deflate TTFT vs a cold engine.
    eng.prefix_cache.clear()
    eng.stats.update(requests_done=0, tokens_generated=0, steps=0,
                     prefix_hits=0, prefix_misses=0)

    if args.debug:
        # Catch anything that STILL compiles cold mid-run after prewarm +
        # warm drains (enabled only now so warmup compiles don't spam), and
        # print per-step timing so stalls are attributable.
        jax.config.update("jax_log_compiles", True)

    for rate in (args.rates or [args.rate]):
        rng = np.random.default_rng(0)
        arrivals = np.cumsum(rng.exponential(1.0 / rate, args.num_requests))
        t0 = time.monotonic()
        pending = list(enumerate(arrivals))
        done = []
        while len(done) < args.num_requests:
            now = time.monotonic() - t0
            while pending and pending[0][1] <= now:
                i, at = pending.pop(0)
                rid = eng.add_request(np.int32(i % 1000), sp)
                # backdate arrival to the scheduled time for honest latency
                for r in eng.queue:
                    if r.request_id == rid:
                        r.arrival_t = t0 + at
            if args.debug:
                q0 = len(eng.queue)
                a0 = sum(s is not None for s in eng.slots)
                ts = time.monotonic()
                done.extend(eng.step())
                dur = time.monotonic() - ts
                print(f"[dbg t={now:7.2f}] step dur={dur:6.3f}s q={q0:3d} "
                      f"act={a0:3d} done={len(done)}", flush=True)
            else:
                done.extend(eng.step())
            if not eng.has_unfinished() and pending:
                time.sleep(max(0.0, pending[0][1] - (time.monotonic() - t0)))
        dt = time.monotonic() - t0

        ttft = np.array([r.first_token_t - r.arrival_t for r in done])
        e2e = np.array([r.finish_t - r.arrival_t for r in done])
        rec = {
            "model": args.models[0], "mode": "online", "rate_rps": rate,
            "num_requests": args.num_requests, "max_batch": args.batch,
            "n_tokens": args.n_tokens, "decode_window": args.decode_window,
            "max_window": args.max_window,
            "elapsed_s": round(dt, 2),
            "tok_s": round(sum(len(r.tokens) for r in done) / dt, 1),
            "ttft_p50_s": round(float(np.percentile(ttft, 50)), 3),
            "ttft_p99_s": round(float(np.percentile(ttft, 99)), 3),
            "e2e_p50_s": round(float(np.percentile(e2e, 50)), 3),
            "e2e_p99_s": round(float(np.percentile(e2e, 99)), 3),
            "engine_steps": eng.stats["steps"],
            "prefix_hits": eng.stats.get("prefix_hits", 0),
        }
        print(json.dumps(rec), flush=True)
        rec["weight_int8"] = args.weight_int8
        rec["weight_int4"] = args.weight_int4
        rec["kv_int8"] = args.kv_int8
        rec["kv_int4"] = args.kv_int4
        key = (f"{args.models[0]}_b{args.batch}_w{args.decode_window}"
               + (f"m{args.max_window}" if args.max_window else "")
               + f"_r{rate}"
               + ("_w8" if args.weight_int8 else "")
               + ("_w4p" if args.weight_int4 == "packed"
                  else "_w4" if args.weight_int4 else "")
               + ("_kv8" if args.kv_int8 else "")
               + ("_kv4" if args.kv_int4 else "")
               + ("_kvm" if args.kv_merged else ""))
        if not args.debug:     # debug prints skew the timings; don't record
            _merge("bench_serving_online.json", {key: rec})
        eng.stats.update(requests_done=0, tokens_generated=0, steps=0,
                         prefix_hits=0, prefix_misses=0)


def _merge(path, new):
    cur = {}
    if os.path.exists(path):
        with open(path) as f:
            cur = json.load(f)
    cur.update(new)
    with open(path, "w") as f:
        json.dump(cur, f, indent=1)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["offline", "online"])
    p.add_argument("models", nargs="+")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n-tokens", type=int, default=576)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--weight-int8", action="store_true")
    p.add_argument("--weight-int4", action="store_true",
                   help="grouped int4 weights, W4A16 (ops/quant.py "
                        "QuantizedLinear4; quarter the bf16 weight stream)")
    p.add_argument("--weight-int4-packed", action="store_true",
                   help="W4A16 via the nibble-packed Pallas kernel "
                        "(ops/qmatmul4.py) instead of the XLA s4 einsum")
    p.add_argument("--kv-int8", action="store_true")
    p.add_argument("--draft-model", default=None,
                   help="enable speculative serving with this draft GPT "
                        "(random weights; real acceptance needs trained "
                        "pairs -> scripts/bench_spec.py trained)")
    p.add_argument("--spec-k", type=int, default=4)
    p.add_argument("--kv-int4", action="store_true",
                   help="s4 KV cache (quarter the bf16 KV stream; "
                        "models/gpt.init_kv_cache_int4)")
    p.add_argument("--kv-merged", action="store_true",
                   help="merged (B*KH, S, D) cache layout — required at "
                        "GPT-7B dims (layout-padding OOM otherwise; "
                        "models/gpt.init_kv_cache_merged). Composes with "
                        "--kv-int8; offline AND online (continuous "
                        "batching expands each CFG row to its KH merged "
                        "rows)")
    p.add_argument("--rate", type=float, default=4.0)
    p.add_argument("--rates", type=float, nargs="+", default=None,
                   help="measure several Poisson rates in ONE process "
                        "(warmup compiles are paid once)")
    p.add_argument("--num-requests", type=int, default=32)
    p.add_argument("--decode-window", type=int, default=16)
    p.add_argument("--max-window", type=int, default=None,
                   help="adaptive window ceiling: at full occupancy the "
                        "fused window grows decode_window..max_window "
                        "through a prewarmed pow2 ladder (engine "
                        "_pick_window); default = static windows")
    p.add_argument("--cache-group", type=int, default=8,
                   help="layers per cache-maintenance dispatch (engine "
                        "cache_group)")
    p.add_argument("--debug", action="store_true",
                   help="per-step timing lines + jax_log_compiles after "
                        "warmup (diagnose online stalls; skews the rec)")
    args = p.parse_args()
    args.parser_defaults = {"batch": p.get_default("batch"),
                            "n_tokens": p.get_default("n_tokens")}
    if args.weight_int4_packed:
        args.weight_int4 = "packed"   # build() packs after quantizing
    if args.mode == "offline":
        bench_offline(args)
    else:
        bench_online(args)


if __name__ == "__main__":
    sys.exit(main())
