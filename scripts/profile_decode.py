"""Per-step decode breakdown for GPT-L on the real chip (VERDICT r1 weak #3).

Decomposes the measured step time into weight-stream / KV-read / sampling
components by measuring controlled variants:

  A. full bench config        (batch 8, CFG->16 rows, S=577, sampled)
  B. no-CFG                   (batch 8,          8 rows, S=577)  -> KV traffic halves
  C. short-context            (batch 8, CFG->16 rows, S=65)     -> ~weights-only
  D. greedy (sample off)      (A without top-k sampling)        -> sampling cost
  E. batch ladder             (16/32/64 at 576 tokens)          -> tok/s/chip scaling

Each timing is best-of-N (tunnel transients) of a full generate() call,
divided by the number of decode steps. Prints a markdown table + JSON.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_cfg(name, model, batch, n_tokens, cfg_scale, top_k, sample_logits,
            iters=3, kv_int8=False, weight_int8=False, n_chunks=1,
            weight_int4=False):
    from video_llamagen_tpu.core.config import gpt_config
    from video_llamagen_tpu.models import gpt
    from video_llamagen_tpu.inference.generate import generate

    cfg = gpt_config(model, vocab_size=16384, block_size=n_tokens,
                     num_classes=1000, cls_token_num=1, model_type="c2i",
                     dtype="bfloat16")
    params = gpt.init_gpt_params(jax.random.key(0), cfg)
    params = gpt.cast_params(params, jnp.bfloat16)
    if weight_int8:
        from video_llamagen_tpu.ops.quant import quantize_gpt_params
        params = quantize_gpt_params(params)
    if weight_int4:
        from video_llamagen_tpu.ops.quant import quantize_gpt_params4
        params = quantize_gpt_params4(params)
        if weight_int4 == "packed":
            from video_llamagen_tpu.ops.qmatmul4 import pack_gpt_params4
            params = pack_gpt_params4(params)
    cond = jnp.arange(batch, dtype=jnp.int32) % cfg.num_classes

    def run(seed):
        seq = generate(params, cfg, cond, jax.random.key(seed), n_tokens,
                       cfg_scale=cfg_scale, top_k=top_k,
                       sample_logits=sample_logits, kv_int8=kv_int8,
                       n_chunks=n_chunks)
        return np.asarray(seq)

    t0 = time.perf_counter()
    run(0)
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    steps = n_tokens  # prefill + (n-1) scan steps ~ n steps
    rec = {
        "name": name, "model": model, "batch": batch, "rows":
        batch * (2 if cfg_scale > 1 else 1), "n_tokens": n_tokens,
        "cfg_scale": cfg_scale, "kv_int8": kv_int8, "weight_int8": weight_int8,
        "weight_int4": weight_int4,
        "n_chunks": n_chunks,
        "total_s": round(dt, 4), "ms_per_step": round(dt / steps * 1e3, 3),
        "tok_s": round(batch * n_tokens / dt, 1),
        "compile_s": round(compile_s - dt, 1),
        "iter_times": [round(t, 3) for t in times],
    }
    print(json.dumps(rec), flush=True)
    return rec


CONFIGS = {
    # name: (model, batch, n_tokens, cfg_scale, top_k, sample_logits, extra)
    "A_bench": ("GPT-L", 8, 576, 2.0, 1000, True, {}),
    "B_nocfg": ("GPT-L", 8, 576, 1.0, 1000, True, {}),
    "C_short": ("GPT-L", 8, 64, 2.0, 1000, True, {}),
    "D_greedy": ("GPT-L", 8, 576, 2.0, 0, False, {}),
    "E_b16": ("GPT-L", 16, 576, 2.0, 1000, True, {}),
    "E_b32": ("GPT-L", 32, 576, 2.0, 1000, True, {}),
    "E_b64": ("GPT-L", 64, 576, 2.0, 1000, True, {}),
    "F_kv8": ("GPT-L", 8, 576, 2.0, 1000, True, {"kv_int8": True}),
    "G_w8": ("GPT-L", 8, 576, 2.0, 1000, True, {"weight_int8": True}),
    "H_kv8w8": ("GPT-L", 8, 576, 2.0, 1000, True,
                {"kv_int8": True, "weight_int8": True}),
    "I_b64_kv8w8": ("GPT-L", 64, 576, 2.0, 1000, True,
                    {"kv_int8": True, "weight_int8": True}),
    "J_chunk4": ("GPT-L", 8, 576, 2.0, 1000, True, {"n_chunks": 4}),
    "N_b16_chunk4": ("GPT-L", 16, 576, 2.0, 1000, True, {"n_chunks": 4}),
    "N_b32_chunk4": ("GPT-L", 32, 576, 2.0, 1000, True, {"n_chunks": 4}),
    "N_b64_kv8": ("GPT-L", 64, 576, 2.0, 1000, True,
                  {"n_chunks": 4, "kv_int8": True}),
    "N_b128_chunk4": ("GPT-L", 128, 576, 2.0, 1000, True, {"n_chunks": 4}),
    "K_chunk8": ("GPT-L", 8, 576, 2.0, 1000, True, {"n_chunks": 8}),
    "L_chunk4_kv8": ("GPT-L", 8, 576, 2.0, 1000, True,
                     {"n_chunks": 4, "kv_int8": True}),
    "M_b64_chunk4": ("GPT-L", 64, 576, 2.0, 1000, True, {"n_chunks": 4}),
    "O_b96_chunk4": ("GPT-L", 96, 576, 2.0, 1000, True, {"n_chunks": 4}),
    "O_b128_kv8": ("GPT-L", 128, 576, 2.0, 1000, True,
                   {"n_chunks": 4, "kv_int8": True}),
    "P_b256_kv8": ("GPT-L", 256, 576, 2.0, 1000, True,
                   {"n_chunks": 4, "kv_int8": True}),
    # W4A16 grouped int4 weights: small-batch latency lever (weight stream
    # dominates at batch<=8); W4 vs W8 vs bf16 at batch 8 answers whether
    # the TPU streams packed s4 bytes through the grouped dots
    "Q_w4": ("GPT-L", 8, 576, 2.0, 1000, True, {"weight_int4": True}),
    "Q_w4_kv8": ("GPT-L", 8, 576, 2.0, 1000, True,
                 {"weight_int4": True, "kv_int8": True}),
    "Q_b1_w4": ("GPT-L", 1, 576, 2.0, 1000, True, {"weight_int4": True}),
    "Q_b1_w4p": ("GPT-L", 1, 576, 2.0, 1000, True,
                 {"weight_int4": "packed"}),   # nibble-packed Pallas kernel
    "Q_w4p": ("GPT-L", 8, 576, 2.0, 1000, True, {"weight_int4": "packed"}),
    "Q_b1_bf16": ("GPT-L", 1, 576, 2.0, 1000, True, {}),
    "Q_b1_w8": ("GPT-L", 1, 576, 2.0, 1000, True, {"weight_int8": True}),
    # generate-path twin of the serving probe's variant A (same batch/dtype/
    # full-length reads): isolates the slot machinery's cost vs the offline
    # scalar-pos scan
    "Q_b32_kv8_full": ("GPT-L", 32, 576, 2.0, 1000, True, {"kv_int8": True}),
}


def main():
    # one config per invocation: each run stays well under the 10-min shell
    # timeout so the TPU client is never killed (tunnel-wedge hazard)
    assert jax.default_backend() == "tpu", "profile runs on the real chip"
    names = sys.argv[1:] or ["A_bench"]
    out = {}
    if os.path.exists("profile_decode.json"):
        with open("profile_decode.json") as f:
            out = json.load(f)
    for name in names:
        model, batch, n_tok, cs, tk, sl, extra = CONFIGS[name]
        out[name] = run_cfg(name, model, batch, n_tok, cs, tk, sl, **extra)
        with open("profile_decode.json", "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
