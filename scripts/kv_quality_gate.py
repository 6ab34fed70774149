"""int4/int8 KV quality gate on a TRAINED model (VERDICT r3 next-step #8).

Numerics tests pin the int4 quantization error; this measures what that
error DOES to a real model's outputs before kv_int4 can be a serving
default:

  greedy — per-position greedy-token match rate vs the bf16 cache
           (int8 and int4), on the trained GPT-L from the quality loop.
  fid    — sample 4096 images per KV mode through the real sampler and
           score rFID-random against the quality loop's reference batch.

Stages (one per invocation — chip runs stay under shell timeouts):
  python scripts/kv_quality_gate.py greedy [--gpt-dir gptL --step 6000]
  python scripts/kv_quality_gate.py sample --kv {bf16,int8,int4} [...]
  python scripts/kv_quality_gate.py fid --kv {bf16,int8,int4}

Results accumulate in results_quality/kv_gate.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "results_quality")
SIZE, N_CLASSES = 64, 16


def _record(key, value):
    path = f"{ROOT}/kv_gate.json"
    table = {}
    if os.path.exists(path):
        with open(path) as f:
            table = json.load(f)
    table[key] = value
    with open(path, "w") as f:
        json.dump(table, f, indent=1)
    print(f"recorded {key} -> {value}")


def _load(args):
    import jax.numpy as jnp
    from video_llamagen_tpu.core.checkpoint import load_gpt_orbax
    from video_llamagen_tpu.core.config import gpt_config
    latent = SIZE // 8
    cfg = gpt_config(args.gpt_model, vocab_size=16384,
                     block_size=latent ** 2, num_classes=N_CLASSES,
                     cls_token_num=1, model_type="c2i", dtype="bfloat16")
    params = load_gpt_orbax(f"{ROOT}/{args.gpt_dir}/checkpoints", cfg,
                            step=args.step, dtype="bfloat16")
    return cfg, params


def stage_greedy(args):
    import jax
    import jax.numpy as jnp
    from video_llamagen_tpu.inference.generate import generate

    cfg, params = _load(args)
    labels = jnp.asarray((np.arange(args.batch) % N_CLASSES).astype(np.int32))
    r = jax.random.key(0)
    outs = {}
    for mode, kw in (("bf16", {}), ("int8", {"kv_int8": True}),
                     ("int4", {"kv_int4": True})):
        try:
            toks = generate(params, cfg, labels, r, cfg.block_size,
                            cfg_scale=args.cfg_scale, sample_logits=False,
                            **kw)
            outs[mode] = np.asarray(toks)
            print(f"greedy[{mode}] done", flush=True)
        except Exception as e:   # e.g. s4 dispatch unsupported on backend
            print(f"greedy[{mode}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
    res = {}
    for mode in ("int8", "int4"):
        if mode not in outs or "bf16" not in outs:
            res[f"{mode}_match_all"] = None
            continue
        match = (outs[mode] == outs["bf16"])
        res[f"{mode}_match_all"] = round(float(match.mean()), 4)
        res[f"{mode}_match_first64"] = round(float(match[:, :64].mean()), 4)
        res[f"{mode}_seq_identical"] = round(float(match.all(1).mean()), 4)
    res.update(gpt_dir=args.gpt_dir, step=args.step, batch=args.batch)
    _record("greedy_match", res)


def stage_sample(args):
    from video_llamagen_tpu.inference import sample_npz
    kw = {"int8": ["--kv-int8"], "int4": ["--kv-int4"], "bf16": []}[args.kv]
    sample_npz.main([
        "--gpt-model", args.gpt_model,
        "--gpt-orbax", f"{ROOT}/{args.gpt_dir}/checkpoints",
        "--gpt-step", str(args.step), "--vq-model", "VQ-8",
        "--vq-orbax", f"{ROOT}/checkpoints",
        "--image-size", str(SIZE), "--downsample-size", "8",
        "--num-classes", str(N_CLASSES),
        "--num-samples", "4096", "--per-batch", "64",
        "--cfg-scale", str(args.cfg_scale), "--top-k", "1000",
        "--out", f"{ROOT}/kv_gate_samples_{args.kv}.npz",
    ] + kw)


def stage_fid(args):
    from video_llamagen_tpu.evals import evaluator
    res = evaluator.main([f"{ROOT}/ref_batch.npz",
                          f"{ROOT}/kv_gate_samples_{args.kv}.npz"])
    if isinstance(res, dict):
        _record(f"fid_{args.kv}", {k: round(float(v), 4)
                                   for k, v in res.items()})


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("stage", choices=["greedy", "sample", "fid"])
    p.add_argument("--gpt-model", default="GPT-L")
    p.add_argument("--gpt-dir", default="gptL")
    p.add_argument("--step", type=int, default=6000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--cfg-scale", type=float, default=2.0)
    p.add_argument("--kv", choices=["bf16", "int8", "int4"], default="bf16")
    args = p.parse_args()
    globals()[f"stage_{args.stage}"](args)


if __name__ == "__main__":
    sys.exit(main())
