"""t2v at reference scale, to pixels, with numbers (VERDICT r1 next-step #6).

Stages (one per invocation):
  sample --sampler ar|ar_mse|maskgit   17f@256 through the chosen head on
                                       the chip, tiled CausalVAE decode, mp4,
                                       wall-times recorded
  roundtrip                            synthetic 17f@256 clip -> tiled encode
                                       -> tiled decode -> PSNR/SSIM via
                                       evals/eval_common_metric
Numbers accumulate in results_t2v/t2v_report.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "results_t2v")


def _record(key, value):
    os.makedirs(ROOT, exist_ok=True)
    path = f"{ROOT}/t2v_report.json"
    table = {}
    if os.path.exists(path):
        with open(path) as f:
            table = json.load(f)
    table[key] = value
    with open(path, "w") as f:
        json.dump(table, f, indent=1)
    print(f"recorded {key} -> {value}")


def stage_sample(args):
    os.makedirs(ROOT, exist_ok=True)
    from video_llamagen_tpu.inference import sample_t2v
    t0 = time.perf_counter()
    argv = [
        "--gpt-model", "GPT-B", "--sampler", args.sampler,
        "--image-size", "256", "--downsample-size", "8",
        "--num-frames", "17", "--cls-token-num", "120",
        "--num-sampling-steps", args.num_sampling_steps,
        "--cfg-scale", "4.0", "--batch", "1", "--tiled", "--time",
        "--tiling", args.tiling,
        "--out", f"{ROOT}/t2v_{args.sampler}",
    ]
    if args.vae_bf16:
        argv.append("--vae-bf16")
    sample_t2v.main(argv)
    total = time.perf_counter() - t0
    frames = np.load(f"{ROOT}/t2v_{args.sampler}_frames.npy")
    with open(f"{ROOT}/t2v_{args.sampler}_timings.json") as f:
        timings = json.load(f)
    _record(f"sample_{args.sampler}" + ("_vaebf16" if args.vae_bf16 else ""), {
        "frames": list(frames.shape), "total_wall_s": round(total, 1),
        **timings, "tiling": args.tiling,
        "finite": bool(np.isfinite(frames).all()),
    })


def stage_sampleall(args):
    """All three samplers in ONE process: the tiled VAE decode jit (same
    shape for every head) compiles once; each AR loop still reports its own
    first/steady split."""
    import copy
    for sampler in ("ar", "ar_mse", "maskgit"):
        a = copy.copy(args)
        a.sampler = sampler
        print(f"=== sampler {sampler} ===", flush=True)
        stage_sample(a)


def stage_roundtrip(args):
    """Tiled encode->decode roundtrip of a structured synthetic clip.

    Default: random-init weights at 17f@256 (wall-time focus). With
    --vae-orbax (+ --hidden-size/--frames/--resolution matching the training
    run) it loads a train_vae checkpoint and evals on HELD-OUT moving-shape
    clips (seeds >= 10**6, disjoint from training's step-indexed seeds), so
    the PSNR/SSIM shows what the VAE learned."""
    import jax
    import jax.numpy as jnp
    from video_llamagen_tpu.core.config import CausalVAEConfig
    from video_llamagen_tpu.tokenizers.causal_vae import model as cvae

    t, hw = args.frames, args.resolution
    if args.vae_orbax:
        from video_llamagen_tpu.train.train_vae import moving_clips
        clip = moving_clips(np.random.RandomState(10 ** 6), 2, t, hw)
    else:
        # moving-gradient clip: smooth, compressible, motion across frames
        yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32) / hw
        frames = np.stack([
            np.stack([np.sin(4 * (xx + 0.05 * ti)),
                      np.cos(3 * (yy - 0.04 * ti)),
                      np.sin(5 * (xx + yy + 0.03 * ti))], axis=-1)
            for ti in range(t)])
        clip = frames[None].astype(np.float32)        # (1, t, hw, hw, 3)

    vcfg = CausalVAEConfig(hidden_size=args.hidden_size)
    if args.vae_orbax:
        from video_llamagen_tpu.core.checkpoint import load_vae_orbax
        params = load_vae_orbax(args.vae_orbax, vcfg)
        print(f"loaded VAE params from {args.vae_orbax}")
    else:
        params = cvae.init_causal_vae_params(jax.random.key(0), vcfg)

    enc_fn = (cvae.tiled_encode_spatial_batched if args.tiling == "batched"
              else cvae.tiled_encode_spatial)
    dec_fn = (cvae.tiled_decode_spatial_batched if args.tiling == "batched"
              else cvae.tiled_decode_spatial)
    # first call includes XLA compile; second is steady-state (compile cache)
    t0 = time.perf_counter()
    z = np.asarray(enc_fn(params, vcfg, jnp.asarray(clip)))
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(enc_fn(params, vcfg, jnp.asarray(clip)))
    t_enc2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    dec = np.asarray(dec_fn(params, vcfg, jnp.asarray(z)))
    t_dec = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(dec_fn(params, vcfg, jnp.asarray(z)))
    t_dec2 = time.perf_counter() - t0
    print(f"tiled[{args.tiling}] encode first {t_enc:.1f}s / steady "
          f"{t_enc2:.1f}s (latent {z.shape}); decode first {t_dec:.1f}s / "
          f"steady {t_dec2:.1f}s")

    real_dir, fake_dir = f"{ROOT}/rt_real", f"{ROOT}/rt_fake"
    os.makedirs(real_dir, exist_ok=True)
    os.makedirs(fake_dir, exist_ok=True)
    u8 = lambda x: np.clip(127.5 * x + 128.0, 0, 255).astype(np.uint8)
    for i in range(len(clip)):
        np.save(f"{real_dir}/{i}.npy", u8(clip[i]))
        np.save(f"{fake_dir}/{i}.npy", u8(dec[i]))

    from video_llamagen_tpu.evals import eval_common_metric
    res = eval_common_metric.main([
        "--real-path", real_dir, "--fake-path", fake_dir,
        "--metric", "psnr", "ssim"])
    rec = {"encode_first_s": round(t_enc, 1),
           "encode_steady_s": round(t_enc2, 1),
           "decode_first_s": round(t_dec, 1),
           "decode_steady_s": round(t_dec2, 1),
           "tiling": args.tiling, "latent_shape": list(z.shape)}
    if isinstance(res, dict):
        rec.update({k: round(float(v), 4) for k, v in res.items()})
    key = "vae_roundtrip_trained" if args.vae_orbax \
        else "vae_roundtrip_random_init"
    _record(f"{key}_{args.tiling}" if args.tiling != "batched" else key, rec)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("stage", choices=["sample", "sampleall", "roundtrip"])
    p.add_argument("--sampler", default="ar",
                   choices=["ar", "ar_mse", "maskgit"])
    p.add_argument("--num-sampling-steps", default="100")
    p.add_argument("--vae-orbax", default=None,
                   help="train_vae checkpoint dir; evals held-out "
                        "moving-shape clips with the trained weights")
    p.add_argument("--hidden-size", type=int, default=128)
    p.add_argument("--frames", type=int, default=17)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--tiling", default="batched",
                   choices=["batched", "reference"])
    p.add_argument("--vae-bf16", action="store_true")
    args = p.parse_args()
    globals()[f"stage_{args.stage}"](args)


if __name__ == "__main__":
    sys.exit(main())
