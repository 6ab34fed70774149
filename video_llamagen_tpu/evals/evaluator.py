"""ADM evaluator CLI: `python -m ...evals.evaluator ref.npz sample.npz`.

Parity with reference evaluations/c2i/evaluator.py:27-60 (TF1 InceptionV3
graph → FID/sFID/IS/Precision/Recall over npz batches): same npz format
(arr_0 uint8 images), same metric suite, but features come from the JAX
InceptionV3 (evals/inception.py) with pytorch-fid weights supplied locally
(--inception-ckpt). Without weights a random-init net runs the full pipeline
for smoke/relative use (clearly warned).
"""

from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np
import jax


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ref_batch", help="reference npz (arr_0 uint8 images)")
    p.add_argument("sample_batch", help="sample npz")
    p.add_argument("--inception-ckpt", default=None,
                   help="pytorch-fid pt_inception-2015-12-05 weights")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--force-platform", default=None)
    p.add_argument("--no-cache", action="store_true",
                   help="disable the <npz>.acts-<key>.npz activation cache")
    args = p.parse_args(argv)

    if args.force_platform:
        jax.config.update("jax_platforms", args.force_platform)

    from .inception import (load_inception_checkpoint, init_inception_params,
                            extract_fid_features)
    from .metrics import compute_fid_suite

    if args.inception_ckpt:
        params = load_inception_checkpoint(args.inception_ckpt)
    else:
        print("WARNING: random-init InceptionV3 — numbers are NOT comparable "
              "to published FID; supply --inception-ckpt for real metrics")
        params = init_inception_params(jax.random.key(0))

    def load(path):
        arr = np.load(path)["arr_0"]
        if args.limit:
            arr = arr[: args.limit]
        assert arr.dtype == np.uint8 and arr.ndim == 4, (arr.dtype, arr.shape)
        return arr

    if args.inception_ckpt:
        # content-addressed: replacing the checkpoint file in place under the
        # same name must invalidate cached activations
        ch = hashlib.sha1()
        with open(args.inception_ckpt, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 22), b""):
                ch.update(chunk)
        ckpt_id = f"{os.path.basename(args.inception_ckpt)}-{ch.hexdigest()[:8]}"
    else:
        ckpt_id = "random0"

    def features(path, label):
        """Activations for one npz, cached next to it keyed by file content +
        inception weights + limit (reruns against the same reference batch —
        the common case in a FID-vs-steps sweep — skip the ~15 min on-chip
        recompute)."""
        cache = None
        if not args.no_cache:
            h = hashlib.sha1()
            with open(path, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 22), b""):
                    h.update(chunk)
            key = (f"{h.hexdigest()[:12]}-{ckpt_id}-{args.limit or 'all'}"
                   f"-b{args.batch}")
            cache = f"{path}.acts-{key}.npz"
            if os.path.exists(cache):
                print(f"{label} activations from cache {cache}")
                d = np.load(cache)
                return {k: d[k] for k in d.files}
        print(f"computing {label} batch activations...")
        out = extract_fid_features(params, load(path), args.batch)
        if cache:
            np.savez(cache, **out)
        return out

    ref = features(args.ref_batch, "reference")
    samp = features(args.sample_batch, "sample")

    out = compute_fid_suite(ref["pool3"], samp["pool3"],
                            spatial_ref=ref["spatial"],
                            spatial_sample=samp["spatial"],
                            softmax_probs=samp["softmax"])
    for k in ("inception_score", "fid", "sfid", "precision", "recall"):
        if k in out:
            print(f"{k.replace('inception_score', 'Inception Score').upper()}:"
                  f" {out[k]:.5f}")
    return out


if __name__ == "__main__":
    main()
