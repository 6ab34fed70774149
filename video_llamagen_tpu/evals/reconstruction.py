"""Reconstruction evaluation: rFID/PSNR/SSIM over a validation set.

Capability parity with reference tokenizer/tokenizer_image/
reconstruction_vq_ddp.py (sharded encode->decode over the val set, per-sample
PSNR/SSIM, npz dump in the ADM evaluator format) and
CausalVideoVAE/scripts/rec_causalvideo_vae.py (video variant). The DDP
sharding becomes a jitted batched roundtrip; multi-host sharding comes free
from BatchIterator(shard_id, num_shards).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .metrics import psnr, ssim, create_npz_from_samples


def _to_u8(x01: np.ndarray) -> np.ndarray:
    return (np.clip(x01, 0, 1) * 255).round().astype(np.uint8)


def reconstruction_eval(roundtrip_fn: Callable[[jnp.ndarray], jnp.ndarray],
                        batches: Iterable[np.ndarray],
                        sample_npz_path: Optional[str] = None,
                        ref_npz_path: Optional[str] = None) -> Dict[str, float]:
    """Run encode->decode over batches of images in [-1, 1] (B, H, W, 3).

    roundtrip_fn: jitted model roundtrip returning reconstructions in [-1, 1].
    Returns mean PSNR/SSIM and writes ADM-format npz files for rFID when paths
    are given (reconstruction_vq_ddp.py:25-175 flow).
    """
    psnrs, ssims = [], []
    samples, refs = [], []
    for batch in batches:
        x = jnp.asarray(batch)
        rec = roundtrip_fn(x)
        x01 = (np.asarray(x, np.float32) + 1) / 2
        r01 = (np.asarray(rec, np.float32) + 1) / 2
        psnrs.append(np.asarray(psnr(jnp.asarray(r01), jnp.asarray(x01))))
        ssims.append(np.asarray(ssim(jnp.asarray(r01), jnp.asarray(x01))))
        if sample_npz_path:
            samples.append(_to_u8(r01))
        if ref_npz_path:
            refs.append(_to_u8(x01))

    out = {"psnr": float(np.concatenate(psnrs).mean()),
           "ssim": float(np.concatenate(ssims).mean()),
           "n": int(sum(len(p) for p in psnrs))}
    if sample_npz_path and samples:
        create_npz_from_samples(np.concatenate(samples), sample_npz_path)
        out["sample_npz"] = sample_npz_path
    if ref_npz_path and refs:
        create_npz_from_samples(np.concatenate(refs), ref_npz_path)
        out["ref_npz"] = ref_npz_path
    return out


def vq_roundtrip_fn(params, cfg):
    """Jitted VQ encode->decode (the rFID subject)."""
    from ..tokenizers.vq import model as vq

    @jax.jit
    def roundtrip(x):
        dec, _, _ = vq.forward(params, cfg, x)
        return dec

    return roundtrip


def causal_vae_roundtrip_fn(params, cfg, sample: bool = True, seed: int = 0):
    """Jitted CausalVAE video encode->decode (rec_causalvideo_vae.py flow)."""
    from ..tokenizers.causal_vae import model as cv

    @jax.jit
    def roundtrip(x):
        post = cv.encode(params, cfg, x)
        z = post.sample(jax.random.key(seed)) if sample else post.mode()
        return cv.decode(params, cfg, z)

    return roundtrip
