"""Image/video quality metrics: PSNR, SSIM, FID/sFID statistics, IS, P/R.

Capability parity with the reference eval stack:
* PSNR/SSIM per frame (CausalVideoVAE/eval/cal_psnr.py, cal_ssim.py)
* FID/sFID/IS/Precision/Recall math of the ADM evaluator
  (evaluations/c2i/evaluator.py:27-665) — feature extraction is pluggable
  (an InceptionV3 forward or any embedding fn); the npz sample format is kept
  so results are apples-to-apples with the reference pipeline.

All math is numpy/jnp; no TF1 graph needed.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# PSNR / SSIM
# ---------------------------------------------------------------------------

def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Mean PSNR over leading axes; inputs (..., H, W, C) in [0, data_range]."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=(-3, -2, -1))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Per-image SSIM with the standard 11x11 Gaussian window.

    Inputs (N, H, W, C); returns (N,). Matches skimage/video-metrics settings
    (K1=0.01, K2=0.03), the formulation used by eval/cal_ssim.py.
    """
    kernel = jnp.asarray(_gaussian_kernel())[:, :, None, None]

    def filt(x):
        # depthwise 2D convolution
        c = x.shape[-1]
        k = jnp.tile(kernel, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = filt(a * a) - mu_aa
    s_bb = filt(b * b) - mu_bb
    s_ab = filt(a * b) - mu_ab
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


def video_psnr_ssim(a: jnp.ndarray, b: jnp.ndarray,
                    data_range: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, H, W, C) pairs -> per-video mean PSNR and SSIM (frame-averaged),
    the eval_common_metric.py contract."""
    bt = a.shape[0] * a.shape[1]
    flat_a = a.reshape(bt, *a.shape[2:])
    flat_b = b.reshape(bt, *b.shape[2:])
    p = psnr(flat_a, flat_b, data_range).reshape(a.shape[:2]).mean(axis=1)
    s = ssim(flat_a, flat_b, data_range).reshape(a.shape[:2]).mean(axis=1)
    return p, s


# ---------------------------------------------------------------------------
# FID / sFID / IS / Precision-Recall (ADM evaluator math)
# ---------------------------------------------------------------------------

def activation_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (ref evaluator.py FIDStatistics.frechet_distance)."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def inception_score(softmax_probs: np.ndarray, split_size: int = 5000) -> float:
    """IS from softmax outputs (ref evaluator.py compute_inception_score)."""
    scores = []
    for i in range(0, len(softmax_probs), split_size):
        part = softmax_probs[i:i + split_size]
        kl = part * (np.log(part + 1e-12)
                     - np.log(np.expand_dims(np.mean(part, 0), 0) + 1e-12))
        scores.append(np.exp(np.mean(np.sum(kl, 1))))
    return float(np.mean(scores))


def manifold_precision_recall(ref_feats: np.ndarray, sample_feats: np.ndarray,
                              nhood_size: int = 3,
                              batch: int = 2048) -> Tuple[float, float]:
    """Improved-precision-recall (ref evaluator.py ManifoldEstimator).

    precision: fraction of samples inside the reference k-NN manifold;
    recall: fraction of reference points inside the sample manifold.
    """

    def kth_radii(feats: np.ndarray) -> np.ndarray:
        radii = np.zeros(len(feats), np.float32)
        for i in range(0, len(feats), batch):
            d = _pairwise_sq(feats[i:i + batch], feats)
            # k+1 because distance to self is 0
            radii[i:i + batch] = np.partition(d, nhood_size, axis=1)[:, nhood_size]
        return radii

    def contained(queries: np.ndarray, refs: np.ndarray,
                  radii: np.ndarray) -> np.ndarray:
        out = np.zeros(len(queries), bool)
        for i in range(0, len(queries), batch):
            d = _pairwise_sq(queries[i:i + batch], refs)
            out[i:i + batch] = (d <= radii[None, :]).any(axis=1)
        return out

    ref_radii = kth_radii(ref_feats)
    samp_radii = kth_radii(sample_feats)
    precision = contained(sample_feats, ref_feats, ref_radii).mean()
    recall = contained(ref_feats, sample_feats, samp_radii).mean()
    return float(precision), float(recall)


def _pairwise_sq(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (np.sum(a ** 2, 1)[:, None] + np.sum(b ** 2, 1)[None]
            - 2 * a @ b.T)


def compute_fid_suite(ref_feats: np.ndarray, sample_feats: np.ndarray,
                      spatial_ref: Optional[np.ndarray] = None,
                      spatial_sample: Optional[np.ndarray] = None,
                      softmax_probs: Optional[np.ndarray] = None) -> dict:
    """FID (+ optional sFID from spatial features, IS, precision/recall) —
    the full ADM evaluator output (ref evaluator.py:50-60)."""
    mu_r, s_r = activation_statistics(ref_feats)
    mu_s, s_s = activation_statistics(sample_feats)
    out = {"fid": frechet_distance(mu_r, s_r, mu_s, s_s)}
    if spatial_ref is not None and spatial_sample is not None:
        mu_r2, s_r2 = activation_statistics(spatial_ref)
        mu_s2, s_s2 = activation_statistics(spatial_sample)
        out["sfid"] = frechet_distance(mu_r2, s_r2, mu_s2, s_s2)
    if softmax_probs is not None:
        out["inception_score"] = inception_score(softmax_probs)
    p, r = manifold_precision_recall(ref_feats, sample_feats)
    out["precision"], out["recall"] = p, r
    return out


# ---------------------------------------------------------------------------
# ADM npz sample format (interchange with the reference evaluator)
# ---------------------------------------------------------------------------

def create_npz_from_samples(samples_u8: np.ndarray, path: str,
                            labels: Optional[np.ndarray] = None) -> str:
    """(N, H, W, 3) uint8 -> npz with arr_0 (ref reconstruction_vq_ddp.py:25-40)."""
    assert samples_u8.dtype == np.uint8 and samples_u8.ndim == 4
    if labels is not None:
        np.savez(path, arr_0=samples_u8, arr_1=labels)
    else:
        np.savez(path, arr_0=samples_u8)
    return path
