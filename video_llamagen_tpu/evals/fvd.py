"""FVD (Fréchet Video Distance) + feature-extractor protocol.

Capability parity with reference CausalVideoVAE/.../eval/fvd/ (two I3D
implementations: styleganv and videogpt torchscript). The metric math —
Fréchet distance over I3D logits/pool features — lives here; feature
extraction is pluggable:

* `fvd_from_features(real, fake)` — the metric given (N, D) feature arrays;
* `I3DFeatureExtractor` — wraps a local torchscript I3D (the videogpt
  variant's format) through torch-CPU when weights are available locally
  (zero-egress: they cannot be downloaded here);
* `preprocess_videos` — the resize/scale contract both reference impls use
  (range [0,1] -> [-1,1], 224x224).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .metrics import frechet_distance, activation_statistics
from ..data.transforms import _resize_bilinear


def fvd_from_features(real_feats: np.ndarray, fake_feats: np.ndarray) -> float:
    """FVD = Fréchet distance between I3D feature Gaussians
    (ref eval/fvd/styleganv/fvd.py frechet_distance)."""
    mu_r, s_r = activation_statistics(real_feats.astype(np.float64))
    mu_f, s_f = activation_statistics(fake_feats.astype(np.float64))
    return frechet_distance(mu_r, s_r, mu_f, s_f)


def preprocess_videos(videos01: np.ndarray, target: int = 224) -> np.ndarray:
    """(B, T, H, W, 3) in [0,1] -> resized (B, T, 224, 224, 3) in [-1,1]
    (ref eval/fvd/*/fvd.py preprocess contract)."""
    b, t = videos01.shape[:2]
    flat = videos01.reshape(b * t, *videos01.shape[2:])
    resized = _resize_bilinear(flat, target, target)
    out = resized.reshape(b, t, target, target, 3)
    return out * 2.0 - 1.0


class I3DFeatureExtractor:
    """Torchscript I3D features (videogpt variant's i3d_torchscript.pt)."""

    def __init__(self, model_path: str, device: str = "cpu"):
        import torch
        self._torch = torch
        self.model = torch.jit.load(model_path, map_location=device).eval()
        self.device = device

    def __call__(self, videos01: np.ndarray, batch: int = 4) -> np.ndarray:
        """(B, T, H, W, 3) in [0,1] -> (B, 400) logits features."""
        torch = self._torch
        vids = preprocess_videos(videos01)
        # torchscript I3D wants (B, C, T, H, W)
        x = torch.from_numpy(vids.transpose(0, 4, 1, 2, 3)).float()
        feats = []
        kwargs = dict(rescale=False, resize=False, return_features=True)
        with torch.no_grad():
            for i in range(0, len(x), batch):
                feats.append(self.model(x[i:i + batch].to(self.device),
                                        **kwargs).cpu().numpy())
        return np.concatenate(feats)


def compute_fvd(real_videos01: np.ndarray, fake_videos01: np.ndarray,
                feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                i3d_path: Optional[str] = None) -> float:
    """End-to-end FVD. Provide either a feature_fn or a local I3D path."""
    if feature_fn is None:
        if i3d_path is None:
            raise ValueError("need feature_fn or i3d_path (no network egress "
                             "to download I3D weights)")
        feature_fn = I3DFeatureExtractor(i3d_path)
    return fvd_from_features(feature_fn(real_videos01),
                             feature_fn(fake_videos01))
