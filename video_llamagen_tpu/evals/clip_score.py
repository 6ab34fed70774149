"""CLIP score for t2i evaluation (ref evaluations/t2i/evaluation.py:130-259).

Wraps HF's Flax CLIP (local weights — zero-egress environment): encodes
images + prompts, scores w * max(cos(image, text), 0) averaged over pairs,
the standard CLIPScore formulation the reference computes via torchmetrics.
"""

from __future__ import annotations

from typing import List

import numpy as np


class ClipScorer:
    def __init__(self, model_dir: str, weight: float = 100.0):
        from transformers import AutoProcessor, FlaxCLIPModel
        self.model = FlaxCLIPModel.from_pretrained(model_dir, from_pt=True)
        self.processor = AutoProcessor.from_pretrained(model_dir)
        self.weight = weight

    def __call__(self, images_u8: np.ndarray, prompts: List[str],
                 batch: int = 16) -> float:
        """images (N, H, W, 3) uint8 + N prompts -> mean CLIP score."""
        assert len(images_u8) == len(prompts)
        scores = []
        for i in range(0, len(prompts), batch):
            inputs = self.processor(
                text=list(prompts[i:i + batch]),
                images=[img for img in images_u8[i:i + batch]],
                return_tensors="np", padding=True, truncation=True)
            out = self.model(**inputs)
            img_emb = out.image_embeds / np.linalg.norm(
                out.image_embeds, axis=-1, keepdims=True)
            txt_emb = out.text_embeds / np.linalg.norm(
                out.text_embeds, axis=-1, keepdims=True)
            cos = np.sum(img_emb * txt_emb, axis=-1)
            scores.append(self.weight * np.maximum(cos, 0.0))
        return float(np.concatenate(scores).mean())


def clip_score_from_features(image_feats: np.ndarray, text_feats: np.ndarray,
                             weight: float = 100.0) -> float:
    """Score from precomputed (N, D) embedding pairs (testable offline)."""
    a = image_feats / np.linalg.norm(image_feats, axis=-1, keepdims=True)
    b = text_feats / np.linalg.norm(text_feats, axis=-1, keepdims=True)
    return float((weight * np.maximum(np.sum(a * b, -1), 0.0)).mean())
