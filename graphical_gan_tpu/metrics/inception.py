"""Inception score.

The reference pipes 50,000 samples in batches of 100 through the frozen
Inception-2015 GraphDef and computes the 10-split exp-mean-KL
(``tflib/inception_score.py:25-53``).  The scoring arithmetic is reproduced
here exactly (``inception_score_from_probs``); the classifier is pluggable:

- ``TorchInceptionClassifier`` uses torchvision's pretrained InceptionV3 when
  its weights are locally available (host-side eval worker, like the
  reference's separate TF session), or
- any callable ``images_uint8[N,H,W,3] -> probs[N,K]`` (e.g. a JAX classifier
  trained in-framework) for hermetic environments — the TPU cluster may have
  zero egress, so weight downloads can't be assumed.

IS numbers are only comparable when the SAME classifier is used on both
sides of a comparison; the harness records which classifier produced a score.
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence, Tuple

import numpy as np


def inception_score_from_probs(preds: np.ndarray, splits: int = 10
                               ) -> Tuple[float, float]:
    """Exact port of the split-KL arithmetic (``inception_score.py:47-53``):
    per split, exp( mean_i KL(p(y|x_i) || p(y)) ).
    """
    preds = np.asarray(preds, dtype=np.float64)
    n = preds.shape[0]
    scores: List[float] = []
    for i in range(splits):
        part = preds[i * n // splits:(i + 1) * n // splits]
        kl = part * (np.log(part) - np.log(np.mean(part, axis=0,
                                                   keepdims=True)))
        scores.append(float(np.exp(np.mean(np.sum(kl, axis=1)))))
    return float(np.mean(scores)), float(np.std(scores))


def get_inception_score(images: Sequence[np.ndarray],
                        classifier: Callable[[np.ndarray], np.ndarray],
                        splits: int = 10, batch_size: int = 100
                        ) -> Tuple[float, float]:
    """Reference protocol (``inception_score.py:25-46``): images are HWC
    uint8-range arrays; batches of 100 through the classifier; then split-KL.
    """
    assert len(images) > 0 and images[0].ndim == 3
    preds = []
    n_batches = int(math.ceil(len(images) / batch_size))
    for i in range(n_batches):
        chunk = np.stack(images[i * batch_size:(i + 1) * batch_size], axis=0)
        preds.append(np.asarray(classifier(chunk)))
    return inception_score_from_probs(np.concatenate(preds, axis=0), splits)


def default_is_classifier():
    """Classifier-resolution order for IS hooks: the reference's exact
    frozen Inception-2015 GraphDef head when the ``.pb`` exists locally
    (``GGAN_INCEPTION_PB`` or the reference's default MODEL_DIR path,
    ``tflib/inception_score.py:19-20``) — the IS-within-0.1 instrument —
    else torchvision's InceptionV3.  Raises when neither is available
    (zero-egress machine with no local weights)."""
    import os
    pb = os.environ.get(
        "GGAN_INCEPTION_PB",
        "inception_score_model/classify_image_graph_def.pb")
    if os.path.isfile(pb):
        from graphical_gan_tpu.metrics.inception_frozen import (
            FrozenInceptionClassifier)
        return FrozenInceptionClassifier(pb)
    return TorchInceptionClassifier()


class TorchInceptionClassifier:
    """Host-side InceptionV3 softmax classifier (needs local torchvision
    weights; raises at construction when unavailable)."""

    def __init__(self, device: str = "cpu"):
        import torch
        import torchvision
        self.torch = torch
        self.model = torchvision.models.inception_v3(
            weights=torchvision.models.Inception_V3_Weights.IMAGENET1K_V1)
        self.model.eval()
        self.device = device
        self.model.to(device)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: [B,H,W,3] in [0,255] -> softmax probs [B,1000]."""
        torch = self.torch
        x = torch.tensor(
            np.ascontiguousarray(images, dtype=np.float32) / 255.0
        ).permute(0, 3, 1, 2).to(self.device)
        x = torch.nn.functional.interpolate(
            x, size=(299, 299), mode="bilinear", align_corners=False)
        mean = torch.tensor([0.485, 0.456, 0.406], device=self.device)
        std = torch.tensor([0.229, 0.224, 0.225], device=self.device)
        x = (x - mean[None, :, None, None]) / std[None, :, None, None]
        with torch.no_grad():
            logits = self.model(x)
        return torch.softmax(logits, dim=1).cpu().numpy()
