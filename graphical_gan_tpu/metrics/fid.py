"""Frechet distance between feature distributions (FID).

Beyond the reference's surface (it only had the inception score), but the
standard modern instrument for the same question.  Works with any feature
extractor — torchvision InceptionV3 pool features where available, or the
hermetic in-framework ``MetricClassifier``'s penultimate features — so it
composes with the same zero-egress story as ``metrics.inception``.

FID = ||mu_a - mu_b||^2 + Tr(S_a + S_b - 2 (S_a S_b)^(1/2))
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def gaussian_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    f = np.asarray(features, dtype=np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Numerically robust FID between two Gaussians (scipy sqrtm with the
    standard epsilon regularization for near-singular covariances)."""
    from scipy import linalg

    mu1 = np.atleast_1d(np.asarray(mu1, dtype=np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, dtype=np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, dtype=np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, dtype=np.float64))

    def _sqrtm(m):
        out = linalg.sqrtm(m)  # scipy >=1.17 returns just the matrix
        return out[0] if isinstance(out, tuple) else out

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1 @ sigma2)
    bad = (not np.isfinite(covmean).all()) or (
        np.iscomplexobj(covmean)
        and np.abs(covmean.imag).max() > 1e-3 * max(1.0,
                                                    np.abs(covmean.real).max()))
    if bad:
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        rel_imag = np.abs(covmean.imag).max() / max(
            1.0, np.abs(covmean.real).max())
        if rel_imag > 1e-2:
            raise ValueError(
                f"sqrtm produced a substantially complex result "
                f"(rel imag {rel_imag:.3g}); covariances are too "
                f"ill-conditioned for a trustworthy FID — use more samples "
                f"or lower-dimensional features")
        covmean = covmean.real
    if not np.isfinite(covmean).all():
        raise ValueError(
            "covariance sqrtm is non-finite (NaN/Inf features?); refusing "
            "to return a garbage FID")
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid_from_features(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    mu1, s1 = gaussian_stats(feats_a)
    mu2, s2 = gaussian_stats(feats_b)
    return frechet_distance(mu1, s1, mu2, s2)


def compute_fid(images_a, images_b,
                feature_fn: Callable[[np.ndarray], np.ndarray],
                batch_size: int = 100) -> float:
    """images: [N,H,W,C] uint8-range arrays; feature_fn maps a batch to
    [B, D] features.

    CAVEAT for batch-statistics feature extractors (e.g. MetricClassifier,
    whose BN uses current-batch stats by design): features depend on batch
    composition, so FIDs are only comparable when computed with the SAME
    batch_size and full batches. Use N divisible by batch_size."""

    def feats(images):
        out = []
        images = np.asarray(images)
        for i in range(0, len(images), batch_size):
            out.append(np.asarray(feature_fn(images[i:i + batch_size])))
        return np.concatenate(out, axis=0)

    return fid_from_features(feats(images_a), feats(images_b))
