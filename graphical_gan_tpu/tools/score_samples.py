"""Sample-quality scoring harness.

Scores generator checkpoints (or sample arrays) with the inception-score
protocol under a CHOSEN classifier, so two runs can be compared hermetically
with the same instrument:

    # score samples drawn from a checkpointed gan_inference model
    python -m graphical_gan_tpu.tools.score_samples \
        --ckpt result/run/ckpt_199999.npz --dataset cifar10 --mode ali \
        --classifier torch            # torchvision InceptionV3 (needs weights)
    # or a jax MetricClassifier checkpoint:
    #   --classifier jax --classifier-ckpt clf.npz

The "within 0.1 IS" comparison is only meaningful when both sample sets are
scored by the SAME classifier — this tool records the classifier identity
alongside the score.
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

import numpy as np
import jax


def draw_samples(model, params, n_samples: int, batch: int = 100,
                 quantize_scales=None):
    """Generator samples as uint8-range HWC arrays (reference protocol).

    ``quantize_scales`` (from ``serve.quantize.calibrate``) draws through
    the int8 serving path instead — the instrument for measuring the
    PTQ quality delta with the same classifier."""
    from contextlib import nullcontext
    from graphical_gan_tpu.core import registry
    from graphical_gan_tpu.ops import quant
    cfg = model.cfg
    h, w = cfg.data.image_hw
    c = cfg.data.channels
    if n_samples <= 0:
        raise ValueError("n_samples must be positive")
    n_batches = -(-n_samples // batch)  # ceil, then trim to exactly n_samples
    # one jitted closure per call (and therefore per arm): the quantized
    # context rewrites the TRACE, so the int8 arm must not share a jit
    # cache with the float arm — jit_apply builds a fresh wrapper
    sample_j = registry.jit_apply(model.sample)
    imgs = []
    for i in range(n_batches):
        noise = jax.random.normal(jax.random.PRNGKey(i),
                                  (batch, cfg.dim_latent))
        ctx = (quant.quantized(quantize_scales) if quantize_scales
               else nullcontext())
        with ctx:
            flat = sample_j(params, jax.random.PRNGKey(i), noise)
        x = np.asarray(flat)
        if cfg.data.normalization != "unit":
            x = (x + 1.0) * (255.0 / 2)
        else:
            x = x * 255.0
        x = np.clip(x, 0, 255)
        imgs.extend(list(x.reshape(batch, c, h, w).transpose(0, 2, 3, 1)))
    return imgs[:n_samples]


def make_classifier(kind: str, classifier_ckpt: Optional[str],
                    image_hw, channels: int, clf_dim: int = 64,
                    n_classes: int = 10):
    if kind == "frozen":
        from graphical_gan_tpu.metrics.inception_frozen import (
            FrozenInceptionClassifier)
        return (FrozenInceptionClassifier(classifier_ckpt),
                f"frozen-inception-2015:{classifier_ckpt}")
    if kind == "torch":
        from graphical_gan_tpu.metrics.inception import (
            TorchInceptionClassifier)
        return TorchInceptionClassifier(), "torchvision-inception-v3"
    if kind == "jax":
        from graphical_gan_tpu.metrics.jax_classifier import MetricClassifier
        from graphical_gan_tpu.train import checkpoint
        clf = MetricClassifier(image_hw=image_hw, channels=channels,
                               n_classes=n_classes, dim=clf_dim)
        params = clf.init(jax.random.PRNGKey(0))
        params, _ = checkpoint.restore(classifier_ckpt, params)
        return clf.as_prob_fn(params), f"jax-metric-classifier:{classifier_ckpt}"
    raise ValueError(kind)


def main(argv=None):
    from graphical_gan_tpu.core.config import gan_inference_defaults
    from graphical_gan_tpu.metrics.inception import get_inception_score
    from graphical_gan_tpu.models.gan_inference import GanInferenceModel
    from graphical_gan_tpu.train import checkpoint
    from graphical_gan_tpu.train.step import make_train_step

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--dataset", default="cifar10")
    p.add_argument("--mode", default="ali")
    p.add_argument("--n-samples", type=int, default=50000)
    p.add_argument("--splits", type=int, default=10)
    p.add_argument("--classifier", choices=["torch", "jax", "frozen"],
                   default="torch",
                   help="frozen = the reference's exact Inception-2015 "
                        "GraphDef head (pass the local .pb via "
                        "--classifier-ckpt) — the IS-within-0.1 instrument")
    p.add_argument("--classifier-ckpt", default=None)
    p.add_argument("--classifier-dim", type=int, default=64)
    p.add_argument("--dim", type=int, default=None)
    p.add_argument("--quantize", default=None, choices=["none", "int8"],
                   help="score samples drawn through the int8 PTQ "
                        "serving path (ops/quant.py) instead of the "
                        "float sampler")
    args = p.parse_args(argv)
    if args.classifier in ("jax", "frozen") and not args.classifier_ckpt:
        p.error(f"--classifier {args.classifier} requires --classifier-ckpt")

    overrides = {"dim": args.dim} if args.dim else {}
    cfg = gan_inference_defaults(args.dataset, args.mode, **overrides)
    model = GanInferenceModel(cfg)
    _, init_state = make_train_step(model, jit=False)
    like = init_state(model.init(jax.random.PRNGKey(0)))
    state, extra = checkpoint.restore(args.ckpt, like)

    classifier, ident = make_classifier(args.classifier,
                                        args.classifier_ckpt,
                                        cfg.data.image_hw,
                                        cfg.data.channels,
                                        clf_dim=args.classifier_dim)
    scales = None
    if args.quantize == "int8":
        from graphical_gan_tpu.serve.quantize import calibrate
        scales = calibrate("gan_inference", model, state.params,
                           jax.random.PRNGKey(1234), n_batches=4)
    imgs = draw_samples(model, state.params, args.n_samples,
                        quantize_scales=scales)
    mean, std = get_inception_score(imgs, classifier, splits=args.splits)
    print(json.dumps({
        "inception_score": round(mean, 4),
        "inception_score_std": round(std, 4),
        "classifier": ident,
        "n_samples": len(imgs),
        "ckpt": args.ckpt,
        "ckpt_iteration": extra.get("iteration"),
        "quantize": args.quantize or "none",
    }))


if __name__ == "__main__":
    main()
