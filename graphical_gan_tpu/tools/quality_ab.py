"""Float-vs-int8 PTQ quality A/B on a trained checkpoint.

The serving-throughput side of the int8 story lives in
``tools/bench_serving.py --quantize int8``; this tool measures the OTHER
half — what PTQ costs in sample quality — by scoring the same trained
generator twice under ONE shared hermetic instrument:

  1. rebuild the structured labeled pool the run trained on
     (``runs.gan_inference._structured_pool``, same seed),
  2. train the metric classifier EXACTLY as the in-run quality hook does
     (``runs.gan_inference.make_structured_quality_hook``: dim 32,
     2000 steps, seed 0), so scores are comparable to the run's own curve,
  3. draw ``--n-samples`` through the float sampler and through the int8
     PTQ sampler (``serve.quantize.calibrate`` + ``ops.quant.quantized``)
     and report IS (exact 10-split exp-mean-KL,
     ``tflib/inception_score.py:47-53`` protocol) and FID for both arms.

Usage:
    python -m graphical_gan_tpu.tools.quality_ab \
        --ckpt run/ckpt_199999.npz --dataset cifar10 --mode wali-gp

Prints one JSON line per arm plus a delta line — the numbers BASELINE.md's
PTQ quality table records.
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import jax


def main(argv=None) -> int:
    from graphical_gan_tpu.core.config import gan_inference_defaults
    from graphical_gan_tpu.metrics.fid import frechet_distance, gaussian_stats
    from graphical_gan_tpu.metrics.inception import get_inception_score
    from graphical_gan_tpu.metrics.jax_classifier import MetricClassifier
    from graphical_gan_tpu.models.gan_inference import GanInferenceModel
    from graphical_gan_tpu.runs.gan_inference import _structured_pool
    from graphical_gan_tpu.tools.generate import restore_params
    from graphical_gan_tpu.tools.score_samples import draw_samples

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--dataset", default="cifar10")
    p.add_argument("--mode", default="wali-gp")
    p.add_argument("--n-samples", type=int, default=10000)
    p.add_argument("--clf-steps", type=int, default=2000)
    p.add_argument("--clf-dim", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--arms", default="float,int8",
                   help="comma list from {float,int8}")
    args = p.parse_args(argv)

    cfg = gan_inference_defaults(args.dataset, args.mode)
    model = GanInferenceModel(cfg)
    # restore_params handles every checkpoint the framework writes
    # (standard / pp-packed, npz / orbax) — no duplicated restore here
    params, _ = restore_params(model, args.ckpt)

    # the shared instrument: identical to the in-run structured hook
    h, w = cfg.data.image_hw
    c = cfg.data.channels
    _, _, pools = _structured_pool(cfg, seed=args.seed)
    train_flat, train_y, eval_flat, eval_y = pools
    clf = MetricClassifier(image_hw=(h, w), channels=c, n_classes=10,
                           dim=args.clf_dim)
    clf_params = clf.fit(train_flat, train_y, steps=args.clf_steps,
                         seed=args.seed)
    acc = float(clf.accuracy(clf_params, eval_flat, eval_y))
    prob_fn = clf.as_prob_fn(clf_params)
    feature_fn = clf.as_feature_fn(clf_params)
    real = np.asarray(train_flat[:args.n_samples]).reshape(-1, c, h, w)
    real = real.transpose(0, 2, 3, 1).astype(np.float64)
    real_mu, real_sigma = gaussian_stats(feature_fn(real))
    print(json.dumps({"instrument": "structured-metric-classifier",
                      "heldout_acc": round(acc, 4)}))

    out = {}
    for arm in args.arms.split(","):
        scales = None
        if arm == "int8":
            from graphical_gan_tpu.serve.quantize import calibrate
            scales = calibrate("gan_inference", model, params,
                               jax.random.PRNGKey(1234), n_batches=4)
        imgs = draw_samples(model, params, args.n_samples,
                            quantize_scales=scales)
        mean, std = get_inception_score(imgs, prob_fn)
        mu, sigma = gaussian_stats(feature_fn(np.asarray(imgs)))
        fid = float(frechet_distance(real_mu, real_sigma, mu, sigma))
        out[arm] = {"is": mean, "fid": fid}
        print(json.dumps({"arm": arm, "ckpt": args.ckpt,
                          "inception_score": round(mean, 4),
                          "inception_score_std": round(std, 4),
                          "fid": round(fid, 4),
                          "n_samples": args.n_samples}))
    if "float" in out and "int8" in out:
        print(json.dumps({
            "delta_is": round(out["int8"]["is"] - out["float"]["is"], 4),
            "delta_fid": round(out["int8"]["fid"] - out["float"]["fid"], 4),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
