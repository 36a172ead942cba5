"""bf16-vs-f32 training-quality-at-speed comparison (the honest stand-in
for "IS within 0.1" on machines where the frozen Inception weights and real
datasets are unavailable).

Runs the published cifar10 wali-gp config twice — compute_dtype=bfloat16 and
float32, same seed, resident on-device data — through the PRODUCTION
training path (``runs.gan_inference.run``), then reports per-dtype:

- windowed train-disc-cost trajectory (does bf16 track f32?),
- NaN/param-health check over the whole run,
- steady-state training throughput (images/sec/chip, counting (1+k)*B
  images per iteration like the reference accounting),
- FID between generated samples and the training distribution, under a
  FIXED shared feature extractor (``metrics.jax_classifier`` trunk with a
  fixed seed): with no downloadable weights, a fixed random-projection
  feature space still gives a valid *relative* comparison between the two
  dtypes — identical inputs score identically,
- hermetic IS under the same classifier (relative instrument, same caveat).

With ``--data-dir`` pointing at real CIFAR-10 and/or ``GGAN_INCEPTION_PB``
set, the same tool measures against real data / the reference's exact
frozen-Inception head.

Usage:  python -m graphical_gan_tpu.tools.quality_run --iters 10000
Prints one JSON line per dtype plus a summary table; results land in
BASELINE.md by hand.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _window_means(hist: dict, n_windows: int = 10):
    if not hist:
        return []
    keys = sorted(hist)
    chunks = np.array_split(np.asarray([hist[k] for k in keys]), n_windows)
    return [round(float(np.mean(c)), 4) for c in chunks if len(c)]


def _draw_samples(trainer, model, n: int, batch: int = 100) -> np.ndarray:
    from graphical_gan_tpu.core import registry
    cfg = model.cfg
    sample_j = registry.jit_apply(model.sample)
    h, w = cfg.data.image_hw
    c = cfg.data.channels
    out = []
    for i in range(n // batch):
        noise = jax.random.normal(jax.random.PRNGKey(10_000 + i),
                                  (batch, cfg.dim_latent))
        flat = np.asarray(sample_j(trainer.state.params,
                                   jax.random.PRNGKey(i), noise),
                          np.float32)
        x = ((flat + 1.0) * (255.0 / 2)).clip(0, 255)
        out.append(x.reshape(batch, c, h, w).transpose(0, 2, 3, 1))
    return np.concatenate(out, axis=0)


def _train_images_hwc(cfg, resident: np.ndarray, n: int) -> np.ndarray:
    h, w = cfg.data.image_hw
    c = cfg.data.channels
    x = resident[:n].astype(np.float32)
    if cfg.data.normalization in ("int_pm1", "dequant", "int256_pm1"):
        pass  # already 0..255 ints
    else:
        x = x * 255.0
    return x.reshape(n, c, h, w).transpose(0, 2, 3, 1)


def run_dtype(dtype: str, iters: int, outdir: str, seed: int,
              data_dir=None, n_metric_samples: int = 10000, **overrides):
    from graphical_gan_tpu.runs import gan_inference

    t0 = time.time()
    trainer, last = gan_inference.run(
        "cifar10", "wali-gp", iters=iters, data_dir=data_dir,
        outdir=outdir, seed=seed, tsne_every=0, inception_every=0,
        sample_every=max(iters // 2, 1),
        checkpoint_every=max(iters // 2, 1),
        compute_dtype=dtype, **overrides)
    wall = time.time() - t0

    # health: every parameter finite at the end of the run
    finite = all(bool(jnp.isfinite(p).all())
                 for p in trainer.state.params.values())
    losses_finite = all(np.isfinite(v) for v in last.values())

    # steady-state throughput from the 'time' metric (drop the first flush
    # window, which contains the compile)
    times = trainer.logger.history("time")
    ts = [times[k] for k in sorted(times) if k >= min(100, iters // 2)]
    cfg = trainer.cfg
    imgs_per_iter = (1 + trainer.k) * cfg.batch_size
    ips = imgs_per_iter / float(np.median(ts)) if ts else float("nan")

    disc_hist = trainer.logger.history("train disc cost")
    return trainer, {
        "dtype": dtype,
        "iters": iters,
        "params_finite": finite,
        "losses_finite": losses_finite,
        "final": {k: round(v, 4) for k, v in last.items()},
        "disc_cost_windows": _window_means(disc_hist),
        "train_throughput_img_per_sec": round(ips, 1),
        "wall_seconds": round(wall, 1),
    }


def main(argv=None):
    from graphical_gan_tpu.data.common import materialize_epoch
    from graphical_gan_tpu.metrics.fid import compute_fid
    from graphical_gan_tpu.metrics.inception import get_inception_score
    from graphical_gan_tpu.metrics.jax_classifier import MetricClassifier

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=10000)
    p.add_argument("--outdir", default="/tmp/ggan_quality")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--n-metric-samples", type=int, default=10000)
    p.add_argument("--dtypes", nargs="+",
                   default=["bfloat16", "float32"])
    p.add_argument("--dim", type=int, default=None,
                   help="model width override (smoke runs)")
    args = p.parse_args(argv)
    overrides = {"dim": args.dim} if args.dim else {}

    # fixed shared feature extractor / classifier for the relative metrics
    clf = MetricClassifier()
    clf_params = clf.init(jax.random.PRNGKey(1234))
    feature_fn = clf.as_feature_fn(clf_params)
    prob_fn = clf.as_prob_fn(clf_params)

    results = []
    for dtype in args.dtypes:
        trainer, rec = run_dtype(dtype, args.iters, args.outdir, args.seed,
                                 args.data_dir, args.n_metric_samples,
                                 **overrides)
        model = trainer.model
        n = args.n_metric_samples
        samples = _draw_samples(trainer, model, n)
        train_hwc = _train_images_hwc(
            trainer.cfg, np.asarray(trainer.resident_data), n)
        rec["fid_vs_train"] = round(
            compute_fid(list(samples), list(train_hwc), feature_fn), 3)
        mean, std = get_inception_score(list(samples), prob_fn)
        rec["hermetic_is"] = [round(mean, 4), round(std, 4)]
        print(json.dumps(rec))
        results.append(rec)

    if len(results) == 2:
        a, b = results
        print("\nsummary: {} vs {}".format(a["dtype"], b["dtype"]))
        print("  FID-vs-train : {:.3f} vs {:.3f}".format(
            a["fid_vs_train"], b["fid_vs_train"]))
        print("  hermetic IS  : {:.3f} vs {:.3f}".format(
            a["hermetic_is"][0], b["hermetic_is"][0]))
        print("  img/s/chip   : {:.0f} vs {:.0f}  (speedup {:.2f}x)".format(
            a["train_throughput_img_per_sec"],
            b["train_throughput_img_per_sec"],
            a["train_throughput_img_per_sec"]
            / max(b["train_throughput_img_per_sec"], 1e-9)))
    return results


if __name__ == "__main__":
    main()
