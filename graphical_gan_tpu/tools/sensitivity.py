"""Quality-instrument sensitivity harness (VERDICT r2 item 4).

The hermetic IS/FID instruments are only meaningful if they are
DISCRIMINATING — able to separate a good generator from a broken one and an
early checkpoint from a late one.  On the structureless i.i.d. fallback
data that is impossible (IS saturates at its floor), so this tool runs the
whole pipeline on the LEARNABLE structured synthetic family
(``data.synthetic.structured_images_labeled``):

1. train the shared ``MetricClassifier`` on the labeled family and record
   its held-out accuracy (the instrument's own validity check),
2. anchor the scale: IS/FID of held-out REAL data (the "perfect generator"
   anchor) and of uniform-noise images (the "broken generator" anchor),
3. train the flagship wali-gp model on the same data, scoring samples at a
   ladder of checkpoints (default 0, 500, 2000, 10000 iters) with the SAME
   classifier — the resulting IS/FID-vs-iteration curve is the recorded
   sensitivity scale (an early checkpoint must score far from a late one).

Prints one JSON document; run on TPU or CPU (CPU: shrink --dim/--iters).

Reference instruments being calibrated: ``tflib/inception_score.py:25-53``
cadence at ``gan_inference_cifar10.py:484-487``.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _score(images_hwc, feature_fn, prob_fn, real_mu, real_sigma, splits=10):
    """IS + FID of a sample set under the shared classifier."""
    from graphical_gan_tpu.metrics.fid import frechet_distance, gaussian_stats
    from graphical_gan_tpu.metrics.inception import get_inception_score

    is_mean, is_std = get_inception_score(list(images_hwc), prob_fn,
                                          splits=splits)
    mu, sigma = gaussian_stats(feature_fn(np.asarray(images_hwc)))
    fid = frechet_distance(real_mu, real_sigma, mu, sigma)
    return {"is_mean": round(float(is_mean), 4),
            "is_std": round(float(is_std), 4),
            "fid": round(float(fid), 4)}


def _to_hwc(flat_int, channels, h, w):
    x = np.asarray(flat_int).reshape(-1, channels, h, w)
    return x.transpose(0, 2, 3, 1).astype(np.float64)


def draw_gan_samples(model, params, n, batch=100, seed=0,
                     quantize_scales=None):
    """uint8-range HWC samples from a gan_inference generator.

    ``quantize_scales`` (serve.quantize.calibrate) draws through the int8
    serving path — entering the quant context inside the traced function
    bakes the int8 contractions into this call's jit."""
    from graphical_gan_tpu.core import registry
    cfg = model.cfg
    h, w = cfg.data.image_hw
    c = cfg.data.channels
    if quantize_scales:
        from graphical_gan_tpu.ops import quant

        def _sample_q(noise):
            with quant.quantized(quantize_scales):
                return model.sample(noise)
        sample_j = registry.jit_apply(_sample_q)
    else:
        sample_j = registry.jit_apply(model.sample)
    out = []
    for i in range(-(-n // batch)):
        noise = jax.random.normal(jax.random.PRNGKey(seed * 7919 + i),
                                  (batch, cfg.dim_latent))
        flat = np.asarray(sample_j(params, jax.random.PRNGKey(i), noise))
        x = (flat + 1.0) * (255.0 / 2)   # tanh output -> [0,255]
        x = np.clip(x, 0, 255).reshape(batch, c, h, w).transpose(0, 2, 3, 1)
        out.extend(list(x))
    return out[:n]


def main(argv=None):
    from graphical_gan_tpu.core.config import gan_inference_defaults
    from graphical_gan_tpu.data.ondevice import sample_batches
    from graphical_gan_tpu.data.synthetic import structured_images_labeled
    from graphical_gan_tpu.metrics.fid import gaussian_stats
    from graphical_gan_tpu.metrics.jax_classifier import MetricClassifier
    from graphical_gan_tpu.models.gan_inference import GanInferenceModel
    from graphical_gan_tpu.train.step import make_train_step

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-data", type=int, default=20000)
    p.add_argument("--n-score", type=int, default=10000,
                   help="samples scored per checkpoint")
    p.add_argument("--checkpoints", default="0,500,2000,10000",
                   help="comma-separated generator iteration ladder")
    p.add_argument("--clf-steps", type=int, default=2000)
    p.add_argument("--clf-dim", type=int, default=32)
    p.add_argument("--dim", type=int, default=None,
                   help="GAN dim override (None = published 64)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--param-dtype", default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--moment-dtype", default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--accum-steps", type=int, default=None,
                   help="gradient accumulation — validates that microbatch "
                        "semantics (incl. BN batch stats over B/N) preserve "
                        "the learned-quality curve")
    p.add_argument("--n-classes", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="also write the JSON here")
    p.add_argument("--quantize-final", action="store_true",
                   help="also score the FINAL checkpoint through the int8 "
                        "PTQ serving path (ops/quant.py) — the quality-"
                        "delta instrument for quantized serving")
    args = p.parse_args(argv)

    t_start = time.time()
    over = {"compute_dtype": args.compute_dtype}
    if args.param_dtype:
        over["param_dtype"] = args.param_dtype
    if args.moment_dtype:
        over["moment_dtype"] = args.moment_dtype
    if args.dim:
        over["dim"] = args.dim
    if args.batch_size:
        over["batch_size"] = args.batch_size
    if args.accum_steps:
        over["accum_steps"] = args.accum_steps
    cfg = gan_inference_defaults("cifar10", "wali-gp", **over)
    h, w = cfg.data.image_hw
    c = cfg.data.channels

    # -- structured data + held-out split --------------------------------
    flat, labels = structured_images_labeled(
        args.n_data + 4096, (h, w), c, args.n_classes, seed=args.seed)
    train_flat, train_y = flat[:args.n_data], labels[:args.n_data]
    held_flat = flat[args.n_data:]

    # -- shared classifier ------------------------------------------------
    clf = MetricClassifier(image_hw=(h, w), channels=c,
                           n_classes=args.n_classes, dim=args.clf_dim)
    clf_params = clf.fit(train_flat, train_y, steps=args.clf_steps,
                         seed=args.seed)
    heldout_acc = clf.accuracy(clf_params, held_flat,
                               labels[args.n_data:])
    feature_fn = clf.as_feature_fn(clf_params)
    prob_fn = clf.as_prob_fn(clf_params)

    # -- anchors -----------------------------------------------------------
    train_hwc = _to_hwc(train_flat[:args.n_score], c, h, w)
    real_mu, real_sigma = gaussian_stats(feature_fn(train_hwc))
    held_hwc = _to_hwc(held_flat[:args.n_score], c, h, w)
    anchors = {
        "heldout_real": _score(held_hwc, feature_fn, prob_fn,
                               real_mu, real_sigma),
        "uniform_noise": _score(
            np.random.RandomState(9).rand(
                min(args.n_score, 4096), h, w, c) * 255.0,
            feature_fn, prob_fn, real_mu, real_sigma),
    }

    # -- GAN training with a checkpoint ladder ----------------------------
    model = GanInferenceModel(cfg)
    k = cfg.critic_iters
    step, init_state = make_train_step(model, jit=False)
    data_dev = jnp.asarray(train_flat)

    def one_iter(state, data, key):
        raw = sample_batches(data, jax.random.fold_in(key, 7), 1 + k,
                             cfg.batch_size)
        new_state, m = step(state, raw, key, jnp.asarray(True))
        return new_state, m["disc_cost"]

    run_iter = jax.jit(one_iter, donate_argnums=(0,))
    state = init_state(model.init(jax.random.PRNGKey(args.seed)))

    ladder = sorted({int(s) for s in args.checkpoints.split(",")})
    curve = []
    done = 0
    for target in ladder:
        while done < target:
            state, cost = run_iter(state, data_dev,
                                   jax.random.PRNGKey(1000 + done))
            done += 1
        np.asarray(cost) if done else None
        samples = draw_gan_samples(model, state.params, args.n_score,
                                   seed=args.seed)
        entry = {"iter": done,
                 **_score(samples, feature_fn, prob_fn, real_mu,
                          real_sigma)}
        curve.append(entry)
        print(json.dumps({"progress": entry}), flush=True)

    final_int8 = None
    if args.quantize_final:
        from graphical_gan_tpu.serve.quantize import calibrate
        scales = calibrate("gan_inference", model, state.params,
                           jax.random.PRNGKey(1234), n_batches=4)
        samples_q = draw_gan_samples(model, state.params, args.n_score,
                                     seed=args.seed,
                                     quantize_scales=scales)
        final_int8 = {"iter": done,
                      **_score(samples_q, feature_fn, prob_fn, real_mu,
                               real_sigma)}
        print(json.dumps({"final_int8": final_int8}), flush=True)

    rec = {
        "metric": "quality_instrument_sensitivity",
        "classifier_heldout_accuracy": round(float(heldout_acc), 4),
        "anchors": anchors,
        "curve": curve,
        **({"final_int8": final_int8} if final_int8 else {}),
        "n_score": args.n_score,
        "config": {"dim": cfg.dim, "batch_size": cfg.batch_size,
                   "mode": cfg.mode, "compute_dtype": cfg.compute_dtype,
                   "param_dtype": cfg.param_dtype,
                   "moment_dtype": cfg.moment_dtype,
                   "accum_steps": cfg.accum_steps,
                   "n_classes": args.n_classes},
        "wall_s": round(time.time() - t_start, 1),
    }
    text = json.dumps(rec)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
