"""Entrypoints for model family 1 — the ``gan_inference_*`` scripts.

The reference had eleven copy-pasted entry scripts with edit-in-source
UPPERCASE constants and no CLI.  Here each script becomes a thin function
over the config system + trainer, exposing the same MODE/knob surface with
the same defaults, plus argparse:

    python -m graphical_gan_tpu.runs.gan_inference --dataset mnist --mode ali

Reference anatomy being reproduced (``gan_inference_mnist.py``):
hyperparams (:31-70) -> log dir + settings dump (:76-86) -> models (:122-252)
-> losses/mode dispatch (:257-363) -> fixed-noise sampling (:366-373) ->
reconstruction grids (:383-396) -> train loop (:402-484).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.core.compile_cache import enable_compile_cache
from graphical_gan_tpu.core.config import gan_inference_defaults
from graphical_gan_tpu.models.gan_inference import GanInferenceModel
from graphical_gan_tpu.report.save_images import save_images
from graphical_gan_tpu.train.trainer import Trainer, make_run_dir


def _structured_pool(cfg, n_classes: int = 10, seed: int = 0,
                     n_train: int = 20000, n_eval: int = 2000):
    """LEARNABLE labeled synthetic family (``data.synthetic.
    structured_images_labeled``) in the dataset's own batch convention.
    On a zero-egress host the default fallback data is structureless noise,
    so quality instruments (IS/FID at the ``gan_inference_cifar10.py:484-487``
    cadence) pin to their floor; this family is learnable and makes the
    curve a real signal.  Returns ``(train, dev, pools)`` where pools are
    the raw ``(train_flat, train_y, eval_flat, eval_y)`` arrays for
    training the hermetic metric classifier."""
    from graphical_gan_tpu.data.common import generator_factory
    from graphical_gan_tpu.data import synthetic
    h, w = cfg.data.image_hw
    c = cfg.data.channels
    n = n_train + 2 * n_eval
    flat, y = synthetic.structured_images_labeled(n, (h, w), c,
                                                  n_classes, seed)
    if cfg.data.normalization == "unit":     # mnist convention: float [0,1]
        feed = (flat / 255.0).astype(np.float32)
    else:                                    # cifar/svhn: raw int pixels
        feed = flat
    sl = [slice(0, n_train), slice(n_train, n_train + n_eval),
          slice(n_train + n_eval, n)]
    tr, dv = (generator_factory(cfg.batch_size, feed[s], y[s], seed=i + 1)
              for i, s in enumerate(sl[:2]))
    pools = (flat[sl[0]], y[sl[0]], flat[sl[2]], y[sl[2]])
    return tr, dv, pools


def _loaders(cfg, data_dir: Optional[str]):
    from graphical_gan_tpu import data
    if data_dir == "structured":
        tr, dv, _pools = _structured_pool(cfg)
        return tr, dv
    if cfg.dataset == "mnist":
        train, dev, _test = data.mnist.load(cfg.batch_size, cfg.batch_size)
        return train, dev
    if cfg.dataset == "cifar10":
        return data.cifar10.load(cfg.batch_size, data_dir)
    if cfg.dataset == "svhn":
        return data.svhn.load(cfg.batch_size, data_dir or "/tmp/svhn")
    if cfg.dataset == "celeba":
        return data.celeba.load(cfg.batch_size, data_dir)
    raise ValueError(cfg.dataset)


def _maybe_mesh(n_devices: Optional[int], parallel: str = "dp",
                mesh_shape: Optional[str] = None):
    """Mesh for the requested strategy (None/1 device = single-chip).

    ``mesh_shape``: for tp/sp/ep a "d,m" pair (data x model / data x seq /
    data x expert); for composed a named spec like "data=2,seq=2,model=2";
    for pp a 1-D stage count — 2 (player cut, all pp families)
    or 4 (family-1 ali conv-trunk cut).  Defaults: dp = 1-D over
    n_devices; tp/sp/ep = 2 x (n_devices/2); pp = 2 stages.
    """
    if mesh_shape is None and (not n_devices or n_devices <= 1) \
            and parallel != "pp":
        # pp has a canonical default (2 stages), so `--parallel pp` alone
        # builds it rather than silently running single-chip
        return None
    from graphical_gan_tpu.parallel.mesh import make_mesh
    if parallel == "dp":
        return make_mesh(n_devices)
    import numpy as _np
    import jax as _jax
    from jax.sharding import Mesh
    if mesh_shape and "=" in mesh_shape:
        pairs = [kv.split("=") for kv in mesh_shape.split(",")]
        axes = tuple(kk for kk, _ in pairs)
        dims = tuple(int(v) for _, v in pairs)
    else:
        axes = {"tp": ("data", "model"), "sp": ("data", "seq"),
                "ep": ("data", "expert"), "pp": ("stage",)}.get(parallel)
        if axes is None:
            raise ValueError(
                f"--parallel {parallel} needs a named --mesh-shape "
                f"(e.g. data=2,seq=2,model=2)")
        if mesh_shape:
            dims = tuple(int(v) for v in mesh_shape.split(","))
        elif parallel == "pp":
            dims = (2,)  # 2-stage player-boundary cut (parallel/pipeline.py)
        else:
            dims = (2, (n_devices or len(_jax.devices())) // 2)
    need = int(_np.prod(dims))
    devs = _jax.devices()
    if need > len(devs):
        raise ValueError(f"mesh {dims} needs {need} devices, "
                         f"{len(devs)} visible")
    return Mesh(_np.asarray(devs[:need]).reshape(dims), axes)


def _grid_hw(cfg):
    h, w = cfg.data.image_hw
    return (h, w) if cfg.data.channels == 1 else (cfg.data.channels, h, w)


def _to_grid_scale(cfg, flat: np.ndarray) -> np.ndarray:
    """Map generator output range to [0,1]-ish for the grid writer."""
    if cfg.data.normalization == "unit":
        return flat
    return (flat + 1.0) / 2.0


def _grid_shape(cfg, n):
    h, w = cfg.data.image_hw
    c = cfg.data.channels
    return (n, c, h, w) if c > 1 else (n, h, w)


def make_eval_hooks(model, fixed_dev_batch):
    """Sample + reconstruction grids at the reference cadence
    (``gan_inference_mnist.py:366-396``: fixed noise grid; dev batch
    interleaved input/output reconstruction grid)."""
    cfg = model.cfg
    n_vis = cfg.n_vis
    fixed_noise = np.random.RandomState(0).normal(
        size=(n_vis, cfg.dim_latent)).astype("float32")
    # compiled eval closures, built once per run (no per-hook retraces)
    sample_j = registry.jit_apply(model.sample)
    rec_j = registry.jit_apply(model.reconstruct)
    norm_j = registry.jit_apply(model.normalize)

    def hook(trainer, iteration):
        params = trainer.params
        samples = sample_j(params, jax.random.PRNGKey(0),
                           jnp.asarray(fixed_noise))
        img = _to_grid_scale(cfg, np.asarray(samples))
        save_images(
            img.reshape(_grid_shape(cfg, n_vis)),
            os.path.join(trainer.outf,
                         f"{cfg.mode}_{cfg.dataset}_samples_{iteration}.png"))

        if fixed_dev_batch is not None:
            rec = rec_j(params, jax.random.PRNGKey(1),
                        jnp.asarray(fixed_dev_batch))
            rec = _to_grid_scale(cfg, np.asarray(rec))
            # normalize may draw RNG (celeba dequantization) — needs a
            # registry context
            data_img = _to_grid_scale(
                cfg, np.asarray(norm_j(params, jax.random.PRNGKey(2),
                                       jnp.asarray(fixed_dev_batch))))
            # interleave original/reconstruction rows (mnist:388-392)
            inter = np.stack([data_img, rec], axis=1).reshape(
                -1, data_img.shape[-1])
            b = fixed_dev_batch.shape[0]
            save_images(
                inter.reshape(_grid_shape(cfg, 2 * b)),
                os.path.join(
                    trainer.outf,
                    f"{cfg.mode}_{cfg.dataset}_reconstruction_{iteration}.png"))

    return hook


def make_tsne_hook(model, dev_gen):
    """Latent manifold scatter at the 50k cadence
    (``gan_inference_mnist.py:473-480``): TSNE of dev-set codes, colored by
    class label."""
    encode_j = registry.jit_apply(model.encode)

    def hook(trainer, iteration):
        from graphical_gan_tpu.report.visualization import scatter, tsne_2d
        cfg = model.cfg
        zs, ys = [], []
        for batch in dev_gen():
            if not isinstance(batch, tuple):
                return  # unlabeled dataset (celeba) — no class coloring
            xb, yb = batch
            z = encode_j(trainer.params, jax.random.PRNGKey(0),
                         jnp.asarray(xb))
            zs.append(np.asarray(z))
            ys.append(yb)
        z2 = tsne_2d(np.vstack(zs))
        scatter(z2, np.hstack(ys), trainer.outf,
                f"{cfg.mode}_{cfg.dataset}_manifold_{iteration}.png")

    return hook


def make_inception_hook(model, n_samples: int = 50000,
                        sample_batch: int = 100, classifier=None):
    """Inception-score eval at the 10k cadence
    (``gan_inference_cifar10.py:381-391,484-487``): n_samples generated in
    batches of 100, [-1,1] -> [0,255] HWC, 10-split exp-mean-KL.  The
    classifier is pluggable (see metrics/inception.py); when none is given
    and torchvision InceptionV3 weights are unavailable locally the hook
    logs a skip instead of failing the run."""
    cfg = model.cfg

    def hook(trainer, iteration):
        nonlocal classifier
        if classifier is None:
            try:
                from graphical_gan_tpu.metrics.inception import (
                    default_is_classifier)
                classifier = default_is_classifier()
            except Exception as e:  # zero-egress env without local weights
                trainer.logger.plot("inception score skipped", 0.0)
                print(f"inception score skipped (no classifier): {e}")
                return
        from graphical_gan_tpu.metrics.inception import get_inception_score
        h, w = cfg.data.image_hw
        c = cfg.data.channels
        sample_j = registry.jit_apply(model.sample)
        imgs = []
        for i in range(n_samples // sample_batch):
            noise = jax.random.normal(jax.random.PRNGKey(i),
                                      (sample_batch, cfg.dim_latent))
            flat = sample_j(trainer.params, jax.random.PRNGKey(i),
                            noise)
            x = ((np.asarray(flat) + 1.0) * (255.0 / 2)).astype("int32")
            x = x.reshape(sample_batch, c, h, w).transpose(0, 2, 3, 1)
            imgs.extend(list(x))
        mean, std = get_inception_score(imgs, classifier)
        trainer.logger.plot("inception score", mean)
        trainer.logger.plot("inception score std", std)

    return hook


def make_structured_quality_hook(model, pools, n_score: int = 10000,
                                 sample_batch: int = 100,
                                 clf_steps: int = 2000, clf_dim: int = 32,
                                 n_classes: int = 10, seed: int = 0):
    """Hermetic IS/FID at the reference's inception cadence
    (``gan_inference_cifar10.py:484-487``) for ``--data-dir structured``
    runs: a ``MetricClassifier`` is trained ONCE on the structured train
    pool (lazily, at the hook's first firing) and every firing scores
    ``n_score`` fresh generator samples against it — IS via the exact
    10-split exp-mean-KL protocol (``tflib/inception_score.py:47-53``) and
    FID against the train pool's feature Gaussian.  The classifier's
    held-out accuracy is logged once as the instrument's validity check."""
    cfg = model.cfg
    h, w = cfg.data.image_hw
    c = cfg.data.channels
    state = {}

    def _ensure_instrument(trainer):
        if "prob_fn" in state:
            return
        from graphical_gan_tpu.metrics.fid import gaussian_stats
        from graphical_gan_tpu.metrics.jax_classifier import MetricClassifier
        train_flat, train_y, eval_flat, eval_y = pools
        clf = MetricClassifier(image_hw=(h, w), channels=c,
                               n_classes=n_classes, dim=clf_dim)
        clf_params = clf.fit(train_flat, train_y, steps=clf_steps,
                             seed=seed)
        acc = clf.accuracy(clf_params, eval_flat, eval_y)
        trainer.logger.plot("metric classifier heldout acc", float(acc))
        state["feature_fn"] = clf.as_feature_fn(clf_params)
        state["prob_fn"] = clf.as_prob_fn(clf_params)
        real = np.asarray(train_flat[:n_score]).reshape(-1, c, h, w)
        real = real.transpose(0, 2, 3, 1).astype(np.float64)
        state["real_mu"], state["real_sigma"] = gaussian_stats(
            state["feature_fn"](real))

    def hook(trainer, iteration):
        from graphical_gan_tpu.metrics.fid import (frechet_distance,
                                                   gaussian_stats)
        from graphical_gan_tpu.metrics.inception import get_inception_score
        _ensure_instrument(trainer)
        sample_j = registry.jit_apply(model.sample)
        imgs = []
        for i in range(-(-n_score // sample_batch)):
            noise = jax.random.normal(jax.random.PRNGKey(i),
                                      (sample_batch, cfg.dim_latent))
            flat = np.asarray(sample_j(trainer.params,
                                       jax.random.PRNGKey(i), noise))
            if cfg.data.normalization == "unit":   # sigmoid output [0,1]
                x = flat * 255.0
            else:                                  # tanh output [-1,1]
                x = (flat + 1.0) * (255.0 / 2)
            x = np.clip(x, 0, 255).reshape(-1, c, h, w).transpose(0, 2, 3, 1)
            imgs.extend(list(x))
        imgs = imgs[:n_score]
        mean, std = get_inception_score(imgs, state["prob_fn"])
        mu, sigma = gaussian_stats(state["feature_fn"](np.asarray(imgs)))
        fid = frechet_distance(state["real_mu"], state["real_sigma"],
                               mu, sigma)
        trainer.logger.plot("inception score", float(mean))
        trainer.logger.plot("inception score std", float(std))
        trainer.logger.plot("fid", float(fid))

    return hook


def run(dataset: str = "mnist", mode: str = "ali",
        iters: Optional[int] = None, data_dir: Optional[str] = None,
        outdir: str = "result", seed: int = 0,
        checkpoint_every: int = 5000, checkpoints_to_keep: int = 3, sample_every: Optional[int] = None,
        tsne_every: int = 50000, inception_every: int = 10000,
        data_pipeline: Optional[str] = None, chunk_size: Optional[int] = None,
        n_devices: Optional[int] = None, parallel: str = "dp",
        mesh_shape: Optional[str] = None, run_dir: Optional[str] = None,
        max_rollbacks: int = 0, compile_cache: Optional[str] = None,
        checkpoint_backend: str = "npz",
        **overrides):
    # persistent XLA executable cache (also via GGAN_COMPILE_CACHE) —
    # restarts deserialize their step programs instead of recompiling
    enable_compile_cache(compile_cache)
    cfg = gan_inference_defaults(dataset, mode, **overrides)
    model = GanInferenceModel(cfg)
    structured_pools = None
    if data_dir == "structured":
        train_gen, dev_gen, structured_pools = _structured_pool(cfg)
    else:
        train_gen, dev_gen = _loaders(cfg, data_dir)

    # Input pipeline: every gan_inference dataset fits in HBM, so the
    # default is the on-device resident dataset (one upload, batches drawn
    # by device gather inside the fused multi-iteration step — see
    # train.trainer).  CelebA is resident as uint8 — 202,599 x 12,288 bytes
    # = 2.5 GB of a v5e's 16 GB HBM — and the model dequantizes raw ints on
    # device anyway (models/common.py: normalize_input), so nothing is lost
    # by the narrow dtype.  --data-pipeline host restores the feed path.
    if data_pipeline is None:
        data_pipeline = "resident"
    resident = None
    if data_pipeline == "resident":
        from graphical_gan_tpu.data.common import materialize_epoch
        int_pixels = cfg.data.normalization in ("int_pm1", "dequant",
                                                "int256_pm1")
        resident = materialize_epoch(
            train_gen, dtype=np.uint8 if int_pixels else None)

    # --run-dir: reuse an existing run directory — the Trainer resumes
    # from its latest checkpoint (the reference never restored a checkpoint;
    # tflib's Saver was write-only)
    outf = run_dir or make_run_dir(outdir, f"gan_inference_{dataset}",
                                   {"MODE": mode})
    if dataset == "cifar10" and data_dir != "structured":
        # fixed seed-1234 test-set reconstruction batch
        # (tflib/cifar10.py:14-19; gan_inference_cifar10.py:400-404)
        from graphical_gan_tpu.data.cifar10 import get_reconstruction_data
        fixed_dev = get_reconstruction_data(cfg.batch_size, data_dir)
    else:
        fixed_dev = next(iter(dev_gen()))
        if isinstance(fixed_dev, tuple):
            fixed_dev = fixed_dev[0]

    sample_every = sample_every or (1000 if dataset == "celeba" else 5000)

    def add_hook(hooks, every, fn):
        if every in hooks:  # compose hooks sharing a cadence
            prev = hooks[every]
            hooks[every] = lambda tr, it: (prev(tr, it), fn(tr, it))
        else:
            hooks[every] = fn

    hooks = {}
    add_hook(hooks, sample_every, make_eval_hooks(model, fixed_dev))
    if tsne_every:
        add_hook(hooks, tsne_every, make_tsne_hook(model, dev_gen))
    if structured_pools is not None and inception_every:
        # hermetic instrument: the structured family ships its own
        # classifier, so IS/FID are real numbers on a zero-egress host
        add_hook(hooks, inception_every,
                 make_structured_quality_hook(model, structured_pools))
    elif dataset == "cifar10" and inception_every:
        add_hook(hooks, inception_every, make_inception_hook(model))
    trainer = Trainer(
        model, train_gen, dev_gen, outf=outf, seed=seed,
        checkpoint_every=checkpoint_every,
        checkpoints_to_keep=checkpoints_to_keep,
        eval_hooks=hooks,
        lr_scale=(lambda t: jnp.maximum(0.0, 1.0 - t / cfg.iters))
        if cfg.decay else None,
        resident_data=resident, chunk_size=chunk_size,
        mesh=_maybe_mesh(n_devices, parallel, mesh_shape), parallel=parallel,
        max_rollbacks=max_rollbacks,
        checkpoint_backend=checkpoint_backend,
    )
    # TPU-VM preemptions deliver SIGTERM with a grace window: checkpoint at
    # the next dispatch boundary and exit cleanly (resume via --run-dir).
    # No-op off the main thread.
    trainer.install_preempt_handlers()
    metrics = trainer.train(iters)
    return trainer, metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="mnist",
                   choices=["mnist", "cifar10", "svhn", "celeba"])
    p.add_argument("--mode", default="ali")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--outdir", default="result")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute-dtype", default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--param-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="bfloat16: store live params at 2 bytes with f32 "
                        "master weights in the optimizer (halves fwd/bwd "
                        "weight reads — the HBM-bound step gets faster)")
    p.add_argument("--moment-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="bfloat16: store Adam m/v at 2 bytes (update "
                        "arithmetic stays f32)")
    p.add_argument("--accum-steps", type=int, default=None,
                   help="gradient accumulation: split each sub-update's "
                        "batch into N scanned microbatches with one "
                        "averaged optimizer update — large effective batch "
                        "in bounded HBM (batch_size must divide by N)")
    p.add_argument("--checkpoint-every", type=int, default=5000)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--dim", type=int, default=None)
    p.add_argument("--data-pipeline", default=None,
                   choices=["resident", "host"],
                   help="resident: whole dataset in HBM, multi-iteration "
                        "fused steps (default for mnist/cifar10/svhn); "
                        "host: per-iteration host batches (celeba default)")
    p.add_argument("--chunk-size", type=int, default=None,
                   help="iterations fused per device dispatch in resident "
                        "mode (default: auto — fuse up to the next "
                        "logging/eval event boundary)")
    p.add_argument("--n-devices", type=int, default=None,
                   help="data-parallel over the first N devices (params "
                        "replicated, batch sharded over ICI)")
    p.add_argument("--parallel", default="dp",
                   choices=["dp", "tp", "sp", "pp", "composed"],
                   help="parallel strategy over the mesh: dp (batch), tp "
                        "(channel sharding, data x model mesh), sp (video "
                        "frame axis, data x seq mesh), pp (2-stage "
                        "player-cut pipeline, ali/wali-gp), composed (any "
                        "axis subset)")
    p.add_argument("--mesh-shape", default=None,
                   help="mesh dims: 'd,m' for tp/sp, or named "
                        "'data=2,seq=2,model=2' for composed")
    p.add_argument("--run-dir", default=None,
                   help="reuse an existing run directory and resume from "
                        "its latest checkpoint (default: create a new "
                        "timestamped dir under --outdir)")
    p.add_argument("--max-rollbacks", type=int, default=0,
                   help="divergence guard: on a non-finite training cost, "
                        "roll back to the latest checkpoint and retry on a "
                        "re-salted RNG stream, up to N times (0 disables)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory: "
                        "restarts load their compiled step programs from "
                        "disk instead of recompiling (also via "
                        "GGAN_COMPILE_CACHE; flag wins)")
    p.add_argument("--checkpoint-backend", default="npz",
                   choices=["npz", "orbax"],
                   help="npz = single-host atomic file (supports the "
                        "pp<->standard migration); orbax = sharded/"
                        "multi-host writes (each shard saved by its "
                        "owning process)")
    args = p.parse_args(argv)
    overrides = {}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.dim:
        overrides["dim"] = args.dim
    if args.compute_dtype:
        overrides["compute_dtype"] = args.compute_dtype
    if args.param_dtype:
        overrides["param_dtype"] = args.param_dtype
    if args.moment_dtype:
        overrides["moment_dtype"] = args.moment_dtype
    if args.accum_steps:
        overrides["accum_steps"] = args.accum_steps
    run(args.dataset, args.mode, iters=args.iters, data_dir=args.data_dir,
        outdir=args.outdir, seed=args.seed,
        checkpoint_every=args.checkpoint_every,
        data_pipeline=args.data_pipeline, chunk_size=args.chunk_size,
        n_devices=args.n_devices, parallel=args.parallel,
        mesh_shape=args.mesh_shape, run_dir=args.run_dir,
        max_rollbacks=args.max_rollbacks, compile_cache=args.compile_cache,
        checkpoint_backend=args.checkpoint_backend,
        **overrides)


if __name__ == "__main__":
    main()
