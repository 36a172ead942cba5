"""Entrypoints for model family 2 — the ``gmgan_inference_*`` scripts.

Reproduces the reference evals (``gmgan_inference_mnist.py``):
- per-component fixed-noise sample grids, rows=noise, cols=components
  (``:405-419``) every 5000 iters,
- fixed-dev-batch reconstruction grids (``:428-442``),
- unsupervised clustering accuracy over the test set every 5000 iters
  (``:513-531``),
- final-iteration 4-way TSNE scatters: inferred latents by class, prior
  samples by component, data by inferred cluster, data by class
  (``:534-551``).

    python -m graphical_gan_tpu.runs.gmgan --dataset mnist --mode local_ep
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
from graphical_gan_tpu.core.config import gmgan_defaults
from graphical_gan_tpu.metrics.clustering import clustering_accuracy
from graphical_gan_tpu.models.gmgan import GMGanModel
from graphical_gan_tpu.report.save_images import save_images
from graphical_gan_tpu.train.trainer import Trainer, make_run_dir
from graphical_gan_tpu.runs.gan_inference import _maybe_mesh


def _structured_loaders(cfg, n_classes: int = 10, seed: int = 0,
                        n_train: int = 20000, n_eval: int = 2000):
    """LEARNABLE labeled synthetic family (``data.synthetic.
    structured_images_labeled``) in the dataset's own batch convention —
    makes the 5k clustering-accuracy cadence (``gmgan_inference_mnist.py:
    513-531``) produce a real number on a zero-egress host, where the
    default fallback data is structureless and accuracy pins to chance."""
    from graphical_gan_tpu.data.common import generator_factory
    from graphical_gan_tpu.data import synthetic
    h, w = cfg.data.image_hw
    c = cfg.data.channels
    n = n_train + 2 * n_eval
    flat, y = synthetic.structured_images_labeled(n, (h, w), c,
                                                  n_classes, seed)
    if cfg.data.normalization == "unit":     # mnist convention: float [0,1]
        flat = (flat / 255.0).astype(np.float32)
    sl = [slice(0, n_train), slice(n_train, n_train + n_eval),
          slice(n_train + n_eval, n)]
    tr, dv, te = (generator_factory(cfg.batch_size, flat[s], y[s],
                                    seed=i + 1)
                  for i, s in enumerate(sl))
    return tr, dv, te


def _loaders(cfg, data_dir: Optional[str]):
    from graphical_gan_tpu import data
    if data_dir == "structured":
        return _structured_loaders(cfg)
    if cfg.dataset == "mnist":
        train, dev, test = data.mnist.load(cfg.batch_size, cfg.batch_size)
        return train, dev, test
    if cfg.dataset == "cifar10":
        train, test = data.cifar10.load(cfg.batch_size, data_dir)
        return train, test, test
    if cfg.dataset == "svhn":
        train, test = data.svhn.load(cfg.batch_size, data_dir or "/tmp/svhn")
        return train, test, test
    if cfg.dataset == "celeba":
        train, dev = data.celeba.load(cfg.batch_size, data_dir)
        return train, dev, None
    raise ValueError(cfg.dataset)


def _grid_shape(cfg, n):
    h, w = cfg.data.image_hw
    c = cfg.data.channels
    return (n, c, h, w) if c > 1 else (n, h, w)


def _to_grid_scale(cfg, flat):
    return flat if cfg.data.normalization == "unit" else (flat + 1.0) / 2.0


def make_sample_hook(model):
    """Per-component grid: N_VIS samples, columns are mixture components
    (``gmgan_inference_mnist.py:405-419``)."""
    cfg = model.cfg
    n_vis = cfg.n_vis - (cfg.n_vis % cfg.n_coms) or cfg.n_coms
    fixed_noise = np.random.RandomState(0).normal(
        size=(n_vis, cfg.dim_latent)).astype("float32")
    fixed_k = np.tile(np.eye(cfg.n_coms, dtype=np.float32),
                      (n_vis // cfg.n_coms, 1))

    sample_j = registry.jit_apply(model.sample)

    def hook(trainer, iteration):
        params = trainer.params
        samples = sample_j(params, jax.random.PRNGKey(0),
                           jnp.asarray(fixed_k), jnp.asarray(fixed_noise))
        img = _to_grid_scale(cfg, np.asarray(samples))
        save_images(img.reshape(_grid_shape(cfg, n_vis)),
                    os.path.join(trainer.outf,
                                 f"{iteration}_samples_{cfg.mode}.png"),
                    size=[n_vis // cfg.n_coms, cfg.n_coms])

    return hook


def make_recon_hook(model, fixed_dev_batch):
    cfg = model.cfg
    rec_j = registry.jit_apply(model.reconstruct)
    norm_j = registry.jit_apply(model.normalize)

    def hook(trainer, iteration):
        params = trainer.params
        rec = rec_j(params, jax.random.PRNGKey(1),
                    jnp.asarray(fixed_dev_batch))
        rec = _to_grid_scale(cfg, np.asarray(rec))
        dat = _to_grid_scale(
            cfg, np.asarray(norm_j(params, jax.random.PRNGKey(2),
                                   jnp.asarray(fixed_dev_batch))))
        inter = np.stack([dat, rec], axis=1).reshape(-1, dat.shape[-1])
        save_images(inter.reshape(_grid_shape(cfg, 2 * len(fixed_dev_batch))),
                    os.path.join(trainer.outf,
                                 f"{iteration}_reconstruction_{cfg.mode}.png"))

    return hook


def make_accuracy_hook(model, test_gen_factory):
    """Clustering accuracy over the full test sweep (``:513-531``)."""
    cfg = model.cfg

    probs_j = registry.jit_apply(model.cluster_probs)

    def hook(trainer, iteration):
        probs, ys = [], []
        for xb, yb in test_gen_factory():
            p = probs_j(trainer.params, jax.random.PRNGKey(0),
                        jnp.asarray(xb))
            probs.append(np.asarray(p))
            ys.append(yb)
        acc = clustering_accuracy(np.vstack(probs), np.hstack(ys))
        trainer.logger.plot("testing accuracy", acc)

    return hook


def tsne_visualizations(trainer, model, dev_gen_factory, iteration):
    """Final-iteration 4-way TSNE scatter (``:534-551``)."""
    from graphical_gan_tpu.report.visualization import scatter, tsne_2d
    cfg = model.cfg
    z_dev, y_dev, x_dev, qk_dev, pz_dev, pk_dev = [], [], [], [], [], []
    rng = np.random.RandomState(0)
    for xb, yb in dev_gen_factory():
        def fwd():
            real = model.normalize(jnp.asarray(xb))
            from graphical_gan_tpu.models import networks
            q_z, _, _ = networks.extractor(cfg, real)
            _, q_k = model.hyper_extractor(q_z)
            b = xb.shape[0]
            noise = jax.random.normal(registry.next_rng_key(),
                                      (b, cfg.dim_latent))
            idx = jax.random.randint(registry.next_rng_key(), (b,), 0,
                                     cfg.n_coms)
            k = jax.nn.one_hot(idx, cfg.n_coms)
            p_z = model.hyper_generator(k, noise)
            return q_z, q_k, p_z, idx

        q_z, q_k, p_z, pk = registry.apply(
            fwd, trainer.params,
            jax.random.PRNGKey(rng.randint(1 << 30)))
        z_dev.append(np.asarray(q_z))
        qk_dev.append(np.argmax(np.asarray(q_k), axis=1))
        pz_dev.append(np.asarray(p_z))
        pk_dev.append(np.asarray(pk))
        y_dev.append(yb)
        x_dev.append(xb)

    z2 = tsne_2d(np.vstack(z_dev))
    scatter(z2, np.hstack(y_dev), trainer.outf,
            f"{iteration}_manifold_{cfg.mode}.png")
    pz2 = tsne_2d(np.vstack(pz_dev))
    scatter(pz2, np.hstack(pk_dev), trainer.outf,
            f"{iteration}_prior_{cfg.mode}.png")
    x2 = tsne_2d(np.vstack(x_dev))
    scatter(x2, np.hstack(qk_dev), trainer.outf,
            f"{iteration}_cluster_{cfg.mode}.png")
    scatter(x2, np.hstack(y_dev), trainer.outf,
            f"{iteration}_dev_data_vis_{cfg.mode}.png")


def make_gmgan_inception_hook(model, n_samples: int = 50000,
                              sample_batch: int = 100, classifier=None):
    """IS over samples drawn from the mixture prior
    (``gmgan_inference_cifar10.py:429-442``)."""
    cfg = model.cfg

    def hook(trainer, iteration):
        nonlocal classifier
        if classifier is None:
            try:
                from graphical_gan_tpu.metrics.inception import (
                    default_is_classifier)
                classifier = default_is_classifier()
            except Exception as e:
                print(f"inception score skipped (no classifier): {e}")
                return
        from graphical_gan_tpu.metrics.inception import get_inception_score
        h, w = cfg.data.image_hw
        c = cfg.data.channels
        imgs = []
        sample_j = registry.jit_apply(model.sample)
        for i in range(n_samples // sample_batch):
            key = jax.random.PRNGKey(i)
            noise = jax.random.normal(key, (sample_batch, cfg.dim_latent))
            idx = jax.random.randint(jax.random.fold_in(key, 1),
                                     (sample_batch,), 0, cfg.n_coms)
            k1 = jax.nn.one_hot(idx, cfg.n_coms)
            flat = sample_j(trainer.params, key, k1, noise)
            x = ((np.asarray(flat) + 1.0) * (255.0 / 2)).astype("int32")
            imgs.extend(list(
                x.reshape(sample_batch, c, h, w).transpose(0, 2, 3, 1)))
        mean, std = get_inception_score(imgs, classifier)
        trainer.logger.plot("inception score", mean)
        trainer.logger.plot("inception score std", std)

    return hook


def run(dataset: str = "mnist", mode: str = "local_ep",
        iters: Optional[int] = None, data_dir: Optional[str] = None,
        outdir: str = "result", seed: int = 0, checkpoint_every: int = 5000, checkpoints_to_keep: int = 3,
        eval_every: int = 5000, data_pipeline: Optional[str] = None,
        chunk_size: Optional[int] = None,
        n_devices: Optional[int] = None, parallel: str = "dp",
        mesh_shape: Optional[str] = None, run_dir: Optional[str] = None,
        max_rollbacks: int = 0, compile_cache: Optional[str] = None,
        checkpoint_backend: str = "npz",
        **overrides):
    # persistent XLA executable cache (also via GGAN_COMPILE_CACHE) --
    # restarts deserialize their step programs instead of recompiling
    enable_compile_cache(compile_cache)
    cfg = gmgan_defaults(dataset, mode, **overrides)
    model = GMGanModel(cfg)
    train_gen, dev_gen, test_gen = _loaders(cfg, data_dir)

    # on-device resident dataset by default — celeba rides as uint8 raw
    # pixels, 2.5 GB in HBM (see runs.gan_inference / train.trainer)
    if data_pipeline is None:
        data_pipeline = "resident"
    resident = None
    if data_pipeline == "resident":
        from graphical_gan_tpu.data.common import materialize_epoch
        int_pixels = cfg.data.normalization in ("int_pm1", "dequant",
                                                "int256_pm1")
        resident = materialize_epoch(
            train_gen, dtype=np.uint8 if int_pixels else None)

    outf = run_dir or make_run_dir(outdir, f"gmgan_inference_{dataset}",
                                   {"MODE": mode, "N_COMS": cfg.n_coms})
    fixed_dev = next(iter(dev_gen()))
    if isinstance(fixed_dev, tuple):
        fixed_dev = fixed_dev[0]

    hooks = [make_sample_hook(model), make_recon_hook(model, fixed_dev)]
    if test_gen is not None:
        hooks.append(make_accuracy_hook(model, test_gen))
    if dataset == "cifar10":
        # inception score over 50000 mixture-prior samples
        # (gmgan_inference_cifar10.py:429-442,532-538)
        hooks.append(make_gmgan_inception_hook(model))

    def combined(trainer, iteration):
        for h in hooks:
            h(trainer, iteration)

    trainer = Trainer(model, train_gen, dev_gen, outf=outf, seed=seed,
                      checkpoint_every=checkpoint_every,
                      checkpoints_to_keep=checkpoints_to_keep,
                      eval_hooks={eval_every: combined},
                      resident_data=resident, chunk_size=chunk_size,
                      mesh=_maybe_mesh(n_devices, parallel, mesh_shape),
                      parallel=parallel, max_rollbacks=max_rollbacks,
                      checkpoint_backend=checkpoint_backend)
    # SIGTERM (preemption) -> checkpoint + clean exit; resume via --run-dir
    trainer.install_preempt_handlers()
    metrics = trainer.train(iters)
    # final-iteration 4-way TSNE scatters (gmgan_inference_mnist.py:534-551)
    if dataset != "celeba":
        final = (iters if iters is not None else cfg.iters) - 1
        try:
            tsne_visualizations(trainer, model, dev_gen, final)
        except Exception as e:  # visualization must not fail the run
            print(f"tsne visualization skipped: {e}")
    return trainer, metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="mnist",
                   choices=["mnist", "svhn", "cifar10", "celeba"])
    p.add_argument("--mode", default="local_ep",
                   choices=["ali", "local_ep", "alice", "local_epce",
                            "vegan"])
    p.add_argument("--mode-k", default="CONCRETE")
    p.add_argument("--n-coms", type=int, default=None)
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--outdir", default="result")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute-dtype", default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--accum-steps", type=int, default=None,
                   help="gradient accumulation (scanned microbatches, one "
                        "averaged update; batch_size must divide by N)")
    p.add_argument("--checkpoint-every", type=int, default=5000)
    p.add_argument("--data-pipeline", default=None,
                   choices=["resident", "host"])
    p.add_argument("--chunk-size", type=int, default=None)
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--parallel", default="dp",
                   choices=["dp", "tp", "ep", "sp", "composed"])
    p.add_argument("--mesh-shape", default=None)
    p.add_argument("--run-dir", default=None,
                   help="reuse an existing run dir; resume from its latest "
                        "checkpoint")
    p.add_argument("--max-rollbacks", type=int, default=0,
                   help="divergence guard: on a non-finite training "
                        "cost, roll back to the latest checkpoint and "
                        "retry on a re-salted RNG stream, up to N "
                        "times (0 disables)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory: "
                        "restarts load their compiled step programs "
                        "from disk instead of recompiling (also via "
                        "GGAN_COMPILE_CACHE; flag wins)")
    p.add_argument("--checkpoint-backend", default="npz",
                   choices=["npz", "orbax"],
                   help="npz = single-host atomic file; orbax = "
                        "sharded/multi-host writes (each shard saved "
                        "by its owning process)")
    args = p.parse_args(argv)
    overrides = {"mode_k": args.mode_k}
    if args.n_coms:
        overrides["n_coms"] = args.n_coms
    if args.compute_dtype:
        overrides["compute_dtype"] = args.compute_dtype
    if args.accum_steps:
        overrides["accum_steps"] = args.accum_steps
    run(args.dataset, args.mode, iters=args.iters, data_dir=args.data_dir,
        outdir=args.outdir, seed=args.seed,
        checkpoint_every=args.checkpoint_every,
        data_pipeline=args.data_pipeline, chunk_size=args.chunk_size,
        n_devices=args.n_devices, parallel=args.parallel,
        mesh_shape=args.mesh_shape, run_dir=args.run_dir,
        max_rollbacks=args.max_rollbacks,
        compile_cache=args.compile_cache,
        checkpoint_backend=args.checkpoint_backend, **overrides)


if __name__ == "__main__":
    main()
