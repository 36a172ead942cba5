"""Entrypoints for model family 3 — the ``ssgan_inference_*`` scripts.

Reproduces the reference instruments (``ssgan_inference_moving_mnist.py``):
per-player parameter counts at startup (``:635-641``); every 5000 iters,
fixed-noise video sample grids + animated GIFs (``:569-587``), interleaved
reconstruction grids (``:590-602``), and the content/motion disentanglement
grids — inferred per-frame motion codes regenerated under one fixed global
code/label (``:604-618``).

    python -m graphical_gan_tpu.runs.ssgan --dataset moving_mnist --mode local_ep
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
from graphical_gan_tpu.core.config import ssgan_defaults
from graphical_gan_tpu.models.ssgan import SSGanModel
from graphical_gan_tpu.report.save_images import save_gifs, save_images
from graphical_gan_tpu.train.trainer import Trainer, make_run_dir
from graphical_gan_tpu.runs.gan_inference import _maybe_mesh


def binarize_labels(y: np.ndarray, n_c: int) -> np.ndarray:
    out = np.zeros((y.shape[0], n_c), np.float32)
    out[np.arange(y.shape[0]), y.astype(int)] = 1.0
    return out


def _structured_pool(cfg, n: int, seed: int):
    """LEARNABLE digit pool for zero-egress hosts (mirrors gmgan's
    ``--data-dir structured``): 28x28 oriented-pattern classes from
    ``data.synthetic.structured_images_labeled``.  The offline-MNIST
    fallback pool is i.i.d. NOISE squares, whose texture is incompressible
    through the 8-dim latent chain — reconstruction L2 then measures only
    the unlearnable part.  With a structured pool the videos are learnable
    end to end (position dynamics AND appearance)."""
    from graphical_gan_tpu.data import synthetic
    from graphical_gan_tpu.data.moving_mnist import DIGIT_SIZE
    n_cls = cfg.n_classes or 10
    flat, y = synthetic.structured_images_labeled(
        n, (DIGIT_SIZE, DIGIT_SIZE), 1, n_cls, seed)
    return (flat / 255.0).astype(np.float32).reshape(
        n, DIGIT_SIZE, DIGIT_SIZE), y


def _loaders(cfg, data_dir: Optional[str]):
    from graphical_gan_tpu import data
    if cfg.dataset == "moving_mnist":
        if data_dir == "structured":
            from graphical_gan_tpu.data.moving_mnist import _video_generator
            tr_x, tr_y = _structured_pool(cfg, 20000, seed=0)
            te_x, te_y = _structured_pool(cfg, 2000, seed=1)
            train = _video_generator(tr_x, tr_y, cfg.seq_len,
                                     cfg.batch_size, 0)
            test = _video_generator(te_x, te_y, cfg.seq_len,
                                    cfg.batch_size, 1)
        else:
            train, test = data.moving_mnist.load_video(cfg.seq_len,
                                                       cfg.batch_size)

        def wrap(factory):
            def get_epoch():
                for x, y in factory():
                    yield {"x": x, "y": binarize_labels(y, cfg.n_classes)}
            return get_epoch

        return wrap(train), wrap(test)
    if cfg.dataset == "chairs":
        train, dev = data.chairs.load(cfg.seq_len, cfg.batch_size,
                                      size=cfg.image_hw[0],
                                      data_dir=data_dir)
        return train, dev
    raise ValueError(cfg.dataset)


def _vis(cfg, outf, x: np.ndarray, iteration: int, num: int, name: str):
    """Montage grid (rows=videos, cols=timesteps) + animated GIF (``:569-576``)."""
    c = cfg.channels
    hgt, wdt = cfg.image_hw
    frames = x.reshape(-1, c, hgt, wdt)
    save_images(frames, os.path.join(outf, f"{name}_{iteration}.png"),
                size=(num, cfg.seq_len))
    save_gifs(x.reshape(num, cfg.seq_len, c, hgt, wdt),
              os.path.join(outf, f"{name}_{iteration}.gif"))


def make_eval_hook(model, fixed_dev):
    cfg = model.cfg
    n_vis = cfg.batch_size
    rng = np.random.RandomState(0)
    pre_fixed = rng.normal(size=(n_vis, cfg.dim_latent_l)).astype("float32")
    fixed_g = rng.normal(size=(n_vis, cfg.dim_latent_g)).astype("float32")
    if cfg.conditional:
        fixed_y = np.tile(np.eye(cfg.n_classes, dtype="float32"),
                          (max(1, n_vis // cfg.n_classes), 1))[:n_vis]
    else:
        fixed_y = None
    dev_x = fixed_dev["x"] if isinstance(fixed_dev, dict) else fixed_dev
    dev_y = fixed_dev.get("y") if isinstance(fixed_dev, dict) else None
    # display copy in [0,1]: chairs batches carry int pixel values
    dev_x_disp = (np.asarray(dev_x) / 256.0
                  if cfg.dataset == "chairs" else np.asarray(dev_x))
    dis_g = np.tile(rng.normal(size=(1, cfg.dim_latent_g)),
                    (dev_x.shape[0], 1)).astype("float32")
    dis_y = (binarize_labels(np.ones(dev_x.shape[0]), cfg.n_classes)
             if cfg.conditional else None)

    # compiled eval closures (None args are empty pytrees — jit-safe)
    sample_j = registry.jit_apply(model.sample)
    rec_j = registry.jit_apply(model.reconstruct)
    dis_j = registry.jit_apply(model.disentangle)

    def hook(trainer, iteration):
        params = trainer.params
        samples = sample_j(
            params, jax.random.PRNGKey(0), jnp.asarray(pre_fixed),
            jnp.asarray(fixed_g),
            jnp.asarray(fixed_y) if fixed_y is not None else None)
        s = (np.asarray(samples) + 1.0) / 2.0
        _vis(cfg, trainer.outf, s, iteration, n_vis, "samples")

        rec = rec_j(params, jax.random.PRNGKey(1), jnp.asarray(dev_x),
                    jnp.asarray(dev_y) if dev_y is not None else None)
        rec = (np.asarray(rec) + 1.0) / 2.0
        # quantitative recon quality on the fixed dev batch, display space
        # [0,1] — the scalar counterpart of the reference's qualitative
        # recon grids (``ssgan_inference_moving_mnist.py:590-602``)
        trainer.logger.plot("dev rec l2",
                            float(np.mean((dev_x_disp - rec) ** 2)))
        inter = np.stack([dev_x_disp, rec], axis=1).reshape(
            -1, cfg.seq_len, cfg.output_dim)
        _vis(cfg, trainer.outf, inter, iteration, 2 * dev_x.shape[0],
             "reconstruction")

        dis = dis_j(params, jax.random.PRNGKey(2), jnp.asarray(dev_x),
                    jnp.asarray(dev_y) if dev_y is not None else None,
                    jnp.asarray(dis_g),
                    jnp.asarray(dis_y) if dis_y is not None else None)
        dis = (np.asarray(dis) + 1.0) / 2.0
        inter = np.stack([dev_x_disp, dis], axis=1).reshape(
            -1, cfg.seq_len, cfg.output_dim)
        _vis(cfg, trainer.outf, inter, iteration, 2 * dev_x.shape[0],
             "disentangle")

    return hook


def log_player_param_counts(trainer, model):
    """``ssgan_inference_moving_mnist.py:635-641``."""
    params = trainer.params
    gen = sum(int(np.prod(p.shape)) for n, p in params.items()
              if n.startswith("Generator"))
    ext = sum(int(np.prod(p.shape)) for n, p in params.items()
              if n.startswith("Extractor"))
    disc = sum(int(np.prod(p.shape)) for n, p in params.items()
               if n.startswith("Discriminator"))
    line = (f"Number of parameters in each player "
            f"[{gen}, {ext}, {disc}, {gen + ext + disc}]")
    print(line)
    with open(trainer.logfile, "a") as f:
        f.write(line + "\n")


def run(dataset: str = "moving_mnist", mode: str = "local_ep",
        iters: Optional[int] = None, data_dir: Optional[str] = None,
        outdir: str = "result", seed: int = 0,
        checkpoint_every: int = 5000, checkpoints_to_keep: int = 3, eval_every: int = 5000,
        data_pipeline: str = "host", chunk_size: Optional[int] = None,
        n_devices: Optional[int] = None, parallel: str = "dp",
        mesh_shape: Optional[str] = None, run_dir: Optional[str] = None,
        max_rollbacks: int = 0, compile_cache: Optional[str] = None,
        checkpoint_backend: str = "npz",
        **overrides):
    # persistent XLA executable cache (also via GGAN_COMPILE_CACHE) --
    # restarts deserialize their step programs instead of recompiling
    enable_compile_cache(compile_cache)
    cfg = ssgan_defaults(dataset, mode, **overrides)
    model = SSGanModel(cfg)
    train_gen, dev_gen = _loaders(cfg, data_dir)

    outf = run_dir or make_run_dir(outdir, f"ssgan_inference_{dataset}",
                                   {"MODE": mode, "ALI_MODE": cfg.ali_mode,
                                    "LEN": cfg.seq_len})
    fixed_dev = next(iter(dev_gen()))

    # Three input pipelines for ssgan:
    # - "host" (reference-faithful): moving-mnist synthesizes a FRESH epoch
    #   on the host each pass (tflib/simple_moving_mnist.py:54-96) and feeds
    #   it over; the only choice for chairs-from-disk beyond resident.
    # - "resident": one materialized epoch frozen in HBM, trading data
    #   freshness for the zero-host-feed hot loop (fine for chairs whose
    #   dataset is static anyway).
    # - "device" (moving_mnist only, TPU-native): the 28x28 digit POOL lives
    #   in HBM and the bouncing-video synthesis itself runs inside the
    #   compiled training step — fresh videos every iteration at device
    #   speed, zero host bytes in the loop (data/ondevice_moving_mnist.py).
    resident, sampler = None, None
    if data_pipeline == "resident":
        from graphical_gan_tpu.data.common import materialize_epoch
        resident = materialize_epoch(train_gen)
    elif data_pipeline == "device":
        if dataset != "moving_mnist":
            raise ValueError("data_pipeline='device' synthesizes "
                             "moving-mnist only")
        from graphical_gan_tpu.data.moving_mnist import (DIGIT_SIZE,
                                                         _mnist_pool)
        from graphical_gan_tpu.data.ondevice_moving_mnist import (
            make_video_sampler)
        if data_dir == "structured":
            pool_x, pool_y = _structured_pool(cfg, 20000, seed=0)
        else:
            (pool_x, pool_y), _ = _mnist_pool(None)
        resident = {
            "digits": np.asarray(pool_x, np.float32).reshape(
                -1, DIGIT_SIZE, DIGIT_SIZE),
            "labels": binarize_labels(np.asarray(pool_y), cfg.n_classes),
        }
        sampler = make_video_sampler(cfg.seq_len)

    trainer = Trainer(model, train_gen, dev_gen, outf=outf, seed=seed,
                      checkpoint_every=checkpoint_every,
                      checkpoints_to_keep=checkpoints_to_keep,
                      eval_hooks={eval_every: make_eval_hook(model,
                                                             fixed_dev)},
                      resident_data=resident, chunk_size=chunk_size,
                      batch_sampler=sampler,
                      mesh=_maybe_mesh(n_devices, parallel, mesh_shape),
                      parallel=parallel, max_rollbacks=max_rollbacks,
                      checkpoint_backend=checkpoint_backend)
    # SIGTERM (preemption) -> checkpoint + clean exit; resume via --run-dir
    trainer.install_preempt_handlers()
    # param counts need an initialized state
    if trainer.state is None and not trainer.try_resume():
        trainer.state = trainer.init_state(
            model.init(trainer.keys.next()))
    log_player_param_counts(trainer, model)
    metrics = trainer.train(iters)
    return trainer, metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="moving_mnist",
                   choices=["moving_mnist", "chairs"])
    p.add_argument("--mode", default="local_ep",
                   choices=["local_ep", "local_epce-z", "ali", "alice-z"])
    p.add_argument("--pos-mode", default="naive_mean_field")
    p.add_argument("--ali-mode", default="concat_x")
    p.add_argument("--seq-len", type=int, default=None)
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
    p.add_argument("--data-pipeline", default="host",
                   choices=["resident", "host", "device"])
    p.add_argument("--chunk-size", type=int, default=None)
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--parallel", default="dp",
                   choices=["dp", "tp", "sp", "composed"])
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
    overrides = {"pos_mode": args.pos_mode, "ali_mode": args.ali_mode}
    if args.seq_len:
        overrides["seq_len"] = args.seq_len
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
