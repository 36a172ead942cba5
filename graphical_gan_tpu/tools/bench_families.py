"""Honest per-family throughput measurement (all three model families).

``bench.py`` covers the BASELINE headline (gan_inference cifar10 wali-gp);
this tool measures the other two families' fused steps the same way so the
BASELINE.md table rows are reproducible instead of ad-hoc:

- gmgan cifar10 local_ep (published config: N_COMS=30, BATCH=64),
- ssgan moving_mnist local_ep (published config: LEN=16, BATCH=50,
  reported as frames/sec = images/sec x LEN equivalent accounting).

Methodology matches bench.py exactly: resident synthetic data sampled
on-device, multi-iteration ``lax.scan`` chunks, donated state, best-of-N
rounds, and the timed region bounded by HARD VALUE FETCHES (``np.asarray``)
— `jax.block_until_ready` is not honored reliably by the relay backend
(BASELINE.md "measurement honesty").

Usage: python -m graphical_gan_tpu.tools.bench_families [--families ...]
Prints one JSON line per family.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

CHUNK = 20
N_CHUNKS = 5
ROUNDS = 5


def _measure(model, cfg, resident, items_per_image: int = 1, sampler=None):
    from graphical_gan_tpu.train.step import make_train_step
    from graphical_gan_tpu.data.ondevice import sample_batches_tree

    k = cfg.critic_iters
    step, init_state = make_train_step(model, jit=False)
    data = jax.tree.map(jnp.asarray, resident)
    sampler = sampler or sample_batches_tree

    def chunk(state, data, base_key):
        def body(st, kk):
            raw = sampler(data, jax.random.fold_in(kk, 7),
                          1 + k, cfg.batch_size)
            s, m = step(st, raw, kk, jnp.asarray(True))
            return s, m["disc_cost"]

        keys = jax.random.split(base_key, CHUNK)
        return jax.lax.scan(body, state, keys)

    fn = jax.jit(chunk, donate_argnums=(0,))
    state = init_state(model.init(jax.random.PRNGKey(0)))
    state, c = fn(state, data, jax.random.PRNGKey(1))
    np.asarray(c)  # hard warm fetch

    best = float("inf")
    for r in range(ROUNDS):
        np.asarray(c)  # drain queue before starting the clock
        t0 = time.perf_counter()
        for i in range(N_CHUNKS):
            state, c = fn(state, data, jax.random.PRNGKey(2 + r * 97 + i))
        np.asarray(c)  # forces every prior dispatch
        best = min(best, time.perf_counter() - t0)

    iters = N_CHUNKS * CHUNK
    images = iters * (1 + k) * cfg.batch_size * items_per_image
    # The jitted chunk is unsharded and executes on ONE device, so the
    # per-chip figure is the total — never divide by len(jax.devices()).
    return images / best, best / iters


def bench_gmgan():
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel

    cfg = gmgan_defaults("cifar10", "local_ep", compute_dtype="bfloat16")
    model = GMGanModel(cfg)
    resident = np.random.RandomState(0).randint(
        0, 256, size=(50_000, cfg.data.output_dim)).astype(np.int32)
    ips, spi = _measure(model, cfg, resident)
    return {"metric": "gmgan_cifar10_local_ep_train_throughput",
            "value": round(ips, 1), "unit": "images/sec/chip",
            "sec_per_iter": round(spi, 6)}


def bench_ssgan():
    from graphical_gan_tpu.core.config import ssgan_defaults
    from graphical_gan_tpu.models.ssgan import SSGanModel

    cfg = ssgan_defaults("moving_mnist", "local_ep",
                         compute_dtype="bfloat16")
    model = SSGanModel(cfg)
    rng = np.random.RandomState(0)
    n = 2_000  # videos resident (2000 x 16 x 4096 f32 = 0.5 GB)
    resident = {
        "x": rng.rand(n, cfg.seq_len, cfg.output_dim).astype(np.float32),
        "y": np.eye(cfg.n_classes, dtype=np.float32)[
            rng.randint(0, cfg.n_classes, size=n)],
    }
    ips, spi = _measure(model, cfg, resident,
                        items_per_image=cfg.seq_len)
    return {"metric": "ssgan_moving_mnist_local_ep_train_throughput",
            "value": round(ips, 1), "unit": "frames/sec/chip",
            "sec_per_iter": round(spi, 6)}


def bench_ssgan_device_synthesis():
    """ssgan with the fully on-device moving-MNIST synthesizer in the loop
    (data/ondevice_moving_mnist.py) — fresh videos per iteration instead of
    resident-epoch gathers."""
    from graphical_gan_tpu.core.config import ssgan_defaults
    from graphical_gan_tpu.models.ssgan import SSGanModel
    from graphical_gan_tpu.data.ondevice_moving_mnist import (
        make_video_sampler)

    cfg = ssgan_defaults("moving_mnist", "local_ep",
                         compute_dtype="bfloat16")
    model = SSGanModel(cfg)
    rng = np.random.RandomState(0)
    resident = {
        "digits": rng.rand(50_000, 28, 28).astype(np.float32),
        "labels": np.eye(cfg.n_classes, dtype=np.float32)[
            rng.randint(0, cfg.n_classes, size=50_000)],
    }
    ips, spi = _measure(model, cfg, resident,
                        items_per_image=cfg.seq_len,
                        sampler=make_video_sampler(cfg.seq_len))
    return {"metric":
            "ssgan_moving_mnist_device_synthesis_train_throughput",
            "value": round(ips, 1), "unit": "frames/sec/chip",
            "sec_per_iter": round(spi, 6)}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--families", nargs="+", default=["gmgan", "ssgan"],
                   choices=["gmgan", "ssgan", "ssgan_device"])
    args = p.parse_args(argv)
    out = []
    for fam in args.families:
        rec = {"gmgan": bench_gmgan, "ssgan": bench_ssgan,
               "ssgan_device": bench_ssgan_device_synthesis}[fam]()
        print(json.dumps(rec))
        out.append(rec)
    return out


if __name__ == "__main__":
    main()
