"""Determinism / race audit.

Large-scale training treats nondeterminism as a failure class: a racy host
gather, an unordered prefetch queue, or a nondeterministic device kernel
turns "resume from checkpoint" and "reproduce this divergence" into
guesswork.  The reference had no notion of this (single-threaded feed_dict
loop, zero tests — SURVEY §4/§5).  This tool audits every layer of the
rebuild's input + step pipeline by running each twice and demanding BIT
identity:

1. ``step_replay``     — the fused G+kD jitted step from identical state,
                         batch and key: device-kernel determinism.
2. ``chunk_replay``    — an N-iteration resident ``lax.scan`` chunk (the
                         production hot loop's dispatch unit), including
                         the on-device batch sampler.
3. ``loader_replay``   — two epochs of the host loader at the same seed,
                         byte-compared; sized to engage the multithreaded
                         C++ batcher (``native/batcher.cc``), so a race in
                         the threaded row gather flips the comparison.
4. ``prefetch_order``  — ``data.prefetch.prefetch_to_device`` must yield
                         exactly the source order (its worker thread is a
                         classic reordering hazard).
5. ``trainer_replay``  — two complete short ``Trainer`` runs (resident
                         mode, same seed, fresh run dirs): final params
                         bit-equal.  The whole-system check the others
                         localize.

Each check prints one JSON line ``{"check": ..., "ok": ...,
"detail": ...}``; the process exits nonzero if any check fails.  Run on
the real TPU this audits the hardware-backed kernels; under
``JAX_PLATFORMS=cpu`` it audits the host pipeline (CI does the latter in
``tests/test_determinism.py``).

Usage: python -m graphical_gan_tpu.tools.determinism \
           [--family gan|gmgan|ssgan] [--dim N] [--batch-size N]
           [--chunk-iters N] [--trainer-iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp


def _copy(tree):
    """Deep on-device copy, so donation of one replica can't alias the
    other."""
    return jax.tree.map(lambda x: jnp.array(x), tree)


def _bit_equal(a, b) -> bool:
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y), equal_nan=True)
        for x, y in zip(la, lb))


def _build(family: str, dim: int, batch_size: int):
    if family == "gan":
        from graphical_gan_tpu.core.config import gan_inference_defaults
        from graphical_gan_tpu.models.gan_inference import GanInferenceModel
        cfg = gan_inference_defaults("cifar10", "wali-gp", dim=dim,
                                     batch_size=batch_size)
        model = GanInferenceModel(cfg)
        rng = np.random.RandomState(0)
        resident = rng.rand(16 * batch_size,
                            cfg.data.output_dim).astype("float32")
    elif family == "gmgan":
        from graphical_gan_tpu.core.config import gmgan_defaults
        from graphical_gan_tpu.models.gmgan import GMGanModel
        cfg = gmgan_defaults("cifar10", "local_ep", dim=dim,
                             batch_size=batch_size)
        model = GMGanModel(cfg)
        rng = np.random.RandomState(0)
        resident = rng.rand(16 * batch_size,
                            cfg.data.output_dim).astype("float32")
    elif family == "ssgan":
        from graphical_gan_tpu.core.config import ssgan_defaults
        from graphical_gan_tpu.models.ssgan import SSGanModel
        cfg = ssgan_defaults("moving_mnist", "local_ep", dim=dim,
                             batch_size=batch_size, seq_len=4)
        model = SSGanModel(cfg)
        rng = np.random.RandomState(0)
        resident = {
            "x": rng.rand(8 * batch_size, cfg.seq_len,
                          cfg.data.output_dim).astype("float32"),
            "y": np.eye(cfg.n_classes, dtype="float32")[
                rng.randint(0, cfg.n_classes, size=8 * batch_size)],
        }
    else:
        raise ValueError(f"unknown family {family!r}")
    return model, cfg, resident


def check_step_replay(model, cfg, resident) -> Dict:
    from graphical_gan_tpu.train.step import make_train_step
    from graphical_gan_tpu.data.ondevice import sample_batches_tree

    step, init_state = make_train_step(model, jit=False)
    fn = jax.jit(step, donate_argnums=(0,))
    params = model.init(jax.random.PRNGKey(0))
    state = init_state(params)
    data = jax.tree.map(jnp.asarray, resident)
    raw = sample_batches_tree(data, jax.random.PRNGKey(7),
                              1 + cfg.critic_iters, cfg.batch_size)
    key = jax.random.PRNGKey(3)
    s1, m1 = fn(_copy(state), _copy(raw), key, jnp.asarray(True))
    s2, m2 = fn(_copy(state), _copy(raw), key, jnp.asarray(True))
    ok = _bit_equal(s1, s2) and _bit_equal(m1, m2)
    return {"check": "step_replay", "ok": ok,
            "detail": "fused G+kD step replayed bit-exactly" if ok
            else "replayed step states differ (nondeterministic kernels?)"}


def check_chunk_replay(model, cfg, resident, n_iters: int) -> Dict:
    from graphical_gan_tpu.train.step import make_train_step
    from graphical_gan_tpu.data.ondevice import sample_batches_tree

    k = cfg.critic_iters
    step, init_state = make_train_step(model, jit=False)

    def chunk(state, data, base_key):
        def body(st, kk):
            raw = sample_batches_tree(data, jax.random.fold_in(kk, 7),
                                      1 + k, cfg.batch_size)
            return step(st, raw, kk, st.step > 0)

        return jax.lax.scan(body, state,
                            jax.random.split(base_key, n_iters))

    fn = jax.jit(chunk, donate_argnums=(0,))
    state = init_state(model.init(jax.random.PRNGKey(0)))
    data = jax.tree.map(jnp.asarray, resident)
    key = jax.random.PRNGKey(11)
    s1, m1 = fn(_copy(state), data, key)
    s2, m2 = fn(_copy(state), data, key)
    ok = _bit_equal(s1, s2) and _bit_equal(m1, m2)
    return {"check": "chunk_replay", "ok": ok,
            "detail": f"{n_iters}-iteration scanned chunk replayed "
            "bit-exactly" if ok else
            "replayed chunk states differ (sampler/scan nondeterminism?)"}


def check_loader_replay() -> Dict:
    """Byte-identity of two same-seed epochs, sized to engage the THREADED
    native gather (>= 1 MiB per batch, >= 2 worker threads)."""
    from graphical_gan_tpu.data.common import generator_factory

    rng = np.random.RandomState(5)
    a = rng.rand(4096, 4096).astype("float32")    # 1 MiB rows x 64 = 64 MiB
    y = rng.randint(0, 10, size=4096)
    prev = os.environ.get("GGAN_BATCHER_THREADS")
    os.environ["GGAN_BATCHER_THREADS"] = "4"      # force the threaded path
    try:
        f1 = generator_factory(64, a, y, seed=123)
        f2 = generator_factory(64, a, y, seed=123)
        for i, (b1, b2) in enumerate(zip(f1(), f2())):
            for x1, x2 in zip(b1, b2):
                if x1.tobytes() != x2.tobytes():
                    return {"check": "loader_replay", "ok": False,
                            "detail": f"epoch batch {i} differs between "
                            "same-seed replays (host gather race?)"}
    finally:
        if prev is None:
            os.environ.pop("GGAN_BATCHER_THREADS", None)
        else:
            os.environ["GGAN_BATCHER_THREADS"] = prev
    return {"check": "loader_replay", "ok": True,
            "detail": "same-seed epochs byte-identical through the "
            "threaded native gather"}


def check_prefetch_order() -> Dict:
    from graphical_gan_tpu.data.prefetch import prefetch_to_device

    rng = np.random.RandomState(9)
    src = [rng.rand(8, 32).astype("float32") for _ in range(64)]
    it = prefetch_to_device(iter(src), size=2)
    try:
        for i, got in enumerate(it):
            if not np.array_equal(np.asarray(got), src[i]):
                return {"check": "prefetch_order", "ok": False,
                        "detail": f"prefetched batch {i} out of order"}
        n = i + 1
    finally:
        it.close()
    ok = n == len(src)
    return {"check": "prefetch_order", "ok": ok,
            "detail": f"{n}/{len(src)} batches in source order" if ok
            else f"prefetch dropped batches ({n}/{len(src)})"}


def check_trainer_replay(model, cfg, resident, iters: int) -> Dict:
    from graphical_gan_tpu.train.trainer import Trainer

    finals = []
    for rep in range(2):
        with tempfile.TemporaryDirectory() as d:
            tr = Trainer(model, lambda: iter(()), outf=d, seed=42,
                         checkpoint_every=0, resident_data=resident,
                         render_curves=False)
            tr.train(iters=iters, resume=False)
            finals.append({n: np.asarray(p)
                           for n, p in tr.params.items()})
    ok = _bit_equal(finals[0], finals[1])
    return {"check": "trainer_replay", "ok": ok,
            "detail": f"two {iters}-iteration production runs ended "
            "bit-identical" if ok else
            "same-seed production runs diverged (system nondeterminism)"}


def run_all(family: str = "gan", dim: int = 16, batch_size: int = 8,
            chunk_iters: int = 4, trainer_iters: int = 6) -> List[Dict]:
    model, cfg, resident = _build(family, dim, batch_size)
    return [
        check_step_replay(model, cfg, resident),
        check_chunk_replay(model, cfg, resident, chunk_iters),
        check_loader_replay(),
        check_prefetch_order(),
        check_trainer_replay(model, cfg, resident, trainer_iters),
    ]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--family", default="gan",
                   choices=["gan", "gmgan", "ssgan"])
    p.add_argument("--dim", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--chunk-iters", type=int, default=4)
    p.add_argument("--trainer-iters", type=int, default=6)
    args = p.parse_args(argv)
    results = run_all(args.family, args.dim, args.batch_size,
                      args.chunk_iters, args.trainer_iters)
    for r in results:
        r["family"] = args.family
        r["backend"] = jax.devices()[0].platform
        print(json.dumps(r))
    return 0 if all(r["ok"] for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
