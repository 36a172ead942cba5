"""Serving-side throughput/latency benchmark.

BASELINE.md's measured tables are all TRAINING numbers; this tool measures
the deployment path: the per-family serving entry (``serve/export.py:
make_entry`` — the same function ``jax.export`` serializes; ``--entry``
picks the generator sampler or the inference side
encoder/cluster/reconstructor) under hard-fetch timing on the current
backend, across request batch sizes.
Optionally round-trips through a real exported artifact
(``--via-export``) to pin that the serialized StableHLO path performs
identically to the in-framework jit.

Methodology matches bench.py: warm compile outside the clock, per round
``k`` dispatches bounded by ONE hard value fetch (per-request latency is
therefore the pipelined amortized figure; ``latency_ms`` with
``--depth 1`` is the true single-request round trip including the host
link), best-of-N rounds, one JSON line per (family, batch).

Usage: python -m graphical_gan_tpu.tools.bench_serving \
          [--families gan_inference,gmgan,ssgan] [--batches 64,512,2048]
          [--depth 10] [--rounds 5] [--via-export] [--run-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from graphical_gan_tpu.core import registry  # noqa: F401 (families import)
from graphical_gan_tpu.serve.export import make_entry


def _build(family: str):
    if family == "gan_inference":
        from graphical_gan_tpu.core.config import gan_inference_defaults
        from graphical_gan_tpu.models.gan_inference import GanInferenceModel
        cfg = gan_inference_defaults("cifar10", "wali-gp",
                                     compute_dtype="bfloat16")
        return GanInferenceModel(cfg)
    if family == "gmgan":
        from graphical_gan_tpu.core.config import gmgan_defaults
        from graphical_gan_tpu.models.gmgan import GMGanModel
        return GMGanModel(gmgan_defaults("cifar10", "local_ep",
                                         compute_dtype="bfloat16"))
    if family == "ssgan":
        from graphical_gan_tpu.core.config import ssgan_defaults
        from graphical_gan_tpu.models.ssgan import SSGanModel
        return SSGanModel(ssgan_defaults("moving_mnist", "local_ep",
                                         compute_dtype="bfloat16"))
    raise ValueError(family)


def _inputs(example, kinds, n: int, key):
    out = []
    for a, kind in zip(example, kinds):
        key, sub = jax.random.split(key)
        shape = (n,) + tuple(a.shape[1:])
        if kind == "image":  # raw-space pixels (values don't affect timing)
            out.append(jax.random.uniform(sub, shape, a.dtype, 0.0, 255.0))
        elif kind == "onehot":  # in-domain labels, mirrors server._draw_prior
            k = int(shape[1])
            idx = jax.random.randint(sub, (n,), 0, k)
            out.append(jnp.eye(k, dtype=a.dtype)[idx])
        elif jnp.issubdtype(a.dtype, jnp.floating):
            out.append(jax.random.normal(sub, shape, a.dtype))
        else:
            out.append(jnp.zeros(shape, a.dtype))
    return tuple(out)


def measure(family: str, batches, depth: int, rounds: int,
            via_export: bool = False, run_dir=None, quantize=None,
            entry: str = "sampler"):
    model = _build(family)
    if run_dir:
        from graphical_gan_tpu.tools.generate import restore_params
        from graphical_gan_tpu.train import checkpoint as ckpt_lib
        params, _ = restore_params(model, ckpt_lib.latest(run_dir))
    else:
        params = model.init(jax.random.PRNGKey(0))
    fn, example, kinds = make_entry(family, model, entry)

    if quantize == "int8":
        if entry != "sampler":
            raise ValueError("--quantize int8 applies to the sampler entry "
                             "only (calibration is prior-latent-based)")
        # PTQ the serving path (ops/quant.py): calibrate once, then keep
        # the context active whenever the sampler traces so both the jit
        # and the --via-export artifact bake in the int8 contractions.
        from graphical_gan_tpu.ops import quant
        from graphical_gan_tpu.serve.quantize import calibrate
        scales = calibrate(family, model, params, jax.random.PRNGKey(11),
                           n_batches=2)
        float_fn = fn

        def fn(params, key, *inputs):
            with quant.quantized(scales):
                return float_fn(params, key, *inputs)
    elif quantize not in (None, "none"):
        raise ValueError(f"unknown quantize mode {quantize!r}")

    call = jax.jit(lambda key, *inp: fn(params, key, *inp))
    label = "jit"
    if via_export:
        from graphical_gan_tpu.serve import export as ex
        exported = jax.export.export(
            call, platforms=[jax.devices()[0].platform])(
            jax.ShapeDtypeStruct((2,), jnp.uint32),
            *ex._arg_specs(example, symbolic=True))
        blob = exported.serialize()  # full serialize/deserialize round trip
        call = jax.export.deserialize(bytearray(blob)).call
        label = "export"

    results = []
    for n in batches:
        inp = _inputs(example, kinds, n, jax.random.PRNGKey(7))
        key = jax.random.PRNGKey(1)
        np.asarray(call(key, *inp))  # compile + warm, outside the clock
        best = float("inf")
        for r in range(rounds):
            t0 = time.perf_counter()
            out = None
            for i in range(depth):
                out = call(jax.random.fold_in(key, r * depth + i), *inp)
            np.asarray(out)  # hard fetch bounds every prior dispatch
            best = min(best, (time.perf_counter() - t0) / depth)
        # video family: one sample is a LEN-frame video
        frames = getattr(model.cfg, "seq_len", 1)
        name = (f"{family}_serving_throughput" if entry == "sampler"
                else f"{family}_{entry}_serving_throughput")
        results.append({
            "metric": name, "path": label, "entry": entry,
            "quantize": quantize or "none",
            "batch": n, "latency_ms": round(best * 1e3, 3),
            "samples_per_sec": round(n / best, 1),
            **({"frames_per_sec": round(n * frames / best, 1)}
               if frames > 1 else {}),
            "device_kind": jax.devices()[0].device_kind,
            "pipeline_depth": depth,
        })
    return results


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--families", default="gan_inference,gmgan,ssgan")
    p.add_argument("--batches", default="64,512,2048")
    p.add_argument("--depth", type=int, default=10,
                   help="dispatches per timed fetch (1 = true single-"
                        "request round-trip latency incl. host link)")
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--via-export", action="store_true",
                   help="benchmark through a serialized jax.export "
                        "artifact instead of the in-framework jit")
    p.add_argument("--run-dir", default=None,
                   help="load trained params from a run dir (default: "
                        "fresh init — identical compute)")
    p.add_argument("--quantize", default=None, choices=["none", "int8"],
                   help="benchmark the int8 PTQ serving path "
                        "(ops/quant.py; calibrated on prior latents)")
    p.add_argument("--entry", default="sampler",
                   choices=["sampler", "encoder", "cluster", "reconstructor"],
                   help="which serving entry to measure (per-family "
                        "availability: serve/export.ENTRIES)")
    args = p.parse_args(argv)
    batches = [int(b) for b in args.batches.split(",")]
    for family in args.families.split(","):
        for rec in measure(family, batches, args.depth, args.rounds,
                           via_export=args.via_export,
                           run_dir=args.run_dir, quantize=args.quantize,
                           entry=args.entry):
            print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
