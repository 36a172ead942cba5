"""Honest A/B of the Pallas fused BN+act kernel vs the XLA paths.

Measures THREE sides per shape, so the gate decision compares against what
the framework actually runs, not an idealized baseline:

- ``prod``: the exact production math of ``ops/norm.py: batchnorm_act``'s
  jnp branch — ``jnp.mean`` + ``jnp.var`` (which re-subtracts the mean) +
  normalize + activation. This is what XLA compiles when the Pallas gate
  is off.
- ``ideal``: a hand-fused one-pass-moments version (var = E[x^2]-E[x]^2) —
  the cheapest possible XLA formulation, kept as the reference point.
- ``pallas``: ``ops/pallas/fused_norm.py: fused_batchnorm_act``.

Timing discipline: hard-fetch-bounded regions (BASELINE.md "measurement
honesty" — `jax.block_until_ready` is not honored reliably by the relay
backend), REPS independent applications per compiled program (distinct
inputs, summed scalar output so nothing DCEs), best-of-N rounds.

Usage: python -m graphical_gan_tpu.tools.bench_pallas [--dtype float32]
Prints one JSON line per shape.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

REPS = 10
ROUNDS = 5

# (label, [rows, channels]) — the documented 0.5 GB shape + family shapes
SHAPES = [
    ("0.5GB", (64 * 64 * 64, 512)),
    ("disc2", (64 * 16 * 16, 128)),
    ("gen1", (64 * 8 * 8, 256)),
]

EPS = 1e-5


def _leaky(y):
    return jnp.where(y >= 0, y, 0.2 * y)


def _sides():
    from graphical_gan_tpu.ops.pallas.fused_norm import fused_batchnorm_act

    def prod_one(x, scale, offset):
        # exact math of ops/norm.py batchnorm (jnp branch) + activation
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=0)
        var = jnp.var(x32, axis=0)
        inv = jax.lax.rsqrt(var + EPS) * scale
        out = ((x32 - mean) * inv + offset).astype(x.dtype)
        return jnp.sum(_leaky(out))

    def ideal_one(x, scale, offset):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=0)
        var = jnp.mean(jnp.square(x32), axis=0) - jnp.square(mean)
        y = (x32 - mean) * jax.lax.rsqrt(var + EPS) * scale + offset
        return jnp.sum(_leaky(y.astype(x.dtype)))

    def pallas_one(x, scale, offset):
        return jnp.sum(fused_batchnorm_act(x, scale, offset, "leaky_relu",
                                           EPS))

    def reps(one):
        def fn(xs, scale, offset):
            return sum(one(xs[i], scale, offset) for i in range(xs.shape[0]))
        return fn

    return {"prod": reps(prod_one), "ideal": reps(ideal_one),
            "pallas": reps(pallas_one)}


def _time_fn(fn, xs, scale, offset):
    out = fn(xs, scale, offset)
    np.asarray(out)  # hard warm fetch
    best = float("inf")
    for _ in range(ROUNDS):
        np.asarray(out)  # drain queue
        t0 = time.perf_counter()
        out = fn(xs, scale, offset)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dtype", default="float32")
    args = p.parse_args(argv)
    dtype = jnp.dtype(args.dtype)
    sides = {name: jax.jit(fn) for name, fn in _sides().items()}

    for label, (rows, c) in SHAPES:
        rng = np.random.RandomState(0)
        xs = jnp.asarray(rng.rand(REPS, rows, c).astype(np.float32) * 2 - 1,
                         dtype)
        scale = jnp.ones((c,), jnp.float32)
        offset = jnp.zeros((c,), jnp.float32)
        t = {name: _time_fn(fn, xs, scale, offset)
             for name, fn in sides.items()}
        # NOMINAL traffic (one read + one write of the activation): the
        # two-pass BN implementations actually read the input at least
        # twice (moments + normalize), so *_nominal_gbps understates real
        # HBM traffic and is a lower bound, comparable only as a floor.
        # The ratio fields (pallas_vs_*) are time ratios and unaffected.
        nbytes = 2 * rows * c * xs.dtype.itemsize
        print(json.dumps({
            "metric": "pallas_fused_bn_act_ab",
            "shape": label, "rows": rows, "channels": c,
            "dtype": args.dtype,
            "prod_ms": round(t["prod"] * 1e3, 3),
            "ideal_ms": round(t["ideal"] * 1e3, 3),
            "pallas_ms": round(t["pallas"] * 1e3, 3),
            "pallas_vs_prod": round(t["prod"] / t["pallas"], 3),
            "pallas_vs_ideal": round(t["ideal"] / t["pallas"], 3),
            "prod_nominal_gbps": round(nbytes / t["prod"] / 1e9, 1),
            "pallas_nominal_gbps": round(nbytes / t["pallas"] / 1e9, 1),
        }))


if __name__ == "__main__":
    main()
