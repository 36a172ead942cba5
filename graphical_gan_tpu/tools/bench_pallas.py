"""Honest A/B of the Pallas fused BN+act kernel vs the XLA path.

Re-measures the `ops/pallas/fused_norm.py` claim with the hard-fetch timing
discipline (BASELINE.md "measurement honesty" — `jax.block_until_ready` is
not honored reliably by the relay backend, so any earlier A/B timed with it
is suspect even as a ratio).

Each side runs REPS independent applications per compiled program (distinct
inputs, summed scalar output so nothing DCEs), the timed region is bounded
by `np.asarray` fetches, best-of-N rounds.

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
    from graphical_gan_tpu.ops.pallas.fused_norm import fused_batchnorm_act

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dtype", default="float32")
    args = p.parse_args(argv)
    dtype = jnp.dtype(args.dtype)

    eps = 1e-5

    def xla_side(xs, scale, offset):
        def one(x):
            mean = jnp.mean(x, axis=0)
            var = jnp.mean(jnp.square(x), axis=0) - jnp.square(mean)
            y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + offset
            return jnp.sum(jnp.where(y >= 0, y, 0.2 * y))

        return sum(one(xs[i]) for i in range(xs.shape[0]))

    def pallas_side(xs, scale, offset):
        return sum(
            jnp.sum(fused_batchnorm_act(xs[i], scale, offset, "leaky_relu",
                                        eps))
            for i in range(xs.shape[0]))

    for label, (rows, c) in SHAPES:
        rng = np.random.RandomState(0)
        xs = jnp.asarray(rng.rand(REPS, rows, c).astype(np.float32) * 2 - 1,
                         dtype)
        scale = jnp.ones((c,), jnp.float32)
        offset = jnp.zeros((c,), jnp.float32)
        t_xla = _time_fn(jax.jit(xla_side), xs, scale, offset)
        t_pal = _time_fn(jax.jit(pallas_side), xs, scale, offset)
        nbytes = 2 * rows * c * xs.dtype.itemsize  # one read + one write
        print(json.dumps({
            "metric": "pallas_fused_bn_act_ab",
            "shape": label, "rows": rows, "channels": c,
            "dtype": args.dtype,
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "speedup": round(t_xla / t_pal, 3),
            "xla_gbps": round(nbytes / t_xla / 1e9, 1),
            "pallas_gbps": round(nbytes / t_pal / 1e9, 1),
        }))


if __name__ == "__main__":
    main()
