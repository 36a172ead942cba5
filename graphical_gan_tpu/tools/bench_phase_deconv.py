"""A/B: input-dilated ``lax.conv_transpose`` vs the phase-decomposed
stride-2 transposed conv (``ops/phase_deconv.py``) at the family shapes.

Round-3 context (BASELINE.md): both the wali-gp and ssgan steps plateau on
conv-kernel efficiency; the transposed convs (and every stride-2 forward
conv's input-gradient) lower to input-dilated convolutions where up to 3/4
of the MACs multiply inserted zeros.  The phase rewrite computes the same
map with a stride-1 conv over the 2x2 output-phase sub-kernels: for k=5,
H*W*36 taps instead of 4*H*W*25 — 2.8x fewer MACs if XLA's dilated
lowering does not skip zeros.  This bench decides the
``GGAN_PHASE_DECONV`` gate default with measured numbers.

Measures fwd and fwd+bwd (value_and_grad wrt both operands) per shape.
Timing discipline: hard-fetch-bounded regions (BASELINE.md "measurement
honesty"), REPS applications per compiled program, best-of-N rounds.

Usage: python -m graphical_gan_tpu.tools.bench_phase_deconv
Prints one JSON line per (shape, pass).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from graphical_gan_tpu.ops.phase_deconv import conv_transpose_phase

_DN2D = ("NHWC", "HWIO", "NHWC")
REPS = 8   # overridable: --reps (raise well above the ~3.4 ms dispatch
ROUNDS = 5  # floor of the relay so per-op deltas are visible)

# (label, batch, H, C_in, C_out) — k=5, stride 2, SAME throughout the
# families.  cifar10 wali-gp G (DIM=64, B=64): gen2/gen3/gen5.
# face/celebA G (DIM=32, B=128): face1.  ssgan frame G (B*LEN=800, DIM=64):
# ss2/ss3/ss5 (64x64 output, models/ssgan.py:213-215).
SHAPES = [
    ("gen2", 64, 4, 256, 128),
    ("gen3", 64, 8, 128, 64),
    ("gen5", 64, 16, 64, 3),
    ("face1", 128, 4, 256, 128),
    ("face4", 128, 32, 32, 3),
    ("ss2", 800, 8, 256, 128),
    ("ss3", 800, 16, 128, 64),
    ("ss5", 800, 32, 64, 1),
]


def _dilated(x, w):
    return lax.conv_transpose(x, w, strides=(2, 2), padding="SAME",
                              dimension_numbers=_DN2D, transpose_kernel=True)


def _make_fns(k=5):
    # rep loop is a lax.scan (compile stays O(1) in --reps; the scan's
    # per-step overhead is identical for both sides so ratios are clean)
    def fwd(core):
        def f(xs, w):
            def step(acc, x):
                return acc + jnp.sum(core(x, w)), None
            return lax.scan(step, jnp.zeros((), xs.dtype), xs)[0]
        return jax.jit(f)

    def fwdbwd(core):
        def step_loss(x, w):
            return jnp.sum(jnp.square(core(x, w)))

        def f(xs, w):
            def step(acc, x):
                v, (gx, gw) = jax.value_and_grad(
                    step_loss, argnums=(0, 1))(x, w)
                return acc + v + jnp.sum(gx[0, 0, 0]) + jnp.sum(gw[0, 0]), \
                    None
            return lax.scan(step, jnp.zeros((), xs.dtype), xs)[0]
        return jax.jit(f)

    return {
        ("dilated", "fwd"): fwd(_dilated),
        ("phase", "fwd"): fwd(conv_transpose_phase),
        ("dilated", "fwdbwd"): fwdbwd(_dilated),
        ("phase", "fwdbwd"): fwdbwd(conv_transpose_phase),
    }


def _time(fn, xs, w):
    out = fn(xs, w)
    np.asarray(jax.tree.leaves(out)[0])  # warm compile + hard fetch
    best = float("inf")
    for _ in range(ROUNDS):
        np.asarray(jax.tree.leaves(out)[0])  # drain queue
        t0 = time.perf_counter()
        out = fn(xs, w)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--reps", type=int, default=None)
    p.add_argument("--shapes", default=None,
                   help="comma-separated subset of shape labels")
    args = p.parse_args(argv)
    dtype = jnp.dtype(args.dtype)
    global REPS
    if args.reps:
        REPS = args.reps
    fns = _make_fns(args.k)
    shapes = SHAPES if not args.shapes else \
        [s for s in SHAPES if s[0] in args.shapes.split(',')]

    for label, b, h, ci, co in shapes:
        rng = np.random.RandomState(0)
        xs = jnp.asarray(rng.randn(REPS, b, h, h, ci).astype(np.float32),
                         dtype)
        w = jnp.asarray(rng.randn(args.k, args.k, co, ci).astype(np.float32)
                        * 0.05, dtype)
        rec = {"metric": "phase_deconv_ab", "shape": label,
               "batch": b, "hw": h, "cin": ci, "cout": co,
               "dtype": args.dtype}
        for which in ("fwd", "fwdbwd"):
            td = _time(fns[("dilated", which)], xs, w)
            tp = _time(fns[("phase", which)], xs, w)
            rec[f"dilated_{which}_ms"] = round(td * 1e3, 4)
            rec[f"phase_{which}_ms"] = round(tp * 1e3, 4)
            rec[f"phase_speedup_{which}"] = round(td / tp, 3)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
