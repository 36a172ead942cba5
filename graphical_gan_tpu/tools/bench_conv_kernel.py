"""Hard-fetch A/B of the shape-specialized Pallas conv (ops/pallas/
conv_gemm.py) vs XLA's identically-fused conv at the flagship D-stack
shapes (the 89.4%-of-device-time fusions, BENCH_r04 / BASELINE.md trace).

Timing discipline for µs-scale kernels on the relayed backend: a bare
per-dispatch loop is dominated by the ~23 ms relay dispatch latency
(measured 2.9 ms/call amortized at depth 20 — 50x the kernel itself), so
each arm compiles ONE program containing R in-program applications
(i-scaled inputs so XLA cannot CSE them; summed scalar output so nothing
DCEs) and the per-rep figure is the DIFFERENTIAL ``(T(2R) - T(R)) / R``,
best-of-N rounds with hard value fetches — the constant dispatch/fetch
overhead cancels exactly, leaving pure device time per conv.

    python -m graphical_gan_tpu.tools.bench_conv_kernel [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


# flagship cifar10 wali-gp discriminator conv shapes (published config,
# batch 64; dims from models/networks.py: discriminator_x_trunk).  disc1
# (Cin=3) is excluded from the Pallas path: a 3-channel lane dim pads to
# 128 in Mosaic's VMEM layout (42x inflation of the staged input), so the
# stem conv stays with XLA, whose conv kernels handle C=3 natively.
SHAPES = [
    ("disc2", 64, 16, 64, 128),
    ("disc3", 64, 8, 128, 256),
    # headroom shapes (BASELINE.md B=512 row)
    ("disc2_b512", 512, 16, 64, 128),
    ("disc3_b512", 512, 8, 128, 256),
]


def _reps_program(one, r: int):
    # lax.fori_loop, not an unrolled python loop: every unrolled call site
    # lowers the Mosaic kernel again (measured ~10 s/site — a 50-rep
    # program would take minutes to compile); the loop keeps ONE call site
    # and runs r device iterations.
    #
    # The per-iteration input must be IRREDUCIBLY distinct: conv is linear,
    # so a scalar perturbation (xi = x * (1 + i*eps), or + i*eps) lets
    # XLA's simplifier hoist the n distinct convs out of the loop and
    # reduce the body to scalar algebra — measured as an impossible
    # 252 TFLOP/s "conv" rate, while the Pallas arm's custom call is
    # opaque and CANNOT be hoisted, making the A/B compare a real kernel
    # against algebra.  jnp.roll by the loop index is airtight: a
    # loop-varying permutation of the input that no rewrite moves across
    # the conv, costing one relayout copy per rep in BOTH arms equally.
    def fn(xs, w, b):
        n = xs.shape[0]

        def body(i, tot):
            xi = jax.lax.dynamic_index_in_dim(xs, i % n, keepdims=False)
            xi = jnp.roll(xi, i, axis=1)
            return tot + jnp.sum(one(xi, w, b).astype(jnp.float32))

        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
    return jax.jit(fn)


def _time_program(fn, xs, w, b, rounds: int) -> float:
    out = fn(xs, w, b)
    np.asarray(out)              # warm compile + queue drain
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn(xs, w, b)
        np.asarray(out)          # hard fetch bounds the region
        best = min(best, time.perf_counter() - t0)
    return best


def bench_arm(one, xs, w, b, reps: int, rounds: int) -> float:
    t1 = _time_program(_reps_program(one, reps), xs, w, b, rounds)
    t2 = _time_program(_reps_program(one, 2 * reps), xs, w, b, rounds)
    return (t2 - t1) / reps      # dispatch constant cancels


def main(argv=None) -> int:
    from graphical_gan_tpu.ops.pallas.conv_gemm import (
        conv_gemm, conv_gemm_reference)

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--reps", type=int, default=0,
                   help="in-program applications at the base point (the "
                        "2x point doubles it); 0 = auto-scale per shape "
                        "so the differential spans ~20 ms of device time "
                        "(µs-scale kernels need hundreds of reps or the "
                        "T(2R)-T(R) difference drowns in relay jitter)")
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--n-inputs", type=int, default=4)
    args = p.parse_args(argv)
    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)

    import functools as _ft
    arms = {
        "xla": conv_gemm_reference,
        "pallas_taps": conv_gemm,
        "pallas_im2col": _ft.partial(conv_gemm, variant="im2col"),
    }
    for name, b, h, cin, cout in SHAPES:
        xs = jnp.asarray(rng.randn(args.n_inputs, b, h, h, cin), dt)
        w = jnp.asarray(rng.randn(5, 5, cin, cout) * 0.05, dt)
        bias = jnp.asarray(rng.randn(cout), dt)
        oh = -(-h // 2)
        flops = 2 * b * oh * oh * cout * 25 * cin
        reps = args.reps or max(50, min(1000, int(2e12 / flops)))

        ref = np.asarray(conv_gemm_reference(xs[0], w, bias), np.float32)
        scale = max(1.0, float(np.abs(ref).max()))
        rec = {"shape": name, "dtype": args.dtype, "reps": reps,
               "device_kind": jax.devices()[0].device_kind}
        times = {}
        for arm, fn in arms.items():
            got = np.asarray(fn(xs[0], w, bias), np.float32)
            rec[f"{arm}_rel_maxerr"] = round(
                float(np.abs(ref - got).max()) / scale, 6)
            t = bench_arm(fn, xs, w, bias, reps, args.rounds)
            times[arm] = t
            rec[f"{arm}_us"] = round(t * 1e6, 2)
            rec[f"{arm}_tflops"] = round(flops / t / 1e12, 2)
        best = min(times, key=lambda a: times[a])
        rec["best_pallas_vs_xla"] = round(
            times["xla"] / min(times["pallas_taps"], times["pallas_im2col"]),
            3)
        rec["best"] = best
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
