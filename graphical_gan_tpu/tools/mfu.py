"""Model-FLOP-utilization (MFU) measurement for the headline training step.

Gives the images/sec/chip headline a denominator (VERDICT round-1 stretch
item 9): how much of the chip's peak matmul throughput the fused
G + k*D wali-gp step actually achieves.

Method:

1. FLOPs/iteration come from XLA's own cost model: the SAME step program
   (published cifar10 wali-gp config: B=64, DIM=64, z=128, k=5 critic
   iters, on-device batch sampling included) is lowered and compiled, and
   ``compiled.cost_analysis()['flops']`` is read.  If the active backend
   (e.g. a remote-compile relay) does not expose cost analysis, the program
   is re-lowered for the CPU backend in a subprocess — FLOP counts are a
   property of the HLO arithmetic, not of the executing chip.
2. Step time is measured on the real device exactly like ``bench.py``:
   resident data, scanned chunks, donated state, best-of-N rounds with the
   timed region bounded by HARD VALUE FETCHES (``np.asarray``) — NOT
   ``block_until_ready``, which the relay backend does not honor reliably
   (BASELINE.md "measurement honesty").
3. MFU = flops_per_iter / step_time / peak_flops.  Peak comes from the
   device kind (override with ``GGAN_PEAK_FLOPS``).

The reference has no such instrument (its only timing is the per-iteration
wall clock, ``gan_inference_cifar10.py:432,453``).

Usage: python -m graphical_gan_tpu.tools.mfu [--dtype bfloat16]
Prints one JSON line; results land in BASELINE.md by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# peak dense-matmul FLOP/s per chip by device kind (bf16 for TPUs).
# v5e: 197 TFLOP/s bf16 (f32 matmuls are emulated via bf16 passes, so bf16
# peak is the honest denominator for either compute dtype).
_PEAK = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}

CHUNK = 20


def _family_model(family: str, dtype: str, **overrides):
    if family == "gan":
        from graphical_gan_tpu.core.config import gan_inference_defaults
        from graphical_gan_tpu.models.gan_inference import GanInferenceModel
        cfg = gan_inference_defaults("cifar10", "wali-gp",
                                     compute_dtype=dtype, **overrides)
        return cfg, GanInferenceModel(cfg)
    if family == "gmgan":
        from graphical_gan_tpu.core.config import gmgan_defaults
        from graphical_gan_tpu.models.gmgan import GMGanModel
        cfg = gmgan_defaults("cifar10", "local_ep", compute_dtype=dtype,
                             **overrides)
        return cfg, GMGanModel(cfg)
    if family == "ssgan":
        from graphical_gan_tpu.core.config import ssgan_defaults
        from graphical_gan_tpu.models.ssgan import SSGanModel
        cfg = ssgan_defaults("moving_mnist", "local_ep", compute_dtype=dtype,
                             **overrides)
        return cfg, SSGanModel(cfg)
    raise ValueError(family)


def _family_data(family: str, cfg, n: int = 4096):
    rng = np.random.RandomState(0)
    if family == "ssgan":
        return {"x": rng.rand(n, cfg.seq_len,
                              cfg.output_dim).astype(np.float32),
                "y": np.eye(cfg.n_classes, dtype=np.float32)[
                    rng.randint(0, cfg.n_classes, size=n)]}
    return rng.randint(0, 256,
                       size=(n, cfg.data.output_dim)).astype(np.int32)


def _build(dtype: str, family: str = "gan", **overrides):
    from graphical_gan_tpu.train.step import make_train_step
    from graphical_gan_tpu.data.ondevice import sample_batches_tree

    cfg, model = _family_model(family, dtype, **overrides)
    k = cfg.critic_iters
    step, init_state = make_train_step(model, jit=False)

    def one_iter(state, data, key):
        raw = sample_batches_tree(data, jax.random.fold_in(key, 7), 1 + k,
                                  cfg.batch_size)
        new_state, m = step(state, raw, key, jnp.asarray(True))
        return new_state, m["disc_cost"]

    def chunk(state, data, base_key):
        keys = jax.random.split(base_key, CHUNK)
        return jax.lax.scan(lambda s, kk: one_iter(s, data, kk), state, keys)

    return cfg, model, init_state, one_iter, chunk


def cost_per_iter(dtype: str, family: str = "gan", **overrides) -> dict:
    """XLA cost model of ONE training iteration (single-iter program, so the
    count excludes the scan wrapper): {'flops', 'bytes accessed', ...}."""
    cfg, model, init_state, one_iter, _ = _build(dtype, family, **overrides)
    params = model.init(jax.random.PRNGKey(0))
    state = init_state(params)
    data = jax.tree.map(jnp.asarray, _family_data(family, cfg, n=1024))
    lowered = jax.jit(one_iter).lower(state, data, jax.random.PRNGKey(1))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns one per device
        cost = cost[0]
    if not cost or "flops" not in cost:
        raise RuntimeError("backend exposes no cost analysis")
    return dict(cost)


def flops_per_iter(dtype: str, family: str = "gan", **overrides) -> float:
    return float(cost_per_iter(dtype, family, **overrides)["flops"])


def _flops_via_cpu_subprocess(dtype: str, family: str = "gan") -> float:
    """Recompute the FLOP count on the CPU backend in a fresh interpreter
    (relay backends don't return cost analysis; the HLO arithmetic — and
    hence the flop count — is the same program)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from graphical_gan_tpu.tools.mfu import flops_per_iter;"
        f"print('FLOPS=%r' % flops_per_iter({dtype!r}, {family!r}))"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__)))),
                         capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("FLOPS="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(f"no FLOPS line in subprocess output: {out.stdout!r}")


def measure_step_time(dtype: str, rounds: int = 5,
                      family: str = "gan") -> float:
    """Best-of-N seconds per training iteration on the live backend."""
    cfg, model, init_state, one_iter, chunk = _build(dtype, family)
    state = init_state(model.init(jax.random.PRNGKey(0)))
    data = jax.tree.map(jnp.asarray,
                        _family_data(family, cfg, n=50_000
                                     if family != "ssgan" else 2_000))

    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE"):
        fn, n_iters = jax.jit(one_iter, donate_argnums=(0,)), 1
    else:
        fn, n_iters = jax.jit(chunk, donate_argnums=(0,)), CHUNK
    state, c = fn(state, data, jax.random.PRNGKey(1))  # compile + warm
    np.asarray(jax.tree.leaves(c)[-1])

    # timed region bounded by HARD VALUE FETCHES: on the relay backend,
    # block_until_ready can return before execution completes (see
    # bench.py / BASELINE.md "physics bound") — a value copy cannot.
    n_dispatch = max(1, 100 // n_iters)
    best = float("inf")
    for r in range(rounds):
        np.asarray(jax.tree.leaves(c)[-1])  # drain queue before t0
        t0 = time.perf_counter()
        for i in range(n_dispatch):
            state, c = fn(state, data, jax.random.PRNGKey(2 + r * 97 + i))
        np.asarray(jax.tree.leaves(c)[-1])  # forces all prior dispatches
        best = min(best, (time.perf_counter() - t0) / (n_dispatch * n_iters))
    return best


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--family", default="gan",
                   choices=["gan", "gmgan", "ssgan"])
    args = p.parse_args(argv)

    try:
        cost = cost_per_iter(args.dtype, args.family)
        flops_src = "device cost_analysis"
    except Exception:
        cost = {"flops": _flops_via_cpu_subprocess(args.dtype, args.family)}
        flops_src = "cpu-lowered cost_analysis"
    flops = float(cost["flops"])

    dt = measure_step_time(args.dtype, args.rounds, args.family)

    dev = jax.devices()[0]
    peak = float(os.environ.get("GGAN_PEAK_FLOPS", 0)) or \
        _PEAK.get(dev.device_kind, 0.0)
    achieved = flops / dt
    rec = {
        "metric": {"gan": "cifar10_wali_gp_mfu",
                   "gmgan": "gmgan_cifar10_local_ep_mfu",
                   "ssgan": "ssgan_moving_mnist_local_ep_mfu"}[args.family],
        "dtype": args.dtype,
        "flops_per_iter": flops,
        "flops_source": flops_src,
        "sec_per_iter": round(dt, 6),
        "achieved_tflops": round(achieved / 1e12, 2),
        "device_kind": dev.device_kind,
        "peak_tflops": round(peak / 1e12, 1) if peak else None,
        "mfu": round(achieved / peak, 4) if peak else None,
    }
    # roofline companion: if the program moves B bytes/iter, its HBM-side
    # speed-of-light is B / <bw peak>; low MFU with high BW utilization
    # means the program is bandwidth-bound, not badly scheduled.
    nbytes = float(cost.get("bytes accessed", 0.0))
    if nbytes:
        rec["bytes_per_iter"] = nbytes
        rec["achieved_gbps"] = round(nbytes / dt / 1e9, 1)
        bw_peak = {"TPU v5 lite": 819e9, "TPU v5e": 819e9,
                   "TPU v4": 1228e9, "TPU v5p": 2765e9,
                   "TPU v6 lite": 1640e9}.get(dev.device_kind)
        if bw_peak:
            rec["hbm_bw_util"] = round(nbytes / dt / bw_peak, 4)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
