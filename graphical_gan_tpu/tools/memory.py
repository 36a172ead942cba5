"""HBM memory analysis of the compiled training step (capacity planning).

``tools/mfu.py`` gives the step a FLOP denominator; this gives it a BYTE
one: XLA's buffer assignment for the exact fused step program —
arguments (the resident train state + data), outputs, temporaries (the
activation working set between fusions), and the allocator's peak — plus
the device's reported HBM budget, so an operator can answer "will this
config fit / how much batch or resident-data headroom is left?" before
launching.  The knobs that move memory are first-class flags: batch
size, gradient accumulation (``--accum-steps``), and the low-byte modes
(``--param-dtype/--moment-dtype bfloat16``), so their effect is
measurable here the same way their quality effect is measured by
``tools/sensitivity.py``.

The reference has no memory accounting of any kind (TF1 grows buffers
until the allocator OOMs mid-run); this is new TPU-native machinery.

Method: the SAME single-iteration program ``bench.py``/``tools/mfu.py``
measure (on-device batch sampling + fused G/D update) is lowered and
compiled, and ``compiled.memory_analysis()`` is read.  Buffer assignment
is a property of the backend the program was compiled FOR: numbers from
the TPU backend are authoritative; when the active backend does not
expose them (e.g. a remote-compile relay), the tool falls back to
compiling for CPU in a subprocess and says so in ``backend`` —
indicative layout, same HLO.

Usage: python -m graphical_gan_tpu.tools.memory [--family gan]
          [--dtype bfloat16] [--batch-size N] [--accum-steps K]
          [--param-dtype bfloat16] [--moment-dtype bfloat16]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from graphical_gan_tpu.tools.mfu import _build, _family_data

_GIB = float(1 << 30)

# fallback HBM budgets by device kind (bytes) when memory_stats() is absent
_HBM_BY_KIND = {
    "TPU v5 lite": 16 * (1 << 30),
    "TPU v5e": 16 * (1 << 30),
    "TPU v4": 32 * (1 << 30),
    "TPU v5p": 95 * (1 << 30),
}


def _tree_bytes(tree) -> int:
    return int(sum(np.prod(x.shape) * x.dtype.itemsize
                   for x in jax.tree.leaves(tree)))


def step_memory(dtype: str = "bfloat16", family: str = "gan",
                data_rows: int = 1024, **overrides) -> dict:
    """Compile the one-iteration step program and read its buffer stats."""
    cfg, model, init_state, one_iter, _ = _build(dtype, family, **overrides)
    params = model.init(jax.random.PRNGKey(0))
    state = init_state(params)
    data = jax.tree.map(jnp.asarray, _family_data(family, cfg, n=data_rows))
    compiled = jax.jit(one_iter).lower(
        state, data, jax.random.PRNGKey(1)).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        raise RuntimeError("backend exposes no memory analysis")
    out = {
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "alias_bytes": int(ma.alias_size_in_bytes),
        "generated_code_bytes": int(ma.generated_code_size_in_bytes),
        "peak_bytes": int(ma.peak_memory_in_bytes),
    }
    # state composition from shapes (backend-independent)
    out["state_bytes"] = _tree_bytes(state)
    out["param_bytes"] = _tree_bytes(state.params)
    out["data_resident_bytes"] = _tree_bytes(data)
    out["data_rows"] = data_rows
    return out


def _device_budget() -> dict:
    dev = jax.devices()[0]
    budget = None
    try:
        stats = dev.memory_stats()
        if stats:
            budget = int(stats.get("bytes_limit") or 0) or None
    except Exception:
        pass
    if budget is None:
        for kind, cap in _HBM_BY_KIND.items():
            if kind in dev.device_kind:
                budget = cap
                break
    return {"device_kind": dev.device_kind, "hbm_budget_bytes": budget}


def _via_cpu_subprocess(dtype: str, family: str, data_rows: int,
                        overrides: dict) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    code = (
        "import jax, json; jax.config.update('jax_platforms','cpu');"
        "from graphical_gan_tpu.tools.memory import step_memory;"
        f"print('MEM=' + json.dumps(step_memory({dtype!r}, {family!r}, "
        f"data_rows={data_rows}, **{overrides!r})))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("MEM="):
            return json.loads(line[4:])
    raise RuntimeError(f"no MEM line in subprocess output: {out.stdout!r}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--family", default="gan",
                   choices=["gan", "gmgan", "ssgan"])
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--dim", type=int, default=None,
                   help="override the model width (smoke/testing)")
    p.add_argument("--accum-steps", type=int, default=None)
    p.add_argument("--param-dtype", default=None)
    p.add_argument("--moment-dtype", default=None)
    p.add_argument("--data-rows", type=int, default=1024,
                   help="resident synthetic-data rows included as step "
                        "arguments (scale to your real dataset size)")
    args = p.parse_args(argv)
    overrides = {k: v for k, v in [
        ("batch_size", args.batch_size), ("dim", args.dim),
        ("accum_steps", args.accum_steps),
        ("param_dtype", args.param_dtype),
        ("moment_dtype", args.moment_dtype)] if v is not None}

    backend = jax.default_backend()
    try:
        mem = step_memory(args.dtype, args.family,
                          data_rows=args.data_rows, **overrides)
        backend_note = backend
    except RuntimeError:
        mem = _via_cpu_subprocess(args.dtype, args.family, args.data_rows,
                                  overrides)
        backend_note = f"cpu-lowered (active backend {backend} exposes no "\
                       "memory analysis; layout indicative, same HLO)"

    rec = {"metric": "step_memory", "family": args.family,
           "dtype": args.dtype, **overrides,
           **mem, **_device_budget(), "backend": backend_note}
    if rec.get("hbm_budget_bytes"):
        rec["peak_frac_of_hbm"] = round(
            rec["peak_bytes"] / rec["hbm_budget_bytes"], 4)
        # rows of resident data that still fit beside the step's live set
        row_bytes = mem["data_resident_bytes"] / max(mem["data_rows"], 1)
        live = mem["peak_bytes"] + mem["argument_bytes"] \
            - mem["data_resident_bytes"]
        rec["resident_rows_headroom"] = int(
            max(0.0, rec["hbm_budget_bytes"] - live) / max(row_bytes, 1))
    for k, v in list(rec.items()):
        if k.endswith("_bytes") and v is not None:
            rec[k.replace("_bytes", "_gib")] = round(v / _GIB, 4)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
