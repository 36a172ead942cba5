"""Serving export: trained samplers as portable compiled artifacts.

The reference has no deployment story at all — it writes one end-of-run
checkpoint and ships no restore code (``gan_inference_cifar10.py:415,
498-499``).  ``tools/generate.py`` closed the restore gap; this module closes
the SERVING gap the TPU-native way: ``jax.export`` serializes the sampler —
StableHLO + the trained weights baked in as constants — into one
self-contained blob that any JAX process can deserialize and run **without
this framework installed**, on any platform it was lowered for (TPU serving
fleet, CPU canary) and on any accelerator topology, because the program
carries its own lowering rather than Python code.

Artifacts (written to ``<run_dir>/export/`` by default):

- ``sampler.jaxexport`` — the serialized Exported blob; callers do
  ``jax.export.deserialize(blob).call(key, *inputs)``
- ``manifest.json`` — family, input names/shapes/dtypes, checkpoint
  iteration, lowering platforms, and the display-space transform for the
  outputs (families emit [-1, 1] or [0, 1] — see ``display`` field)

Per family the exported sampler callable is ``f(key, *inputs) -> images``:

- gan_inference: ``f(key, noise[n, dim_latent])``
- gmgan:         ``f(key, k_onehot[n, n_coms], noise[n, dim_latent])``
- ssgan:         ``f(key, z_l_0[n, dim_l], z_g[n, dim_g][, labels])``

The INFERENCE side exports too (``--entry``, see ``ENTRIES``): ``encoder``
(x → q_z), ``cluster`` (x → q(k|x), gmgan), ``reconstructor`` (x → G(E(x)))
— each takes RAW-space data exactly as the dataset loaders yield it and
lands in ``<run_dir>/export_<entry>/``.

The batch dim ``n`` is exported SYMBOLIC (``jax.export.symbolic_shape``)
when possible, so one artifact serves any request size; if a model's
tracing rejects symbolic batch, the export falls back to the fixed example
size and the manifest records it.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

from graphical_gan_tpu.core import registry


def make_sampler(family: str, model) -> Tuple:
    """(fn, example_inputs) for the family's generator-side serving entry.

    ``fn(params, key, *inputs) -> images`` is pure (no global state); the
    export binds ``params`` as baked-in constants.
    """
    cfg = model.cfg
    n = cfg.batch_size
    if family == "gan_inference":
        def fn(params, key, noise):
            return registry.apply(lambda: model.sample(noise), params, key)
        example = (jnp.zeros((n, cfg.dim_latent), jnp.float32),)
    elif family == "gmgan":
        def fn(params, key, k_onehot, noise):
            return registry.apply(lambda: model.sample(k_onehot, noise),
                                  params, key)
        example = (jnp.zeros((n, cfg.n_coms), jnp.float32),
                   jnp.zeros((n, cfg.dim_latent), jnp.float32))
    elif family == "ssgan":
        def fn(params, key, z_l_0, z_g, *labels):
            return registry.apply(
                lambda: model.sample(z_l_0, z_g,
                                     labels[0] if labels else None),
                params, key)
        example = (jnp.zeros((n, cfg.dim_latent_l), jnp.float32),
                   jnp.zeros((n, cfg.dim_latent_g), jnp.float32))
        if cfg.conditional:
            example += (jnp.zeros((n, cfg.n_classes), jnp.float32),)
    else:
        raise ValueError(f"unknown family {family!r}")
    return fn, example


#: deployable entries per family; "sampler" is the generator side, the rest
#: deploy the INFERENCE networks — the reference repo's actual subject
#: (joint (x, z) discrimination trains the Extractor so it can be *used*:
#: representation extraction, clustering, reconstruction).
ENTRIES = {
    "gan_inference": ("sampler", "encoder", "reconstructor"),
    "gmgan": ("sampler", "encoder", "cluster", "reconstructor"),
    "ssgan": ("sampler", "reconstructor"),
}

#: what the entry's single output array is, for the manifest
ENTRY_OUTPUT = {"sampler": "images", "reconstructor": "images",
                "encoder": "latents", "cluster": "probs"}


def make_entry(family: str, model, entry: str = "sampler") -> Tuple:
    """(fn, example_inputs, input_kinds) for a family's serving entry.

    ``entry="sampler"`` is the generator path (``make_sampler``); the image
    entries take RAW-space data exactly as the dataset loaders yield it
    (the model's ``normalize`` runs inside the entry):

    - ``encoder``        x -> q_z            (``gan_inference_mnist.py:258``)
    - ``cluster``        x -> q(k|x) probs   (``gmgan_inference_mnist.py:513-531``)
    - ``reconstructor``  x -> G(E(x))        (``gan_inference_cifar10.py:400-404``)

    ``input_kinds`` entries are ``"normal"`` / ``"onehot"`` (server can draw
    them from a seed) or ``"image"`` (client must supply the array).
    """
    cfg = model.cfg
    n = cfg.batch_size
    if entry not in ENTRIES.get(family, ()):
        raise ValueError(
            f"family {family!r} has no entry {entry!r}; "
            f"choose from {ENTRIES.get(family, ())}")
    if entry == "sampler":
        fn, example = make_sampler(family, model)
        return fn, example, _input_kinds(family, cfg)

    if family == "ssgan":  # reconstructor only (ENTRIES gates the rest)
        x_ex = jnp.zeros((n, cfg.seq_len, cfg.output_dim), jnp.float32)

        def fn(params, key, raw_x, *labels):
            return registry.apply(
                lambda: model.reconstruct(raw_x,
                                          labels[0] if labels else None),
                params, key)
        example = (x_ex,)
        kinds = ["image"]
        if cfg.conditional:
            example += (jnp.zeros((n, cfg.n_classes), jnp.float32),)
            kinds.append("onehot")
        return fn, example, kinds

    method = {"encoder": model.encode, "reconstructor": model.reconstruct,
              "cluster": getattr(model, "cluster_probs", None)}[entry]

    def fn(params, key, raw_x):
        return registry.apply(lambda: method(raw_x), params, key)
    example = (jnp.zeros((n, cfg.data.output_dim), jnp.float32),)
    return fn, example, ["image"]


def _input_kinds(family: str, cfg):
    from graphical_gan_tpu.serve.server import input_kinds
    return input_kinds(family, cfg)


def _arg_specs(example, symbolic: bool):
    """ShapeDtypeStructs for the sampler inputs, batch dim symbolic if asked."""
    if not symbolic:
        return [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in example]
    (b,) = jax_export.symbolic_shape("b")
    return [jax.ShapeDtypeStruct((b,) + a.shape[1:], a.dtype)
            for a in example]


def export_sampler(run_dir: str, ckpt: Optional[str] = None,
                   out: Optional[str] = None,
                   platforms: Sequence[str] = ("tpu", "cpu"),
                   symbolic_batch: bool = True,
                   quantize: Optional[str] = None,
                   calib_batches: int = 4, calib_seed: int = 0,
                   entry: str = "sampler") -> dict:
    """Export a run directory's trained serving entry to an artifact.

    ``entry`` selects what to deploy (``ENTRIES``): the generator sampler
    (default) or the inference-side ``encoder`` / ``cluster`` /
    ``reconstructor``.  Non-sampler artifacts land in
    ``<run_dir>/export_<entry>/`` so a run dir can carry one of each.

    ``quantize="int8"`` calibrates activation scales on prior-distributed
    latents (``serve/quantize.py``) and bakes the int8 conv/deconv/matmul
    path (``ops/quant.py``) into the exported program; weights quantize
    per-output-channel at trace time and XLA folds them to int8 constants.
    Sampler-only: the image entries' activations are data-distributed, and
    no calibration data ships with a run dir.
    """
    from graphical_gan_tpu.tools.generate import rebuild, restore_params
    from graphical_gan_tpu.train import checkpoint as ckpt_lib

    family, cfg, model = rebuild(run_dir)
    path = ckpt or ckpt_lib.latest(run_dir)
    if path is None:
        raise FileNotFoundError(f"no ckpt_*.npz under {run_dir}")
    params, extra = restore_params(model, path)

    fn, example, kinds = make_entry(family, model, entry)

    scales = None
    if quantize == "int8":
        if entry != "sampler":
            raise ValueError(
                "--quantize int8 calibrates on prior latents and applies "
                "to the sampler entry only")
        from graphical_gan_tpu.serve.quantize import calibrate
        scales = calibrate(family, model, params,
                           jax.random.PRNGKey(calib_seed),
                           n_batches=calib_batches)
    elif quantize not in (None, "none"):
        raise ValueError(f"unknown quantize mode {quantize!r}")

    def serving_fn(key, *inputs):
        return fn(params, key, *inputs)

    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    jitted = jax.jit(serving_fn)
    from contextlib import nullcontext
    from graphical_gan_tpu.ops import quant
    ctx = quant.quantized(scales) if scales is not None else nullcontext()
    with ctx:  # quantization only needs to be active during tracing
        exported = None
        used_symbolic = False
        if symbolic_batch:
            try:
                exported = jax_export.export(
                    jitted, platforms=list(platforms))(
                    key_spec, *_arg_specs(example, symbolic=True))
                used_symbolic = True
            except Exception:
                exported = None  # fall back to the fixed example batch
        if exported is None:
            exported = jax_export.export(jitted, platforms=list(platforms))(
                key_spec, *_arg_specs(example, symbolic=False))

    outf = out or os.path.join(
        run_dir, "export" if entry == "sampler" else f"export_{entry}")
    os.makedirs(outf, exist_ok=True)
    blob_path = os.path.join(outf, f"{entry}.jaxexport")
    with open(blob_path, "wb") as f:
        f.write(exported.serialize())
    if scales is not None:  # provenance for the quantized artifact
        quant.save_scales(os.path.join(outf, "act_scales.json"), scales)

    display = {"unit": "x", "unit_pm1": "(x+1)/2", "int_pm1": "(x+1)/2",
               "dequant": "(x+1)/2", "int256_pm1": "(x+1)/2"}
    norm = (cfg.data.normalization if hasattr(cfg, "data")
            else getattr(cfg, "normalization", "unit"))
    manifest = {
        "family": family,
        "entry": entry,
        "blob": os.path.basename(blob_path),
        "output": ENTRY_OUTPUT[entry],
        "iteration": int(extra.get("iteration", -1)),
        "checkpoint": os.path.basename(path),
        "platforms": list(platforms),
        "symbolic_batch": used_symbolic,
        "quantization": quantize or "none",
        "inputs": [{"shape": list(a.shape), "dtype": str(a.dtype),
                    "prior": kind}
                   for a, kind in zip(example, kinds)],
        "key": "jax.random.PRNGKey (uint32[2])",
        "output_to_display": display.get(norm, "x"),
    }
    man_path = os.path.join(outf, "manifest.json")
    with open(man_path, "w") as f:
        json.dump(manifest, f, indent=1)
    # full paths win over the manifest's basename "blob" field
    return {**manifest, "blob": blob_path, "manifest": man_path}


def load_sampler(blob_path: str):
    """Deserialize an exported sampler; returns ``call(key, *inputs)``.

    Pure ``jax.export`` — works in a process that never imports this
    framework (the artifact is self-contained).
    """
    with open(blob_path, "rb") as f:
        blob = f.read()
    return jax_export.deserialize(bytearray(blob)).call


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--fixed-batch", action="store_true",
                   help="export at the config batch size instead of a "
                        "symbolic batch dim")
    p.add_argument("--quantize", default=None, choices=["none", "int8"],
                   help="bake the int8 serving path into the artifact "
                        "(PTQ; activation scales calibrated on prior "
                        "latents — see serve/quantize.py)")
    p.add_argument("--calib-batches", type=int, default=4,
                   help="calibration batches for --quantize int8")
    p.add_argument("--entry", default="sampler",
                   choices=["sampler", "encoder", "cluster", "reconstructor"],
                   help="which serving entry to export: the generator "
                        "sampler or an inference-side network (see ENTRIES "
                        "for per-family availability)")
    args = p.parse_args(argv)
    info = export_sampler(args.run_dir, ckpt=args.ckpt, out=args.out,
                          platforms=tuple(args.platforms.split(",")),
                          symbolic_batch=not args.fixed_batch,
                          quantize=args.quantize,
                          calib_batches=args.calib_batches,
                          entry=args.entry)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
