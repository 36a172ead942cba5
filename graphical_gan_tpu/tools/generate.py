"""Generate eval artifacts from a saved checkpoint — no training step.

The reference creates a ``tf.train.Saver`` and writes one checkpoint at the
final iteration, but ships NO code that ever restores one
(``gan_inference_cifar10.py:415,498-499``; no ``saver.restore`` anywhere) —
inference-time reuse of a trained model is unimplemented there.  This tool
closes that gap for all three families: point it at a run directory and it
rebuilds the model from the run's own ``config.json``, restores the latest
(or a chosen) checkpoint, and emits the family's full artifact set through
the SAME eval hooks the trainer uses:

- family 1 (gan_inference): fixed-noise sample grid + interleaved
  reconstruction grid (``gan_inference_mnist.py:366-396``)
- family 2 (gmgan): per-component sample grid + reconstruction grid
  (``gmgan_inference_mnist.py:405-419``)
- family 3 (ssgan): sample / reconstruction / disentangle montages and
  animated GIFs (``ssgan_inference_moving_mnist.py:569-618``)

Usage:
    python -m graphical_gan_tpu.tools.generate --run-dir result/<run>/
    # options: --ckpt <file.npz>  --out <dir>  --data-dir <path>

Reconstruction (and ssgan's disentangle) need a data batch; loaders fall
back to synthetic data offline, and ``--no-data`` skips those artifacts.
"""

from __future__ import annotations

import argparse
import json
import os
from dataclasses import fields as dc_fields

import numpy as np
import jax

from graphical_gan_tpu.core import config as config_lib
from graphical_gan_tpu.train import checkpoint as ckpt_lib
from graphical_gan_tpu.train.step import make_train_step


class _Shim:
    """Minimal stand-in for the Trainer that eval hooks read from:
    ``trainer.params``, ``trainer.outf``, ``trainer.logger``,
    ``trainer.logfile`` (plus ``state.params`` for older callers)."""

    class _State:
        def __init__(self, params):
            self.params = params

    def __init__(self, params, outf):
        from graphical_gan_tpu.report.plot import MetricLogger
        self.params = params
        self.state = self._State(params)
        self.outf = outf
        self.logger = MetricLogger()
        self.logfile = os.path.join(outf, "generate_log.txt")


def detect_family(cfg_dict: dict) -> str:
    if "mode_k" in cfg_dict or "n_coms" in cfg_dict:
        return "gmgan"
    if "pos_mode" in cfg_dict or "ali_mode" in cfg_dict \
            or "seq_len" in cfg_dict:
        return "ssgan"
    return "gan_inference"


_FAMILIES = {
    "gan_inference": ("GanInferenceConfig", "graphical_gan_tpu.models."
                      "gan_inference", "GanInferenceModel"),
    "gmgan": ("GMGanConfig", "graphical_gan_tpu.models.gmgan", "GMGanModel"),
    "ssgan": ("SSGanConfig", "graphical_gan_tpu.models.ssgan", "SSGanModel"),
}


def rebuild(run_dir: str):
    """(family, cfg, model) from a run directory's config.json."""
    with open(os.path.join(run_dir, "config.json")) as f:
        cfg_dict = json.load(f)
    family = detect_family(cfg_dict)
    cls_name, mod_name, model_name = _FAMILIES[family]
    cfg_cls = getattr(config_lib, cls_name)
    names = {f.name for f in dc_fields(cfg_cls)}
    # config.json is the exact asdict of the config — reconstruct verbatim,
    # ignoring keys a newer/older config version doesn't know.  JSON turns
    # tuples (image_hw) into lists; restore tuples so the frozen config
    # hashes like the original.
    kw = {k: tuple(v) if isinstance(v, list) else v
          for k, v in cfg_dict.items() if k in names}
    cfg = cfg_cls(**kw)
    import importlib
    model = getattr(importlib.import_module(mod_name), model_name)(cfg)
    return family, cfg, model


def restore_params(model, ckpt_path: str):
    """(name-keyed params, extra) from any checkpoint the framework
    writes — the standard TrainState layout or a pipeline-parallel run's
    packed per-stage rows at ANY supported stage count
    (``parallel/pipeline.py: restore_pp_params``), in either the npz or
    the orbax format (``--checkpoint-backend``)."""
    from graphical_gan_tpu.parallel import pipeline as pp
    if ckpt_lib.is_orbax(ckpt_path):
        # orbax restores by structure (no raw keypath inspection): try the
        # standard layout first, fall back to the pp-packed ones
        _, init_state = make_train_step(model, jit=False)
        like = init_state(model.init(jax.random.PRNGKey(0)))
        try:
            state, extra = ckpt_lib.restore(ckpt_path, like)
            return state.params, extra
        except Exception:  # noqa: BLE001 — structure mismatch => pp layout
            return pp.restore_pp_params(model, ckpt_path)
    with np.load(ckpt_path, allow_pickle=False) as data:
        is_pp = "k:packed" in data.files
    if is_pp:
        return pp.restore_pp_params(model, ckpt_path)
    _, init_state = make_train_step(model, jit=False)
    like = init_state(model.init(jax.random.PRNGKey(0)))
    state, extra = ckpt_lib.restore(ckpt_path, like)
    return state.params, extra


def _dev_batch(family, cfg, data_dir):
    """One dev batch via the family's own loaders (synthetic fallback when
    offline, like training)."""
    if family == "gan_inference":
        from graphical_gan_tpu.runs.gan_inference import _loaders
    elif family == "gmgan":
        from graphical_gan_tpu.runs.gmgan import _loaders
    else:
        from graphical_gan_tpu.runs.ssgan import _loaders
    loaders = _loaders(cfg, data_dir)
    dev_gen = loaders[1]
    batch = next(iter(dev_gen()))
    if isinstance(batch, tuple):
        batch = batch[0]
    return batch


def generate(run_dir: str, ckpt: str = None, out: str = None,
             data_dir: str = None, with_data: bool = True) -> dict:
    family, cfg, model = rebuild(run_dir)
    path = ckpt or ckpt_lib.latest(run_dir)
    if path is None:
        raise FileNotFoundError(f"no ckpt_*.npz under {run_dir}")
    params, extra = restore_params(model, path)
    iteration = int(extra.get("iteration", -1))
    outf = out or os.path.join(run_dir, "generated")
    os.makedirs(outf, exist_ok=True)
    shim = _Shim(params, outf)

    batch = _dev_batch(family, cfg, data_dir) if with_data else None
    if family == "gan_inference":
        from graphical_gan_tpu.runs.gan_inference import make_eval_hooks
        make_eval_hooks(model, batch)(shim, iteration)
    elif family == "gmgan":
        from graphical_gan_tpu.runs.gmgan import (make_sample_hook,
                                                  make_recon_hook)
        make_sample_hook(model)(shim, iteration)
        if batch is not None:
            make_recon_hook(model, batch)(shim, iteration)
    else:
        from graphical_gan_tpu.runs.ssgan import make_eval_hook
        if batch is None:
            raise ValueError("ssgan artifacts need a dev batch "
                             "(drop --no-data)")
        make_eval_hook(model, batch)(shim, iteration)

    arts = sorted(os.listdir(outf))
    return {"family": family, "ckpt": path, "iteration": iteration,
            "outdir": outf, "artifacts": arts}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", required=True,
                   help="a trainer run directory (contains config.json and "
                        "ckpt_*.npz)")
    p.add_argument("--ckpt", default=None,
                   help="explicit checkpoint file (default: latest in "
                        "--run-dir)")
    p.add_argument("--out", default=None,
                   help="artifact directory (default: <run-dir>/generated)")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--no-data", action="store_true",
                   help="skip artifacts that need a data batch "
                        "(reconstruction/disentangle)")
    args = p.parse_args(argv)
    info = generate(args.run_dir, ckpt=args.ckpt, out=args.out,
                    data_dir=args.data_dir, with_data=not args.no_data)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
