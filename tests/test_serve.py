"""Serving export: jax.export artifact round-trip.

Exports a run directory's sampler to a self-contained StableHLO blob,
reloads it through pure ``jax.export`` (no framework objects), and checks
the served outputs equal the in-framework sampler — including at a batch
size different from the training config when the symbolic-batch export is
used.  Run dirs are constructed directly (config.json + one checkpoint)
rather than trained, to keep the test fast; the trained-run path is the
same ``tools/generate.rebuild`` machinery already covered by
``tests/test_generate.py``.
"""

import json
import os
from dataclasses import asdict

import numpy as np
import jax
import jax.numpy as jnp

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.serve.export import export_sampler, load_sampler
from graphical_gan_tpu.train import checkpoint as ckpt_lib
from graphical_gan_tpu.train.step import make_train_step

KEY = jax.random.PRNGKey(0)


def _run_dir(tmp_path, cfg, model, name):
    outf = tmp_path / name
    os.makedirs(outf, exist_ok=True)
    with open(outf / "config.json", "w") as f:
        json.dump(asdict(cfg), f, default=str)
    _, init_state = make_train_step(model, jit=False)
    state = init_state(model.init(KEY))
    ckpt_lib.save(str(outf / "ckpt_7.npz"), state, {"iteration": 7})
    return str(outf), state


def test_export_roundtrip_and_symbolic_batch(tmp_path):
    from graphical_gan_tpu.core.config import gan_inference_defaults
    from graphical_gan_tpu.models.gan_inference import GanInferenceModel

    cfg = gan_inference_defaults("mnist", "ali", dim=8, batch_size=8)
    model = GanInferenceModel(cfg)
    run_dir, state = _run_dir(tmp_path, cfg, model, "gan_run")

    # multi-platform artifact: lowered for the TPU serving fleet AND the
    # CPU canary; this test executes the cpu lowering
    info = export_sampler(run_dir, platforms=("tpu", "cpu"))
    assert os.path.exists(info["blob"])
    with open(info["manifest"]) as f:
        manifest = json.load(f)
    assert manifest["family"] == "gan_inference"
    assert manifest["iteration"] == 7
    assert manifest["platforms"] == ["tpu", "cpu"]

    call = load_sampler(info["blob"])
    key = jax.random.PRNGKey(0)

    # served == in-framework at the config batch
    noise = jnp.asarray(np.random.RandomState(0).randn(8, cfg.dim_latent),
                        jnp.float32)
    served = np.asarray(call(key, noise))
    direct = np.asarray(registry.apply(lambda: model.sample(noise),
                                       state.params, key))
    np.testing.assert_allclose(served, direct, atol=1e-5)

    if manifest["symbolic_batch"]:
        # one artifact serves other request sizes
        noise3 = jnp.asarray(np.random.RandomState(1).randn(3, cfg.dim_latent),
                             jnp.float32)
        out3 = np.asarray(call(key, noise3))
        assert out3.shape[0] == 3
        direct3 = np.asarray(registry.apply(lambda: model.sample(noise3),
                                            state.params, key))
        np.testing.assert_allclose(out3, direct3, atol=1e-5)


def test_export_gmgan(tmp_path):
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel

    cfg = gmgan_defaults("mnist", "local_ep", dim=8, batch_size=8, n_coms=5)
    model = GMGanModel(cfg)
    run_dir, _ = _run_dir(tmp_path, cfg, model, "gmgan_run")
    info = export_sampler(run_dir, platforms=("cpu",))
    call = load_sampler(info["blob"])
    n = 4 if info["symbolic_batch"] else cfg.batch_size
    k = jnp.asarray(np.eye(cfg.n_coms, dtype="float32")[
        np.random.RandomState(0).randint(0, cfg.n_coms, size=n)])
    noise = jnp.asarray(np.random.RandomState(1).randn(
        n, cfg.dim_latent), jnp.float32)
    out = np.asarray(call(jax.random.PRNGKey(0), k, noise))
    assert out.shape[0] == n and np.isfinite(out).all()


def test_export_ssgan(tmp_path):
    from graphical_gan_tpu.core.config import ssgan_defaults
    from graphical_gan_tpu.models.ssgan import SSGanModel

    cfg = ssgan_defaults("moving_mnist", "local_ep", dim=8, dim_op=16,
                         batch_size=4, seq_len=4)
    model = SSGanModel(cfg)
    run_dir, _ = _run_dir(tmp_path, cfg, model, "ssgan_run")
    info = export_sampler(run_dir, platforms=("cpu",))
    call = load_sampler(info["blob"])
    n = 2 if info["symbolic_batch"] else cfg.batch_size
    rng = np.random.RandomState(0)
    z_l = jnp.asarray(rng.randn(n, cfg.dim_latent_l), jnp.float32)
    z_g = jnp.asarray(rng.randn(n, cfg.dim_latent_g), jnp.float32)
    y = jnp.asarray(np.eye(cfg.n_classes, dtype="float32")[
        rng.randint(0, cfg.n_classes, size=n)])
    out = np.asarray(call(jax.random.PRNGKey(0), z_l, z_g, y))
    assert out.shape[0] == n and np.isfinite(out).all()
