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


def test_export_inference_entries(tmp_path):
    """encoder / reconstructor entries: the deployed INFERENCE networks
    (``serve/export.ENTRIES``) equal the in-framework forwards on raw-space
    data.  svhn/ali: bn off + TYPE_Q no_std -> deterministic, so equality
    is assertable row-for-row."""
    from graphical_gan_tpu.core.config import gan_inference_defaults
    from graphical_gan_tpu.models.gan_inference import GanInferenceModel
    from graphical_gan_tpu.serve.export import export_sampler as export_entry

    cfg = gan_inference_defaults("svhn", "ali", dim=8, batch_size=8)
    model = GanInferenceModel(cfg)
    run_dir, state = _run_dir(tmp_path, cfg, model, "inf_run")

    key = jax.random.PRNGKey(3)
    for entry, method, out_kind in (("encoder", model.encode, "latents"),
                                    ("reconstructor", model.reconstruct,
                                     "images")):
        info = export_entry(run_dir, platforms=("cpu",), entry=entry)
        assert info["entry"] == entry
        assert info["output"] == out_kind
        assert info["inputs"][0]["prior"] == "image"
        assert os.path.basename(info["blob"]) == f"{entry}.jaxexport"
        assert f"export_{entry}" in info["blob"]  # no sampler collision

        call = load_sampler(info["blob"])
        n = 3 if info["symbolic_batch"] else cfg.batch_size
        raw = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, size=(n, cfg.data.output_dim)), jnp.float32)
        served = np.asarray(call(key, raw))
        direct = np.asarray(registry.apply(lambda: method(raw),
                                           state.params, key))
        np.testing.assert_allclose(served, direct, atol=1e-5)
    assert (np.asarray(load_sampler(os.path.join(
        str(tmp_path / "inf_run"), "export_encoder", "encoder.jaxexport"))(
        key, jnp.zeros((2, cfg.data.output_dim)))).shape[1]
        == cfg.dim_latent)

    # int8 PTQ calibrates on prior latents -> sampler-only, stated up front
    import pytest
    with pytest.raises(ValueError, match="sampler entry only"):
        export_entry(run_dir, platforms=("cpu",), entry="encoder",
                     quantize="int8")


def test_export_gmgan_cluster_entry(tmp_path):
    """x -> q(k|x): the clustering-accuracy posterior
    (``gmgan_inference_mnist.py:513-531``) as a deployable artifact."""
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel
    from graphical_gan_tpu.serve.export import export_sampler as export_entry

    cfg = gmgan_defaults("svhn", "ali", dim=8, batch_size=8, n_coms=5)
    model = GMGanModel(cfg)
    run_dir, state = _run_dir(tmp_path, cfg, model, "gm_cluster")
    info = export_entry(run_dir, platforms=("cpu",), entry="cluster")
    assert info["output"] == "probs"
    call = load_sampler(info["blob"])
    n = 4 if info["symbolic_batch"] else cfg.batch_size
    raw = jnp.asarray(np.random.RandomState(1).randint(
        0, 256, size=(n, cfg.data.output_dim)), jnp.float32)
    key = jax.random.PRNGKey(0)
    probs = np.asarray(call(key, raw))
    assert probs.shape == (n, cfg.n_coms)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    direct = np.asarray(registry.apply(lambda: model.cluster_probs(raw),
                                       state.params, key))
    np.testing.assert_allclose(probs, direct, atol=1e-5)


def test_export_ssgan_reconstructor_entry(tmp_path):
    """Video reconstruction G(E(x)) with conditional labels: inputs are
    (raw video, onehot) — manifest kinds ["image", "onehot"]."""
    from graphical_gan_tpu.core.config import ssgan_defaults
    from graphical_gan_tpu.models.ssgan import SSGanModel
    from graphical_gan_tpu.serve.export import export_sampler as export_entry

    cfg = ssgan_defaults("moving_mnist", "local_ep", dim=8, dim_op=16,
                         batch_size=4, seq_len=4)
    model = SSGanModel(cfg)
    run_dir, state = _run_dir(tmp_path, cfg, model, "ss_rec")
    info = export_entry(run_dir, platforms=("cpu",), entry="reconstructor")
    assert [i["prior"] for i in info["inputs"]] == ["image", "onehot"]
    call = load_sampler(info["blob"])
    n = 2 if info["symbolic_batch"] else cfg.batch_size
    rng = np.random.RandomState(2)
    raw = jnp.asarray(rng.rand(n, cfg.seq_len, cfg.output_dim), jnp.float32)
    y = jnp.asarray(np.eye(cfg.n_classes, dtype="float32")[
        rng.randint(0, cfg.n_classes, size=n)])
    key = jax.random.PRNGKey(0)
    out = np.asarray(call(key, raw, y))
    assert out.shape[0] == n and np.isfinite(out).all()
    direct = np.asarray(registry.apply(lambda: model.reconstruct(raw, y),
                                       state.params, key))
    np.testing.assert_allclose(out, direct, atol=1e-5)


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
