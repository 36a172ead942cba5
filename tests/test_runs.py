"""End-to-end entrypoint smoke tests: every family's run() executes a few
iterations and produces the expected artifacts (marked slow)."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_gan_inference_run(tmp_path):
    from graphical_gan_tpu.runs.gan_inference import run
    trainer, metrics = run(
        "mnist", "alice", iters=6, outdir=str(tmp_path), dim=8, batch_size=8,
        checkpoint_every=4, sample_every=3, tsne_every=5)
    assert np.isfinite(metrics["gen_cost"])
    files = os.listdir(trainer.outf)
    assert any(f.startswith("alice_mnist_samples_") for f in files)
    assert any(f.startswith("alice_mnist_reconstruction_") for f in files)
    assert any(f.startswith("alice_mnist_manifold_") for f in files)
    assert "ckpt_5.npz" in files
    assert "config.json" in files and "logfile.txt" in files


@pytest.mark.slow
def test_gmgan_run(tmp_path):
    from graphical_gan_tpu.runs.gmgan import run
    trainer, metrics = run(
        "mnist", "local_ep", iters=4, outdir=str(tmp_path), dim=8,
        batch_size=8, n_coms=5, checkpoint_every=3, eval_every=2)
    assert np.isfinite(metrics["disc_cost"])
    files = os.listdir(trainer.outf)
    assert any("samples" in f for f in files)
    assert any("reconstruction" in f for f in files)
    # clustering accuracy logged at the eval cadence
    assert len(trainer.logger.history("testing accuracy")) >= 1


@pytest.mark.slow
def test_ssgan_run(tmp_path):
    from graphical_gan_tpu.runs.ssgan import run
    trainer, metrics = run(
        "moving_mnist", "local_ep", iters=3, outdir=str(tmp_path), dim=4,
        dim_op=16, batch_size=4, seq_len=4, checkpoint_every=2, eval_every=2)
    assert np.isfinite(metrics["disc_cost"])
    files = os.listdir(trainer.outf)
    assert any(f.startswith("samples_") and f.endswith(".gif")
               for f in files)
    assert any(f.startswith("disentangle_") for f in files)
    with open(trainer.logfile) as f:
        assert "Number of parameters in each player" in f.read()


@pytest.mark.slow
def test_alias_entrypoints_wire_dataset(tmp_path, monkeypatch):
    import graphical_gan_tpu.runs.gan_inference as gi

    captured = {}

    def fake_main(argv):
        captured["argv"] = argv

    monkeypatch.setattr(gi, "main", fake_main)
    import importlib
    import graphical_gan_tpu.runs.gan_inference_svhn as alias
    try:
        importlib.reload(alias)
        alias.main(["--mode", "ali"])
        assert captured["argv"][:2] == ["--dataset", "svhn"]
    finally:
        # re-reload AFTER monkeypatch scope so the module binds the real main
        monkeypatch.undo()
        importlib.reload(alias)


@pytest.mark.slow
def test_gan_inference_celeba_resident_uint8(tmp_path):
    """CelebA defaults to the resident pipeline with the dataset held as
    raw uint8 pixels (2.5 GB at full size); the model dequantizes on
    device, so training through the uint8 gather must work end to end."""
    from graphical_gan_tpu.runs.gan_inference import run
    trainer, metrics = run(
        "celeba", "ali", iters=4, outdir=str(tmp_path), dim_g=8, dim_d=8,
        batch_size=8, checkpoint_every=3, sample_every=3, tsne_every=0)
    assert trainer.resident_data is not None
    assert trainer.resident_data.dtype == np.uint8
    assert np.isfinite(metrics["gen_cost"])
    assert "ckpt_3.npz" in os.listdir(trainer.outf)


@pytest.mark.slow
def test_gmgan_celeba_resident_uint8(tmp_path):
    """gmgan's celeba path also defaults to the uint8-resident pipeline
    (mirrors runs/gan_inference; per-component sample grids still fire)."""
    from graphical_gan_tpu.runs.gmgan import run
    trainer, metrics = run(
        "celeba", "ali", iters=4, outdir=str(tmp_path), dim=8, dim_g=8,
        dim_d=8, batch_size=8, n_coms=5, checkpoint_every=3, eval_every=3)
    assert trainer.resident_data is not None
    assert trainer.resident_data.dtype == np.uint8
    assert np.isfinite(metrics["disc_cost"])


def test_cli_mains_forward_flags(monkeypatch):
    """argparse mains pass CLI flags through to run() for all three
    parameterized entrypoints (no training: run is stubbed)."""
    import graphical_gan_tpu.runs.gan_inference as gi
    import graphical_gan_tpu.runs.gmgan as gm
    import graphical_gan_tpu.runs.ssgan as ss

    calls = {}

    def fake(which):
        def run(dataset, mode, **kw):
            calls[which] = (dataset, mode, kw)
        return run

    monkeypatch.setattr(gi, "run", fake("gi"))
    monkeypatch.setattr(gm, "run", fake("gm"))
    monkeypatch.setattr(ss, "run", fake("ss"))

    gi.main(["--dataset", "cifar10", "--mode", "wali-gp", "--iters", "7",
             "--data-pipeline", "resident", "--compute-dtype", "bfloat16",
             "--accum-steps", "4", "--parallel", "tp",
             "--mesh-shape", "4,2"])
    ds, mode, kw = calls["gi"]
    assert (ds, mode) == ("cifar10", "wali-gp")
    assert kw["iters"] == 7 and kw["data_pipeline"] == "resident"
    assert kw["compute_dtype"] == "bfloat16"
    assert kw["accum_steps"] == 4
    assert kw["parallel"] == "tp" and kw["mesh_shape"] == "4,2"

    gi.main(["--dataset", "cifar10", "--mode", "ali", "--parallel", "pp"])
    _, _, kw = calls["gi"]
    assert kw["parallel"] == "pp" and kw["mesh_shape"] is None

    gm.main(["--dataset", "svhn", "--mode", "local_ep", "--n-coms", "7",
             "--accum-steps", "2", "--parallel", "ep",
             "--mesh-shape", "2,4"])
    ds, mode, kw = calls["gm"]
    assert (ds, mode) == ("svhn", "local_ep") and kw["n_coms"] == 7
    assert kw["accum_steps"] == 2
    assert kw["parallel"] == "ep" and kw["mesh_shape"] == "2,4"

    ss.main(["--dataset", "moving_mnist", "--mode", "local_ep",
             "--data-pipeline", "device", "--seq-len", "8",
             "--parallel", "sp", "--mesh-shape", "2,4"])
    ds, mode, kw = calls["ss"]
    assert (ds, mode) == ("moving_mnist", "local_ep")
    assert kw["data_pipeline"] == "device" and kw["seq_len"] == 8
    assert kw["parallel"] == "sp" and kw["mesh_shape"] == "2,4"
