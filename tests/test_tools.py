"""CLI tools: score_samples and train_classifier, end to end (slow)."""

import glob
import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_train_classifier_and_score_samples_pipeline(tmp_path, capsys):
    import jax
    from graphical_gan_tpu.runs.gan_inference import run
    from graphical_gan_tpu.tools.train_classifier import main as train_main
    from graphical_gan_tpu.tools.score_samples import main as score_main

    # 1) a tiny generator checkpoint
    trainer, _ = run("mnist", "ali", iters=3, outdir=str(tmp_path), dim=8,
                     batch_size=8, checkpoint_every=2, tsne_every=0)
    ckpt = sorted(glob.glob(trainer.outf + "/ckpt_*.npz"))[-1]

    # 2) a tiny metric classifier
    clf_path = str(tmp_path / "clf.npz")
    train_main(["--dataset", "mnist", "--steps", "15", "--batch-size", "32",
                "--dim", "8", "--out", clf_path])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    meta = json.loads(out)
    assert meta["out"] == clf_path and 0.0 <= meta["test_accuracy"] <= 1.0

    # 3) score the generator with that classifier
    score_main(["--ckpt", ckpt, "--dataset", "mnist", "--mode", "ali",
                "--dim", "8", "--n-samples", "150", "--splits", "3",
                "--classifier", "jax", "--classifier-ckpt", clf_path,
                "--classifier-dim", "8"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["n_samples"] == 150
    assert np.isfinite(result["inception_score"])
    assert result["inception_score"] >= 1.0 - 1e-6
    assert "jax-metric-classifier" in result["classifier"]

    # 4) the int8 serving path scores through the same instrument
    score_main(["--ckpt", ckpt, "--dataset", "mnist", "--mode", "ali",
                "--dim", "8", "--n-samples", "150", "--splits", "3",
                "--classifier", "jax", "--classifier-ckpt", clf_path,
                "--classifier-dim", "8", "--quantize", "int8"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result_q = json.loads(out)
    assert result_q["quantize"] == "int8"
    assert np.isfinite(result_q["inception_score"])
    assert result_q["inception_score"] >= 1.0 - 1e-6


def test_corrupt_checkpoint_raises_cleanly(tmp_path):
    from graphical_gan_tpu.train import checkpoint
    bad = str(tmp_path / "ckpt_3.npz")
    with open(bad, "wb") as f:
        f.write(b"not a checkpoint at all")
    with pytest.raises(Exception):
        checkpoint.restore(bad, {"a": np.zeros(2)})
    # latest() still finds it by name; restore is what validates content
    assert checkpoint.latest(str(tmp_path)).endswith("ckpt_3.npz")


@pytest.mark.slow
def test_mfu_flop_counting():
    """XLA cost-analysis FLOP counting for the fused step: positive, and
    scales roughly linearly with batch size (conv/matmul-dominated)."""
    from graphical_gan_tpu.tools.mfu import flops_per_iter

    f8 = flops_per_iter("float32", dim=8, batch_size=8)
    f16 = flops_per_iter("float32", dim=8, batch_size=16)
    assert f8 > 1e6
    assert 1.5 < f16 / f8 < 2.5


@pytest.mark.slow
def test_bench_families_measure_tiny():
    """The per-family throughput harness runs end to end at a tiny config
    (machinery test; real numbers come from the TPU run in BASELINE.md)."""
    from graphical_gan_tpu.tools import bench_families as bf
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel

    old = bf.CHUNK, bf.N_CHUNKS, bf.ROUNDS
    bf.CHUNK, bf.N_CHUNKS, bf.ROUNDS = 2, 1, 1
    try:
        cfg = gmgan_defaults("cifar10", "local_ep", dim=8, batch_size=8)
        resident = np.random.RandomState(0).randint(
            0, 256, size=(64, cfg.data.output_dim)).astype(np.int32)
        ips, spi = bf._measure(GMGanModel(cfg), cfg, resident)
        assert np.isfinite(ips) and ips > 0 and spi > 0
    finally:
        bf.CHUNK, bf.N_CHUNKS, bf.ROUNDS = old
