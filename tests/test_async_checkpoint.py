"""Async checkpointing: the device->host fetch + npz write happen on an
ordered background thread (the hot loop only pays for an on-device copy),
with identical on-disk results and exact resume."""

import os

import numpy as np
import pytest

from graphical_gan_tpu.train import checkpoint as ckpt_lib

from tests.test_trainer import make_trainer


def _final_params(tr):
    return {n: np.asarray(p) for n, p in tr.params.items()}


@pytest.mark.slow
def test_async_run_matches_sync_run(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.rand(64, 784).astype("float32")
    t_sync = make_trainer(tmp_path / "sync", checkpoint_every=3,
                          resident_data=data)
    t_sync.train(iters=7, resume=False)
    t_async = make_trainer(tmp_path / "async", checkpoint_every=3,
                           resident_data=data, async_checkpoint=True)
    t_async.train(iters=7, resume=False)

    # identical training (the snapshot copy must not perturb the run) ...
    for n, p in _final_params(t_sync).items():
        np.testing.assert_array_equal(p, _final_params(t_async)[n],
                                      err_msg=n)
    # ... and identical checkpoint artifacts on disk
    names = sorted(os.listdir(tmp_path / "sync"))
    assert sorted(f for f in os.listdir(tmp_path / "async")
                  if f.startswith("ckpt_")) == \
        [f for f in names if f.startswith("ckpt_")]
    for f in names:
        if not f.startswith("ckpt_"):
            continue
        fa, ea = ckpt_lib.load_raw(str(tmp_path / "async" / f))
        fs, es = ckpt_lib.load_raw(str(tmp_path / "sync" / f))
        assert ea == es
        assert set(fa) == set(fs)
        for k in fa:
            np.testing.assert_array_equal(fa[k], fs[k], err_msg=f"{f}:{k}")


@pytest.mark.slow
def test_async_checkpoint_resume_mid_run(tmp_path):
    t1 = make_trainer(tmp_path, checkpoint_every=2, async_checkpoint=True)
    t1.train(iters=5, resume=False)
    t2 = make_trainer(tmp_path, checkpoint_every=2, async_checkpoint=True)
    metrics = t2.train(iters=9)
    assert t2._start_iter == 5
    assert int(t2.state.step) == 9
    assert np.isfinite(metrics["disc_cost"])


def test_async_writer_ordering_and_error_propagation(tmp_path):
    w = ckpt_lib.AsyncWriter()
    for i in range(3):
        w.submit(str(tmp_path / f"ckpt_{i}.npz"),
                 {"a": np.full(4, i, np.float32)}, {"iteration": i})
    w.join()
    assert ckpt_lib.latest(str(tmp_path)).endswith("ckpt_2.npz")
    for i in range(3):
        flat, extra = ckpt_lib.load_raw(str(tmp_path / f"ckpt_{i}.npz"))
        assert extra["iteration"] == i
        np.testing.assert_array_equal(flat["k:a"], np.full(4, i))

    def boom():
        raise RuntimeError("after hook failed")

    w.submit(str(tmp_path / "ckpt_3.npz"), {"a": np.zeros(1)}, {},
             after=boom)
    with pytest.raises(RuntimeError, match="after hook failed"):
        w.join()
    w.join()  # exception is raised once, then the writer is reusable


def test_env_var_enables_async(tmp_path, monkeypatch):
    monkeypatch.setenv("GGAN_ASYNC_CKPT", "1")
    tr = make_trainer(tmp_path)
    assert tr._ckpt_writer is not None
    monkeypatch.delenv("GGAN_ASYNC_CKPT")
    tr = make_trainer(tmp_path)
    assert tr._ckpt_writer is None
