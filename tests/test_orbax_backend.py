"""Orbax checkpoint backend, reachable from production.

``Trainer(checkpoint_backend="orbax")`` (CLI: ``--checkpoint-backend``)
writes ``ckpt_<step>.orbax`` directories instead of npz files; resume,
rollback, GC and elastic migration dispatch on the artifact itself
(``train/checkpoint.py: is_orbax``), so both formats coexist in one run
dir and a run may switch backends between restarts.  The npz format stays
the default (single-host atomic file + the raw-keypath inspection the
pp<->standard migration uses); orbax is the sharded/multi-host story —
each shard written by its owning process, restore resharded by the
``like`` placement (the 2-process save lives in test_multihost.py).

Reference counterpart: none — tflib saved once at end of run and never
restored (``gan_inference_cifar10.py:415,498-499``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from graphical_gan_tpu.core.config import gan_inference_defaults
from graphical_gan_tpu.models.gan_inference import GanInferenceModel
from graphical_gan_tpu.train import checkpoint
from graphical_gan_tpu.train.trainer import Trainer


def _model(**over):
    over.setdefault("dim", 16)
    over.setdefault("batch_size", 8)
    cfg = gan_inference_defaults("cifar10", "ali", **over)
    return GanInferenceModel(cfg)


def _resident(cfg, n=64, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(n, cfg.data.output_dim).astype("float32")


# -- format-dispatch unit layer ------------------------------------------------

def test_mixed_formats_in_one_dir(tmp_path):
    state = {"a": jnp.arange(4.0)}
    checkpoint.save(str(tmp_path / "ckpt_1.npz"), state)
    checkpoint.save(str(tmp_path / "ckpt_2.orbax"), state,
                    extra={"iteration": 2})
    steps = [s for s, _ in checkpoint.list_checkpoints(str(tmp_path))]
    assert steps == [1, 2]
    assert checkpoint.latest(str(tmp_path)).endswith("ckpt_2.orbax")
    st, extra = checkpoint.restore(checkpoint.latest(str(tmp_path)),
                                   {"a": jnp.zeros(4)})
    assert extra["iteration"] == 2
    np.testing.assert_array_equal(np.asarray(st["a"]), np.arange(4.0))


def test_remove_handles_both_formats(tmp_path):
    state = {"a": jnp.ones(2)}
    p1 = checkpoint.save(str(tmp_path / "ckpt_1.npz"), state)
    p2 = checkpoint.save(str(tmp_path / "ckpt_2.orbax"), state,
                         extra={"iteration": 2})
    checkpoint.remove(p1)
    checkpoint.remove(p2)
    assert checkpoint.list_checkpoints(str(tmp_path)) == []
    assert not (tmp_path / "ckpt_2.orbax.extra.json").exists()


def test_load_raw_rejects_orbax(tmp_path):
    p = checkpoint.save(str(tmp_path / "ckpt_1.orbax"), {"a": jnp.ones(2)})
    with pytest.raises(ValueError, match="orbax"):
        checkpoint.load_raw(p)


# -- production Trainer paths --------------------------------------------------

def test_trainer_orbax_resume_matches_uninterrupted(tmp_path):
    """orbax-backed save/resume continues a run exactly (resident mode is
    bit-deterministic in the KeyStream position)."""
    model = _model()
    data = _resident(model.cfg)

    t_ref = Trainer(model, lambda: iter(()), outf=str(tmp_path / "ref"),
                    seed=3, checkpoint_every=2, resident_data=data)
    t_ref.train(iters=6, resume=False)

    t1 = Trainer(model, lambda: iter(()), outf=str(tmp_path / "run"),
                 seed=3, checkpoint_every=2, resident_data=data,
                 checkpoint_backend="orbax")
    t1.train(iters=4, resume=False)
    assert checkpoint.latest(str(tmp_path / "run")).endswith("ckpt_3.orbax")

    t2 = Trainer(model, lambda: iter(()), outf=str(tmp_path / "run"),
                 seed=3, checkpoint_every=2, resident_data=data,
                 checkpoint_backend="orbax")
    t2.train(iters=6)
    assert t2._start_iter == 4
    for n in t_ref.state.params:
        np.testing.assert_array_equal(np.asarray(t_ref.state.params[n]),
                                      np.asarray(t2.state.params[n]),
                                      err_msg=n)


def test_trainer_orbax_gc_keeps_k(tmp_path):
    model = _model()
    data = _resident(model.cfg)
    t = Trainer(model, lambda: iter(()), outf=str(tmp_path / "run"),
                seed=0, checkpoint_every=1, checkpoints_to_keep=2,
                resident_data=data, checkpoint_backend="orbax")
    t.train(iters=5, resume=False)
    steps = [s for s, _ in checkpoint.list_checkpoints(str(tmp_path / "run"))]
    assert steps == [3, 4]
    leftovers = [f for f in (tmp_path / "run").iterdir()
                 if f.name.endswith(".extra.json")]
    assert {f.name for f in leftovers} == {"ckpt_3.orbax.extra.json",
                                           "ckpt_4.orbax.extra.json"}


@pytest.mark.slow
def test_trainer_orbax_sharded_tp_save_and_resume(tmp_path):
    """A TP 2x4 run checkpoints through orbax and resumes sharded: the
    restore `like` carries the TP placement, so each leaf comes back with
    its channel sharding (no host-side gather of the logical array)."""
    model = _model()
    data = _resident(model.cfg)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))

    t1 = Trainer(model, lambda: iter(()), outf=str(tmp_path / "run"),
                 seed=1, checkpoint_every=2, resident_data=data,
                 mesh=mesh, parallel="tp", checkpoint_backend="orbax")
    t1.train(iters=3, resume=False)

    # the final save (iteration 2) restores bit-exactly under the same
    # TP placement, leaves sharded
    t2 = Trainer(model, lambda: iter(()), outf=str(tmp_path / "run"),
                 seed=1, checkpoint_every=2, resident_data=data,
                 mesh=mesh, parallel="tp", checkpoint_backend="orbax")
    assert t2.try_resume()
    assert t2._start_iter == 3
    assert any(not p.sharding.is_fully_replicated
               for p in t2.state.params.values())
    for n in t1.state.params:
        np.testing.assert_array_equal(np.asarray(t1.state.params[n]),
                                      np.asarray(t2.state.params[n]),
                                      err_msg=n)
    # and training continues from it
    metrics = t2.train(iters=5)
    assert np.isfinite(metrics["disc_cost"])


def test_elastic_resume_orbax_single_to_tp(tmp_path):
    """An orbax checkpoint written single-device resumes under TP — the
    elastic-migration story through the orbax backend."""
    model = _model()
    data = _resident(model.cfg)

    t1 = Trainer(model, lambda: iter(()), outf=str(tmp_path / "run"),
                 seed=7, checkpoint_every=2, resident_data=data,
                 checkpoint_backend="orbax")
    t1.train(iters=3, resume=False)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
    t2 = Trainer(model, lambda: iter(()), outf=str(tmp_path / "run"),
                 seed=7, checkpoint_every=2, resident_data=data,
                 mesh=mesh, parallel="tp", checkpoint_backend="orbax")
    metrics = t2.train(iters=5)
    assert t2._start_iter == 3
    assert np.isfinite(metrics["disc_cost"])
    assert any(not p.sharding.is_fully_replicated
               for p in t2.state.params.values())


def test_trainer_async_checkpoint_orbax(tmp_path):
    """The async writer path composes with the orbax backend (the fetch +
    shard write run on the ordered background thread)."""
    model = _model()
    data = _resident(model.cfg)
    t = Trainer(model, lambda: iter(()), outf=str(tmp_path / "run"),
                seed=2, checkpoint_every=2, resident_data=data,
                checkpoint_backend="orbax", async_checkpoint=True)
    t.train(iters=4, resume=False)
    t2 = Trainer(model, lambda: iter(()), outf=str(tmp_path / "run"),
                 seed=2, checkpoint_every=2, resident_data=data,
                 checkpoint_backend="orbax")
    t2.train(iters=6)
    assert t2._start_iter == 4


def test_divergence_guard_rolls_back_through_orbax(tmp_path, monkeypatch):
    """The fault-injected NaN drill restores from an orbax checkpoint."""
    monkeypatch.setenv("GGAN_FAULT_NAN_AT", "3")
    model = _model()
    data = _resident(model.cfg)
    t = Trainer(model, lambda: iter(()), outf=str(tmp_path / "run"),
                seed=4, checkpoint_every=2, resident_data=data,
                checkpoint_backend="orbax", max_rollbacks=2)
    metrics = t.train(iters=6, resume=False)
    assert t._rollbacks == 1
    assert np.isfinite(metrics["disc_cost"])


def test_invalid_backend_rejected():
    model = _model()
    with pytest.raises(ValueError, match="checkpoint_backend"):
        Trainer(model, lambda: iter(()), outf="/tmp/never",
                checkpoint_backend="zarr")


def test_resume_standard_orbax_checkpoint_under_pp_and_back(tmp_path):
    """pp <-> standard elastic migration works through orbax too: the
    migration direction is fixed by the CURRENT strategy (orbax restores
    by structure, so no raw inspection is needed)."""
    model = _model()
    rng = np.random.RandomState(0)
    data = rng.rand(4, model.cfg.batch_size,
                    model.cfg.data.output_dim).astype("float32")

    def gen():
        for i in range(4):
            yield data[i]

    t1 = Trainer(model, gen, outf=str(tmp_path / "run"), seed=9,
                 checkpoint_every=2, checkpoint_backend="orbax")
    t1.train(iters=3, resume=False)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))
    t2 = Trainer(model, gen, outf=str(tmp_path / "run"), seed=9,
                 checkpoint_every=2, mesh=mesh, parallel="pp",
                 checkpoint_backend="orbax")
    metrics = t2.train(iters=5)               # standard orbax ckpt -> pp
    assert t2._start_iter == 3
    assert np.isfinite(metrics["disc_cost"])

    t3 = Trainer(model, gen, outf=str(tmp_path / "run"), seed=9,
                 checkpoint_every=2, checkpoint_backend="orbax")
    metrics = t3.train(iters=7)               # pp orbax ckpt -> standard
    assert t3._start_iter == 5
    assert np.isfinite(metrics["disc_cost"])


def test_generate_restore_params_from_orbax(tmp_path):
    """The serving/generate side reads orbax checkpoints too
    (tools/generate.restore_params dispatches on the artifact)."""
    from graphical_gan_tpu.tools.generate import restore_params
    from graphical_gan_tpu.train.step import make_train_step

    model = _model()
    _, init_state = make_train_step(model, jit=False)
    state = init_state(model.init(jax.random.PRNGKey(0)))
    path = checkpoint.save(str(tmp_path / "ckpt_7.orbax"), state,
                           extra={"iteration": 7})
    params, extra = restore_params(model, path)
    assert extra["iteration"] == 7
    name = next(iter(state.params))
    np.testing.assert_array_equal(np.asarray(params[name]),
                                  np.asarray(state.params[name]))


def test_interrupted_orbax_save_is_skipped(tmp_path):
    """A committed .orbax dir whose sidecar is missing (crash between the
    two-step write) must be invisible to listing/resume — never a
    KeyError at trainer resume time."""
    state = {"a": jnp.ones(3)}
    good = checkpoint.save(str(tmp_path / "ckpt_1.orbax"), state,
                           extra={"iteration": 1})
    bad = checkpoint.save(str(tmp_path / "ckpt_2.orbax"), state,
                          extra={"iteration": 2})
    import os
    os.unlink(bad + ".extra.json")        # simulate the crash window
    steps = [s for s, _ in checkpoint.list_checkpoints(str(tmp_path))]
    assert steps == [1]
    assert checkpoint.latest(str(tmp_path)) == good


def test_orbax_save_always_writes_sidecar(tmp_path):
    p = checkpoint.save(str(tmp_path / "ckpt_0.orbax"), {"a": jnp.ones(2)})
    import os
    assert os.path.exists(p + ".extra.json")   # even with no extra given
    assert [s for s, _ in checkpoint.list_checkpoints(str(tmp_path))] == [0]


def test_remove_tolerates_concurrent_deletion(tmp_path):
    p = checkpoint.save(str(tmp_path / "ckpt_1.npz"), {"a": jnp.ones(2)})
    checkpoint.remove(p)
    checkpoint.remove(p)                       # second GC racer: no crash
    q = checkpoint.save(str(tmp_path / "ckpt_2.orbax"), {"a": jnp.ones(2)},
                        extra={})
    checkpoint.remove(q)
    checkpoint.remove(q)
