"""Production Trainer under TP / SP meshes (not just bare steps).

The step-level factories are equality-tested in test_tensor_parallel /
test_sequence_parallel; here the TRAINER drives them: host-fed TP matches
the single-device trainer run exactly (same seed -> same KeyStream), and
the ssgan resident hot loop compiles and runs under a data x seq mesh.
"""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from graphical_gan_tpu.core.config import (gan_inference_defaults,
                                           ssgan_defaults)
from graphical_gan_tpu.models.gan_inference import GanInferenceModel
from graphical_gan_tpu.models.ssgan import SSGanModel
from graphical_gan_tpu.train.trainer import Trainer


def _gen_factory(cfg, n_batches=4, seed=0):
    rng = np.random.RandomState(seed)
    data = rng.rand(n_batches, cfg.batch_size,
                    cfg.data.output_dim).astype("float32")

    def get_epoch():
        for i in range(n_batches):
            yield data[i]

    return get_epoch


def test_trainer_tp_matches_single_device(tmp_path):
    cfg = gan_inference_defaults("cifar10", "ali", dim=16, batch_size=8)
    model = GanInferenceModel(cfg)
    gen = _gen_factory(cfg)

    t1 = Trainer(model, gen, outf=str(tmp_path / "single"), seed=3,
                 checkpoint_every=0)
    t1.train(iters=3, resume=False)

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    t2 = Trainer(model, gen, outf=str(tmp_path / "tp"), seed=3,
                 checkpoint_every=0, mesh=mesh, parallel="tp")
    t2.train(iters=3, resume=False)

    # TP placement actually sharded something
    sharded = [n for n, p in t2.state.params.items()
               if not p.sharding.is_fully_replicated]
    assert sharded
    for n in t1.state.params:
        np.testing.assert_allclose(
            np.asarray(t1.state.params[n]), np.asarray(t2.state.params[n]),
            atol=3e-4, err_msg=n)


@pytest.mark.slow
def test_trainer_ep_matches_single_device(tmp_path):
    """Trainer-level expert parallelism (gmgan, data x expert mesh):
    host-fed EP matches the single-device trainer exactly and the mixture
    means really end up sharded."""
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel

    cfg = gmgan_defaults("mnist", "local_ep", dim=16, batch_size=8, n_coms=8)
    model = GMGanModel(cfg)
    gen = _gen_factory(cfg)

    t1 = Trainer(model, gen, outf=str(tmp_path / "single"), seed=3,
                 checkpoint_every=0)
    t1.train(iters=3, resume=False)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "expert"))
    t2 = Trainer(model, gen, outf=str(tmp_path / "ep"), seed=3,
                 checkpoint_every=0, mesh=mesh, parallel="ep")
    t2.train(iters=3, resume=False)

    assert not t2.state.params[
        "Generator.Hyper.Mu"].sharding.is_fully_replicated
    # 3 steps of drift: the sharded component softmax/psum reorder f32
    # reductions, so allow slightly more than the 1-step bare-step test
    for n in t1.state.params:
        np.testing.assert_allclose(
            np.asarray(t1.state.params[n]), np.asarray(t2.state.params[n]),
            atol=6e-4, err_msg=n)


@pytest.mark.slow
def test_trainer_ep_resident_hot_loop(tmp_path):
    """The gmgan resident scanned chunk compiles and runs under the
    data x expert mesh with the component fold constraints active."""
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel

    cfg = gmgan_defaults("mnist", "local_ep", dim=16, batch_size=8, n_coms=8)
    model = GMGanModel(cfg)
    rng = np.random.RandomState(0)
    resident = rng.rand(32, cfg.data.output_dim).astype("float32")

    def gen():
        yield resident[:cfg.batch_size]

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "expert"))
    tr = Trainer(model, gen, outf=str(tmp_path / "ep_res"), seed=0,
                 checkpoint_every=0, mesh=mesh, parallel="ep",
                 resident_data=resident, chunk_size=2)
    m = tr.train(iters=4, resume=False)
    assert np.isfinite(m["gen_cost"])
    assert int(tr.state.step) == 4


@pytest.mark.slow
def test_trainer_sp_resident_hot_loop(tmp_path):
    cfg = ssgan_defaults("moving_mnist", "local_ep", dim=8, dim_op=16,
                         batch_size=8, seq_len=4)
    model = SSGanModel(cfg)
    rng = np.random.RandomState(0)
    n = 32
    resident = {
        "x": rng.rand(n, cfg.seq_len, cfg.output_dim).astype("float32"),
        "y": np.eye(cfg.n_classes, dtype=np.float32)[
            rng.randint(0, cfg.n_classes, size=n)],
    }

    def gen():
        yield {"x": resident["x"][:cfg.batch_size],
               "y": resident["y"][:cfg.batch_size]}

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    tr = Trainer(model, gen, outf=str(tmp_path / "sp"), seed=0,
                 checkpoint_every=0, mesh=mesh, parallel="sp",
                 resident_data=resident, chunk_size=2)
    m = tr.train(iters=4, resume=False)
    assert np.isfinite(m["gen_cost"])
    assert int(tr.state.step) == 4


@pytest.mark.slow
def test_trainer_pp_matches_bare_step_loop(tmp_path):
    """Trainer-level pipeline parallelism (family-1 ali, 2-stage 'stage'
    mesh): the host-fed Trainer drives make_pp_train_step exactly as a
    hand-rolled loop of the bare pipeline step (same KeyStream seed, same
    batch order), the packed state really is stage-sharded, and
    checkpoint/resume round-trips the pp state dict."""
    from graphical_gan_tpu.core.rng import KeyStream
    from graphical_gan_tpu.parallel.pipeline import make_pp_train_step

    cfg = gan_inference_defaults("cifar10", "ali", dim=16, batch_size=8)
    model = GanInferenceModel(cfg)
    gen = _gen_factory(cfg)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))

    tr = Trainer(model, gen, outf=str(tmp_path / "pp"), seed=3,
                 checkpoint_every=2, mesh=mesh, parallel="pp")
    tr.train(iters=3, resume=False)

    assert not tr.state["packed"].sharding.is_fully_replicated

    # hand-rolled loop: replicate the Trainer's key discipline (init, then
    # one key per iteration) and its (1+k)-batch stacking
    ks = KeyStream(3)
    params = model.init(ks.next())
    step, init_state, place, read = make_pp_train_step(
        model, mesh, critic_iters=cfg.critic_iters)
    state = place(init_state(params))
    it = iter([b for _ in range(3) for b in gen()])
    import jax.numpy as jnp
    for i in range(3):
        raw = jnp.asarray(np.stack(
            [next(it) for _ in range(1 + cfg.critic_iters)]))
        state, _ = step(state, raw, ks.next(), jnp.asarray(i > 0))

    want, got = read(state), tr.state and read(tr.state)
    for n in want:
        np.testing.assert_allclose(np.asarray(want[n]), np.asarray(got[n]),
                                   atol=1e-6, err_msg=n)

    # resume from the checkpoint the run wrote and continue two more iters
    tr2 = Trainer(model, gen, outf=str(tmp_path / "pp"), seed=3,
                  checkpoint_every=0, mesh=mesh, parallel="pp")
    m = tr2.train(iters=5, resume=True)
    assert tr2._start_iter == 3
    assert np.isfinite(m["gen_cost"])
    assert int(tr2.state["step"]) == 5


@pytest.mark.slow
def test_trainer_pp_resident_hot_loop(tmp_path):
    """The resident scanned chunk traces the pipeline step (shard_map
    schedule inside lax.scan) under the 'stage' mesh."""
    cfg = gan_inference_defaults("cifar10", "ali", dim=16, batch_size=8)
    model = GanInferenceModel(cfg)
    rng = np.random.RandomState(0)
    resident = rng.rand(32, cfg.data.output_dim).astype("float32")

    def gen():
        yield resident[:cfg.batch_size]

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))
    tr = Trainer(model, gen, outf=str(tmp_path / "pp_res"), seed=0,
                 checkpoint_every=0, mesh=mesh, parallel="pp",
                 resident_data=resident, chunk_size=2)
    m = tr.train(iters=4, resume=False)
    assert np.isfinite(m["gen_cost"])
    assert int(tr.state["step"]) == 4


@pytest.mark.slow
def test_entrypoint_pp_end_to_end(tmp_path):
    """The real CLI path (runs.gan_inference.run) trains under
    --parallel pp: default 2-stage mesh, eval hooks recover params from
    the packed pp state (trainer.params), checkpoints written."""
    import os
    from graphical_gan_tpu.runs.gan_inference import run

    trainer, metrics = run(
        "cifar10", "ali", iters=4, outdir=str(tmp_path), dim=8,
        batch_size=8, checkpoint_every=3, sample_every=2,
        parallel="pp")
    assert np.isfinite(metrics["gen_cost"])
    files = os.listdir(trainer.outf)
    assert any("samples" in f for f in files)
    assert "ckpt_3.npz" in files
    assert int(trainer.state["step"]) == 4
