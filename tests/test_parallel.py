"""Data-parallel training on the 8-device virtual CPU mesh:
DP step == single-device step (exact batch partitioning), and checkpoint
round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphical_gan_tpu.core.config import gan_inference_defaults
from graphical_gan_tpu.models.gan_inference import GanInferenceModel
from graphical_gan_tpu.parallel.mesh import (
    make_mesh, make_parallel_train_step, replicate, shard_batch,
)
from graphical_gan_tpu.train import checkpoint
from graphical_gan_tpu.train.step import make_train_step

KEY = jax.random.PRNGKey(0)


def make_model():
    cfg = gan_inference_defaults("mnist", "ali", dim=8, batch_size=16)
    return GanInferenceModel(cfg)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_dp_matches_single_device():
    model = make_model()
    cfg = model.cfg
    raw_np = np.random.RandomState(0).rand(
        2, cfg.batch_size, 784).astype("float32")
    key = jax.random.PRNGKey(5)

    # single device
    step1, init1 = make_train_step(model, donate=False)
    params = model.init(KEY)
    s1, m1 = step1(init1(params), jnp.asarray(raw_np), key, jnp.asarray(True))

    # 8-device DP
    mesh = make_mesh(8)
    stepN, initN, place = make_parallel_train_step(model, mesh, donate=False)
    params2 = model.init(KEY)
    state = place(initN(params2))
    raw = shard_batch(mesh, jnp.asarray(raw_np))
    sN, mN = stepN(state, raw, key, jnp.asarray(True))

    np.testing.assert_allclose(float(m1["gen_cost"]), float(mN["gen_cost"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m1["disc_cost"]), float(mN["disc_cost"]),
                               rtol=2e-4)
    # f32 psum reduction order differs from the single-device sum; Adam's
    # first step is ~sign(g)*lr, so near-zero grads may flip — allow up to
    # one update magnitude (lr=2e-4) of absolute difference.
    for n in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[n]), np.asarray(sN.params[n]),
            atol=2.5e-4, err_msg=n)


def test_dp_multi_step_stability():
    model = make_model()
    cfg = model.cfg
    mesh = make_mesh(8)
    step, init_state, place = make_parallel_train_step(model, mesh)
    state = place(init_state(model.init(KEY)))
    rng = np.random.RandomState(0)
    for i in range(3):
        raw = shard_batch(mesh, jnp.asarray(
            rng.rand(2, cfg.batch_size, 784).astype("float32")))
        state, m = step(state, raw, jax.random.PRNGKey(i), jnp.asarray(True))
    assert np.isfinite(float(m["gen_cost"]))
    assert np.isfinite(float(m["disc_cost"]))


def test_checkpoint_roundtrip(tmp_path):
    model = make_model()
    cfg = model.cfg
    step, init_state = make_train_step(model, donate=False)
    state = init_state(model.init(KEY))
    raw = jnp.asarray(np.random.RandomState(0).rand(
        2, cfg.batch_size, 784).astype("float32"))
    state, _ = step(state, raw, jax.random.PRNGKey(1), jnp.asarray(True))

    path = str(tmp_path / "ckpt_1.npz")
    checkpoint.save(path, state, extra={"iteration": 1, "rng_count": 7})

    like = init_state(model.init(jax.random.PRNGKey(9)))  # different values
    restored, extra = checkpoint.restore(path, like)
    assert extra == {"iteration": 1, "rng_count": 7}
    for n in state.params:
        np.testing.assert_array_equal(np.asarray(state.params[n]),
                                      np.asarray(restored.params[n]))
    # optimizer state round-trips too
    np.testing.assert_array_equal(
        np.asarray(state.gen_opt["m"]["Generator.Input.W"]),
        np.asarray(restored.gen_opt["m"]["Generator.Input.W"]))
    assert int(restored.step) == int(state.step)

    # training continues identically from the restored state
    s_a, m_a = step(state, raw, jax.random.PRNGKey(2), jnp.asarray(True))
    s_b, m_b = step(restored, raw, jax.random.PRNGKey(2), jnp.asarray(True))
    np.testing.assert_allclose(float(m_a["gen_cost"]), float(m_b["gen_cost"]),
                               rtol=1e-6)


def test_checkpoint_latest(tmp_path):
    assert checkpoint.latest(str(tmp_path)) is None
    state = {"a": jnp.ones((2,))}
    checkpoint.save(str(tmp_path / "ckpt_5.npz"), state)
    checkpoint.save(str(tmp_path / "ckpt_20.npz"), state)
    assert checkpoint.latest(str(tmp_path)).endswith("ckpt_20.npz")


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    path = str(tmp_path / "c.npz")
    checkpoint.save(path, {"a": jnp.ones((2,))})
    with pytest.raises(ValueError):
        checkpoint.restore(path, {"a": jnp.ones((3,))})


def test_orbax_checkpoint_roundtrip_with_sharded_state(tmp_path):
    """Orbax backend round-trips a TP-sharded train state with shardings."""
    from graphical_gan_tpu.train import checkpoint_orbax as co
    from graphical_gan_tpu.parallel.sharding_rules import (
        make_tp_train_step)
    from jax.sharding import Mesh

    cfg = gan_inference_defaults("celeba", "ali", dim=16, dim_g=16, dim_d=16,
                                 batch_size=8)
    model = GanInferenceModel(cfg)
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    step, init_state, place = make_tp_train_step(model, mesh, donate=False)
    state = place(init_state(model.init(KEY)))

    path = co.save(str(tmp_path / "ck"), state, extra={"iteration": 0})
    like = place(init_state(model.init(jax.random.PRNGKey(5))))
    restored, extra = co.restore(path, like)
    assert extra == {"iteration": 0}
    name = "Extractor.2.Filters"
    np.testing.assert_array_equal(np.asarray(restored.params[name]),
                                  np.asarray(state.params[name]))
    # restored array keeps the TP sharding of `like`
    assert not restored.params[name].sharding.is_fully_replicated


def test_epoch_batches_ondevice_without_replacement():
    from graphical_gan_tpu.data.ondevice import epoch_batches_ondevice
    data = jnp.arange(23 * 4).reshape(23, 4).astype(jnp.float32)
    ep = epoch_batches_ondevice(data, jax.random.PRNGKey(0), 5)
    assert ep.shape == (4, 5, 4)
    rows = np.asarray(ep).reshape(-1, 4)
    assert len({tuple(r) for r in rows}) == 20  # no repeats within an epoch
    # different key -> different order
    ep2 = epoch_batches_ondevice(data, jax.random.PRNGKey(1), 5)
    assert (np.asarray(ep) != np.asarray(ep2)).any()


def test_host_local_batches_single_process():
    from graphical_gan_tpu.parallel.input import host_local_batches
    mesh = make_mesh(8)
    local = {"x": np.ones((2, 16, 4), np.float32),
             "y": np.zeros((2, 16), np.float32)}
    g = host_local_batches(mesh, local)
    assert g["x"].shape == (2, 16, 4)
    assert not g["x"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(g["y"]), local["y"])


@pytest.mark.slow
def test_dp_matches_single_device_gmgan():
    """Family-2 (mixture prior, Gumbel k-sampling) DP step == single-device:
    the per-example RNG must be generated device-count-invariantly even for
    the discrete machinery."""
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel

    model = GMGanModel(gmgan_defaults("mnist", "local_ep", dim=8,
                                      batch_size=16, n_coms=6))
    cfg = model.cfg
    raw_np = np.random.RandomState(0).rand(
        2, cfg.batch_size, 784).astype("float32")
    key = jax.random.PRNGKey(5)

    step1, init1 = make_train_step(model, donate=False)
    s1, m1 = step1(init1(model.init(KEY)), jnp.asarray(raw_np), key,
                   jnp.asarray(True))

    mesh = make_mesh(8)
    stepN, initN, place = make_parallel_train_step(model, mesh, donate=False)
    sN, mN = stepN(place(initN(model.init(KEY))),
                   shard_batch(mesh, jnp.asarray(raw_np)), key,
                   jnp.asarray(True))

    np.testing.assert_allclose(float(m1["gen_cost"]), float(mN["gen_cost"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m1["disc_cost"]),
                               float(mN["disc_cost"]), rtol=2e-4)
    for n in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[n]), np.asarray(sN.params[n]),
            atol=2.5e-4, err_msg=n)


@pytest.mark.slow
def test_dp_matches_single_device_ssgan():
    """Family-3 (scan chains, weighted local_ep list) DP step ==
    single-device on the dict {'x','y'} batch pytree."""
    from graphical_gan_tpu.core.config import ssgan_defaults
    from graphical_gan_tpu.models.ssgan import SSGanModel

    model = SSGanModel(ssgan_defaults("moving_mnist", "local_ep", dim=8,
                                      dim_op=16, batch_size=16, seq_len=4))
    cfg = model.cfg
    rng = np.random.RandomState(0)
    raw_np = {
        "x": rng.rand(2, cfg.batch_size, cfg.seq_len,
                      cfg.output_dim).astype("float32"),
        "y": np.eye(cfg.n_classes, dtype=np.float32)[
            rng.randint(0, cfg.n_classes,
                        size=(2, cfg.batch_size))],
    }
    key = jax.random.PRNGKey(5)

    step1, init1 = make_train_step(model, donate=False)
    s1, m1 = step1(init1(model.init(KEY)),
                   jax.tree.map(jnp.asarray, raw_np), key, jnp.asarray(True))

    mesh = make_mesh(8)
    stepN, initN, place = make_parallel_train_step(model, mesh, donate=False)
    sN, mN = stepN(place(initN(model.init(KEY))),
                   shard_batch(mesh, jax.tree.map(jnp.asarray, raw_np)), key,
                   jnp.asarray(True))

    np.testing.assert_allclose(float(m1["gen_cost"]), float(mN["gen_cost"]),
                               rtol=5e-4)
    np.testing.assert_allclose(float(m1["disc_cost"]),
                               float(mN["disc_cost"]), rtol=5e-4)
    for n in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[n]), np.asarray(sN.params[n]),
            atol=2.5e-4, err_msg=n)
