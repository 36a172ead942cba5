"""Tensor-parallel (data x model) mesh: sharding rules, compile+run on the
virtual 8-device topology, numerical agreement with the unsharded step."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from graphical_gan_tpu.core.config import gan_inference_defaults
from graphical_gan_tpu.models.gan_inference import GanInferenceModel
from graphical_gan_tpu.parallel.sharding_rules import (
    make_tp_train_step, tp_param_shardings,
)
from graphical_gan_tpu.train.step import make_train_step

KEY = jax.random.PRNGKey(0)


def make_mesh_2d(data=2, model=4):
    devs = np.asarray(jax.devices()[:data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def make_model():
    cfg = gan_inference_defaults("celeba", "ali", dim=16, dim_g=16, dim_d=16,
                                 batch_size=8)
    return GanInferenceModel(cfg)


def test_sharding_rules_cover_channel_dims():
    model = make_model()
    params = model.init(KEY)
    mesh = make_mesh_2d()
    shardings = tp_param_shardings(params, mesh)
    # a forward conv kernel shards O (last dim)
    s = shardings["Extractor.2.Filters"].spec
    assert s == P(None, None, None, "model")
    # a transpose-conv kernel shards out (axis 2)
    s = shardings["Generator.2.Filters"].spec
    assert s == P(None, None, "model", None)
    # a dense kernel shards out
    s = shardings["Discriminator.z1.W"].spec
    assert s == P(None, "model")
    # tiny dims stay replicated (Generator.5 out-channels = 3)
    s = shardings["Generator.5.Filters"].spec
    assert s == P()
    # output-head dense (512 -> 1) replicated
    s = shardings["Discriminator.Output.W"].spec
    assert s == P()


def test_tp_step_runs_and_matches_unsharded():
    model = make_model()
    cfg = model.cfg
    raw_np = np.random.RandomState(0).randint(
        0, 256, size=(2, cfg.batch_size, cfg.data.output_dim)).astype("int32")
    key = jax.random.PRNGKey(3)

    step1, init1 = make_train_step(model, donate=False)
    s1, m1 = step1(init1(model.init(KEY)), jnp.asarray(raw_np), key,
                   jnp.asarray(True))

    mesh = make_mesh_2d()
    stepN, initN, place = make_tp_train_step(model, mesh, donate=False)
    state = place(initN(model.init(KEY)))
    sN, mN = stepN(state, jnp.asarray(raw_np), key, jnp.asarray(True))

    np.testing.assert_allclose(float(m1["gen_cost"]), float(mN["gen_cost"]),
                               rtol=5e-4)
    np.testing.assert_allclose(float(m1["disc_cost"]),
                               float(mN["disc_cost"]), rtol=5e-4)
    # params agree to within one first-step Adam update magnitude
    for n in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[n]), np.asarray(sN.params[n]),
            atol=2.5e-4, err_msg=n)
    # sharded params really are distributed
    sh = sN.params["Extractor.2.Filters"].sharding
    assert not sh.is_fully_replicated


def test_sharding_rules_gmgan_tree():
    """Family-2 param tree: the mixture means stay replicated by an EXPLICIT
    rule (not rule fall-through) and the MLP/conv stacks shard as usual."""
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel

    model = GMGanModel(gmgan_defaults("mnist", "local_ep", dim=16,
                                      batch_size=8, n_coms=8))
    params = model.init(KEY)
    mesh = make_mesh_2d()
    shardings = tp_param_shardings(params, mesh)
    assert shardings["Generator.Hyper.Mu"].spec == P()
    assert shardings["Discriminator.HyperInput.W"].spec == P(None, "model")
    assert shardings["Discriminator.Hyper2.W"].spec == P(None, "model")
    # data-layer forward conv shards O; head (512 -> 1) replicated
    assert shardings["Discriminator.2.Filters"].spec \
        == P(None, None, None, "model")
    assert shardings["Discriminator.HyperOutput.W"].spec == P()


def test_sharding_rules_ssgan_tree():
    """Family-3 param tree: Dynamic-MLP dense stacks shard on their output
    dim; the per-frame deconvs follow the Generator transpose-conv rule;
    tiny latent heads stay replicated."""
    from graphical_gan_tpu.core.config import ssgan_defaults
    from graphical_gan_tpu.models.ssgan import SSGanModel

    model = SSGanModel(ssgan_defaults("moving_mnist", "local_ep", dim=16,
                                      dim_op=64, batch_size=8, seq_len=4))
    params = model.init(KEY)
    mesh = make_mesh_2d()
    shardings = tp_param_shardings(params, mesh)
    # ImplicitOperator hidden layers (dim_op wide) shard out
    dyn_w = [n for n in params
             if n.startswith("Generator.Dynamic") and n.endswith(".W")]
    assert dyn_w, "ssgan must register Generator.Dynamic dense kernels"
    hidden = [n for n in dyn_w if params[n].shape[1] >= 8]
    assert hidden and all(
        shardings[n].spec == P(None, "model") for n in hidden)
    # the operator's final projection back to dim_latent_l (=8... but 8 is
    # divisible by 4 and >= _MIN_SHARD, so it shards too unless tiny)
    # frame Generator deconvs shard axis 2 (out channels)
    assert shardings["Generator.2.Filters"].spec \
        == P(None, None, "model", None)
    # output deconv to 1 channel replicated
    assert shardings["Generator.5.Filters"].spec == P()
    # Extractor forward convs shard O
    assert shardings["Extractor.2.Filters"].spec \
        == P(None, None, None, "model")
    # Dynamic discriminator MLPs shard out; its head stays replicated
    assert shardings["Discriminator.Dynamic.2.W"].spec == P(None, "model")
    assert shardings["Discriminator.Dynamic.Output.W"].spec == P()


def test_tp_step_runs_and_matches_unsharded_gmgan():
    """Family-2 under the 2-D (data x model) mesh == unsharded step: the
    replicated-Mu rule and the sharded MLPs must not change the math."""
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel

    model = GMGanModel(gmgan_defaults("mnist", "local_ep", dim=16,
                                      batch_size=8, n_coms=8))
    cfg = model.cfg
    raw_np = np.random.RandomState(0).rand(
        2, cfg.batch_size, 784).astype("float32")
    key = jax.random.PRNGKey(3)

    step1, init1 = make_train_step(model, donate=False)
    s1, m1 = step1(init1(model.init(KEY)), jnp.asarray(raw_np), key,
                   jnp.asarray(True))

    mesh = make_mesh_2d()
    stepN, initN, place = make_tp_train_step(model, mesh, donate=False)
    placed = place(initN(model.init(KEY)))
    # the placement rule: MLP stacks sharded, mixture means replicated
    # (post-step shardings are GSPMD's choice — assert on the placed state)
    assert not placed.params[
        "Discriminator.Hyper2.W"].sharding.is_fully_replicated
    assert placed.params["Generator.Hyper.Mu"].sharding.is_fully_replicated
    sN, mN = stepN(placed, jnp.asarray(raw_np), key, jnp.asarray(True))

    np.testing.assert_allclose(float(m1["gen_cost"]), float(mN["gen_cost"]),
                               rtol=5e-4)
    np.testing.assert_allclose(float(m1["disc_cost"]),
                               float(mN["disc_cost"]), rtol=5e-4)
    for n in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[n]), np.asarray(sN.params[n]),
            atol=2.5e-4, err_msg=n)


@pytest.mark.slow
def test_tp_step_runs_and_matches_unsharded_ssgan():
    """Family-3 under the 2-D mesh == unsharded step: scan-carried Dynamic
    MLPs and the weighted discriminator list survive channel sharding."""
    from graphical_gan_tpu.core.config import ssgan_defaults
    from graphical_gan_tpu.models.ssgan import SSGanModel

    model = SSGanModel(ssgan_defaults("moving_mnist", "local_ep", dim=16,
                                      dim_op=64, batch_size=8, seq_len=4))
    cfg = model.cfg
    rng = np.random.RandomState(0)
    raw_np = {
        "x": rng.rand(2, cfg.batch_size, cfg.seq_len,
                      cfg.output_dim).astype("float32"),
        "y": np.eye(cfg.n_classes, dtype=np.float32)[
            rng.randint(0, cfg.n_classes, size=(2, cfg.batch_size))],
    }
    key = jax.random.PRNGKey(3)

    step1, init1 = make_train_step(model, donate=False)
    s1, m1 = step1(init1(model.init(KEY)),
                   jax.tree.map(jnp.asarray, raw_np), key, jnp.asarray(True))

    mesh = make_mesh_2d()
    stepN, initN, place = make_tp_train_step(model, mesh, donate=False)
    sN, mN = stepN(place(initN(model.init(KEY))),
                   jax.tree.map(jnp.asarray, raw_np), key, jnp.asarray(True))

    np.testing.assert_allclose(float(m1["gen_cost"]), float(mN["gen_cost"]),
                               rtol=5e-4)
    np.testing.assert_allclose(float(m1["disc_cost"]),
                               float(mN["disc_cost"]), rtol=5e-4)
    for n in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[n]), np.asarray(sN.params[n]),
            atol=3e-4, err_msg=n)
    sh = sN.params["Discriminator.Dynamic.2.W"].sharding
    assert not sh.is_fully_replicated


def test_tp_multi_step():
    model = make_model()
    cfg = model.cfg
    mesh = make_mesh_2d()
    step, init_state, place = make_tp_train_step(model, mesh)
    state = place(init_state(model.init(KEY)))
    rng = np.random.RandomState(0)
    for i in range(2):
        raw = jnp.asarray(rng.randint(
            0, 256,
            size=(2, cfg.batch_size, cfg.data.output_dim)).astype("int32"))
        state, m = step(state, raw, jax.random.PRNGKey(i), jnp.asarray(True))
    assert np.isfinite(float(m["gen_cost"]))
