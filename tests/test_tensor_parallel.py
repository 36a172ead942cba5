"""Tensor-parallel (data x model) mesh: sharding rules, compile+run on the
virtual 8-device topology, numerical agreement with the unsharded step."""

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
