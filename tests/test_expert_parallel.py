"""Expert-parallel (data x expert) mesh for the mixture family: the
component axis of ``Generator.Hyper.Mu`` (and its moments) genuinely shards,
the component logits/k tensors partition over (data, expert), and the step
matches the unsharded program numerically."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from graphical_gan_tpu.core.config import gmgan_defaults
from graphical_gan_tpu.models.gmgan import GMGanModel
from graphical_gan_tpu.parallel.expert import (
    ep_param_shardings, make_ep_train_step,
)
from graphical_gan_tpu.train.step import make_train_step

KEY = jax.random.PRNGKey(0)


def make_mesh_ep(data=2, expert=4):
    devs = np.asarray(jax.devices()[:data * expert]).reshape(data, expert)
    return Mesh(devs, ("data", "expert"))


def make_model(**over):
    over.setdefault("n_coms", 8)
    return GMGanModel(gmgan_defaults("mnist", "local_ep", dim=16,
                                     batch_size=8, **over))


def test_ep_shardings_mu_only():
    model = make_model()
    params = model.init(KEY)
    mesh = make_mesh_ep()
    shardings = ep_param_shardings(params, mesh)
    assert shardings["Generator.Hyper.Mu"].spec == P("expert", None)
    # everything else stays replicated under pure EP
    assert shardings["Discriminator.Hyper2.W"].spec == P()
    assert shardings["Extractor.2.Filters"].spec == P()


def test_ep_shardings_non_dividing_n_coms_replicate():
    model = make_model(n_coms=6)  # 6 % 4 != 0
    params = model.init(KEY)
    mesh = make_mesh_ep()
    shardings = ep_param_shardings(params, mesh)
    assert shardings["Generator.Hyper.Mu"].spec == P()


def test_ep_step_runs_and_matches_unsharded():
    model = make_model()
    cfg = model.cfg
    raw_np = np.random.RandomState(0).rand(
        2, cfg.batch_size, 784).astype("float32")
    key = jax.random.PRNGKey(3)

    step1, init1 = make_train_step(model, donate=False)
    s1, m1 = step1(init1(model.init(KEY)), jnp.asarray(raw_np), key,
                   jnp.asarray(True))

    mesh = make_mesh_ep()
    stepN, initN, place = make_ep_train_step(model, mesh, donate=False)
    placed = place(initN(model.init(KEY)))
    # the means and their Adam moments really are distributed
    assert not placed.params["Generator.Hyper.Mu"].sharding.is_fully_replicated
    assert not placed.gen_opt["m"][
        "Generator.Hyper.Mu"].sharding.is_fully_replicated
    # a chip holds n_coms / expert_size rows of Mu
    shard_shapes = {
        s.index for s in placed.params["Generator.Hyper.Mu"].addressable_shards
    }
    assert len(shard_shapes) == 4  # 4 distinct expert slices over 8 devices

    sN, mN = stepN(placed, jnp.asarray(raw_np), key, jnp.asarray(True))

    np.testing.assert_allclose(float(m1["gen_cost"]), float(mN["gen_cost"]),
                               rtol=5e-4)
    np.testing.assert_allclose(float(m1["disc_cost"]),
                               float(mN["disc_cost"]), rtol=5e-4)
    for n in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[n]), np.asarray(sN.params[n]),
            atol=2.5e-4, err_msg=n)
    # the updated means keep their expert sharding across the step
    assert not sN.params["Generator.Hyper.Mu"].sharding.is_fully_replicated


def test_ep_multi_step_reinforce():
    """REINFORCE mode puts an argmax + one-hot over the sharded component
    axis inside the step — must compile and stay finite on the 2-D mesh."""
    model = make_model(mode_k="REINFORCE")
    cfg = model.cfg
    mesh = make_mesh_ep()
    step, init_state, place = make_ep_train_step(model, mesh)
    state = place(init_state(model.init(KEY)))
    rng = np.random.RandomState(1)
    for i in range(2):
        raw = jnp.asarray(rng.rand(2, cfg.batch_size, 784).astype("float32"))
        state, m = step(state, raw, jax.random.PRNGKey(i), jnp.asarray(True))
    assert np.isfinite(float(m["gen_cost"]))
    assert np.isfinite(float(m["disc_cost"]))
