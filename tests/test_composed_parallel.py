"""3-D composed parallelism (data x seq x model): the one step factory that
subsumes DP/SP/TP runs the video family on a 2x2x2 virtual mesh — frame
batch partitioned over data x seq, conv channels over model — and matches
the unsharded program numerically."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from graphical_gan_tpu.core.config import ssgan_defaults
from graphical_gan_tpu.models.ssgan import SSGanModel
from graphical_gan_tpu.parallel.composed import make_composed_train_step
from graphical_gan_tpu.train.step import make_train_step

KEY = jax.random.PRNGKey(0)


def _model():
    # dim=16 so the wide conv channel dims (up to 4*dim) divide the 2-way
    # model axis while the tiny dims stay replicated by rule
    return SSGanModel(ssgan_defaults("moving_mnist", "local_ep", dim=16,
                                     dim_op=64, batch_size=4, seq_len=4))


def _raw(cfg, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "x": rng.rand(2, cfg.batch_size, cfg.seq_len,
                      cfg.output_dim).astype("float32"),
        "y": np.eye(cfg.n_classes, dtype=np.float32)[
            rng.randint(0, cfg.n_classes, size=(2, cfg.batch_size))],
    }


@pytest.mark.slow
def test_composed_3d_matches_unsharded():
    model = _model()
    raw_np = _raw(model.cfg)
    key = jax.random.PRNGKey(7)

    step1, init1 = make_train_step(model, donate=False)
    s1, m1 = step1(init1(model.init(KEY)),
                   jax.tree.map(jnp.asarray, raw_np), key, jnp.asarray(True))

    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "seq", "model"))
    stepN, initN, place = make_composed_train_step(
        model, mesh, data_axis="data", seq_axis="seq", model_axis="model",
        donate=False)
    state = place(initN(model.init(KEY)))
    sN, mN = stepN(state, jax.tree.map(jnp.asarray, raw_np), key,
                   jnp.asarray(True))

    np.testing.assert_allclose(float(m1["gen_cost"]), float(mN["gen_cost"]),
                               rtol=5e-4)
    np.testing.assert_allclose(float(m1["disc_cost"]),
                               float(mN["disc_cost"]), rtol=5e-4)
    for n in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[n]), np.asarray(sN.params[n]),
            atol=3e-4, err_msg=n)


@pytest.mark.slow
def test_composed_subsumes_dp_and_tp():
    """With seq/model axes off, the composed factory is plain DP; with
    model on, param placement matches the TP rules (spot-checked specs)."""
    from graphical_gan_tpu.core.config import gan_inference_defaults
    from graphical_gan_tpu.models.gan_inference import GanInferenceModel

    model = GanInferenceModel(gan_inference_defaults("cifar10", "ali", dim=16,
                                                     batch_size=8))
    raw_np = np.random.RandomState(3).rand(
        2, 8, model.cfg.data.output_dim).astype("float32")
    key = jax.random.PRNGKey(1)

    step1, init1 = make_train_step(model, donate=False)
    s1, m1 = step1(init1(model.init(KEY)), jnp.asarray(raw_np), key,
                   jnp.asarray(True))

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    stepN, initN, place = make_composed_train_step(
        model, mesh, data_axis="data", model_axis="model", donate=False)
    state = place(initN(model.init(KEY)))

    # TP placement: a wide conv kernel is channel-sharded, tiny ones whole
    sharded = [n for n, p in state.params.items()
               if not p.sharding.is_fully_replicated]
    assert sharded, "expected at least one channel-sharded param under TP"

    sN, mN = stepN(state, jnp.asarray(raw_np), key, jnp.asarray(True))
    np.testing.assert_allclose(float(m1["gen_cost"]), float(mN["gen_cost"]),
                               rtol=5e-4)
    for n in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[n]), np.asarray(sN.params[n]),
            atol=3e-4, err_msg=n)
