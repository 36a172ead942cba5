"""Gradient accumulation: scanned microbatches with one averaged update.

The machinery test checks the scan/keying/averaging against a hand-rolled
microbatch average exactly; the integration tests run full family steps with
``accum_steps > 1``.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graphical_gan_tpu.core.config import gan_inference_defaults
from graphical_gan_tpu.models.gan_inference import GanInferenceModel
from graphical_gan_tpu.train.step import (accumulate_value_and_grad,
                                          make_train_step)

KEY = jax.random.PRNGKey(0)


def test_accumulate_value_and_grad_matches_manual_average():
    # loss depends on params, the frozen rest, the per-microbatch RNG key
    # and the data — so a wrong key fold, a dropped 1/accum, or a bad split
    # all fail
    def loss_fn(player, rest, key, raw):
        noise = jax.random.normal(key, raw.shape)
        pred = raw @ player["W"] + rest["b"]
        return jnp.mean((pred - noise) ** 2), None

    player = {"W": jnp.asarray(np.random.RandomState(0).randn(3, 3),
                               jnp.float32)}
    rest = {"b": jnp.asarray(np.random.RandomState(1).randn(3), jnp.float32)}
    raw = jnp.asarray(np.random.RandomState(2).rand(8, 3), jnp.float32)
    key = jax.random.PRNGKey(42)
    accum = 4

    run = accumulate_value_and_grad(loss_fn, accum)
    (loss, _), grads = jax.jit(run)(player, rest, key, raw)

    base = jax.value_and_grad(loss_fn, has_aux=True)
    losses, grad_list = [], []
    for j in range(accum):
        (lj, _), gj = base(player, rest, jax.random.fold_in(key, j),
                           raw[2 * j:2 * (j + 1)])
        losses.append(float(lj))
        grad_list.append(gj)
    np.testing.assert_allclose(float(loss), np.mean(losses), rtol=1e-6)
    want = jax.tree.map(lambda *gs: sum(gs) / accum, *grad_list)
    np.testing.assert_allclose(np.asarray(grads["W"]),
                               np.asarray(want["W"]), rtol=1e-5)


@pytest.mark.slow
def test_accum_step_trains_gan_family():
    cfg = gan_inference_defaults("cifar10", "wali-gp", dim=8, batch_size=8,
                                 accum_steps=4)
    model = GanInferenceModel(cfg)
    step, init_state = make_train_step(model, donate=False)
    state = init_state(model.init(KEY))
    p0 = {n: np.asarray(v) for n, v in state.params.items()}
    raw = jnp.asarray(np.random.RandomState(0).rand(
        1 + cfg.critic_iters, cfg.batch_size,
        cfg.data.output_dim).astype("float32"))
    for i in range(2):
        state, m = step(state, raw, jax.random.PRNGKey(i), jnp.asarray(True))
    assert np.isfinite(float(m["gen_cost"]))
    assert np.isfinite(float(m["disc_cost"]))
    changed = [n for n in p0
               if not np.allclose(p0[n], np.asarray(state.params[n]))]
    assert changed, "accumulated step updated no params"


@pytest.mark.slow
def test_accum_low_byte_compose():
    # bf16 live params: partial sums accumulate in f32 and cast back — the
    # composed step must stay finite and keep param dtypes
    cfg = gan_inference_defaults("mnist", "ali", dim=8, batch_size=8,
                                 accum_steps=2, param_dtype="bfloat16")
    model = GanInferenceModel(cfg)
    step, init_state = make_train_step(model, donate=False)
    state = init_state(model.init(KEY))
    raw = jnp.asarray(np.random.RandomState(1).rand(
        2, cfg.batch_size, cfg.data.output_dim).astype("float32"))
    state, m = step(state, raw, jax.random.PRNGKey(0), jnp.asarray(True))
    assert np.isfinite(float(m["gen_cost"]))
    assert all(v.dtype == jnp.bfloat16 for v in state.params.values()
               if jnp.issubdtype(v.dtype, jnp.floating))


def test_accum_indivisible_batch_raises():
    cfg = gan_inference_defaults("mnist", "ali", dim=8, batch_size=6,
                                 accum_steps=4)
    model = GanInferenceModel(cfg)
    with pytest.raises(ValueError, match="not divisible"):
        make_train_step(model)
