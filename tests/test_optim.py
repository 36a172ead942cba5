"""TF1-exact optimizer semantics (hand-computed numpy references)."""

import jax
import jax.numpy as jnp
import numpy as np

from graphical_gan_tpu.optim import adam, rmsprop, clip_params, make_optimizer
from graphical_gan_tpu.objectives.common import OptSpec


def test_adam_matches_tf1_formula():
    lr, b1, b2, eps = 1e-3, 0.5, 0.9, 1e-8
    opt = adam(lr, b1, b2, eps)
    p = {"w": jnp.asarray([1.0, -2.0])}
    g1 = {"w": jnp.asarray([0.5, 0.25])}
    g2 = {"w": jnp.asarray([-0.1, 0.4])}
    state = opt.init(p)
    p1, state = opt.update(g1, state, p)
    p2, _ = opt.update(g2, state, p1)

    # numpy reference, TF1 formulation
    w = np.asarray([1.0, -2.0])
    m = np.zeros(2)
    v = np.zeros(2)
    for t, g in [(1, np.asarray([0.5, 0.25])), (2, np.asarray([-0.1, 0.4]))]:
        lr_t = lr * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        w = w - lr_t * m / (np.sqrt(v) + eps)
        if t == 1:
            np.testing.assert_allclose(np.asarray(p1["w"]), w, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2["w"]), w, rtol=1e-6)


def test_rmsprop_ones_init_and_update():
    """TF1 RMSProp: accumulator starts at ONES; eps=1e-10."""
    lr = 5e-5
    opt = rmsprop(lr)
    p = {"w": jnp.asarray([0.1])}
    g = {"w": jnp.asarray([2.0])}
    state = opt.init(p)
    np.testing.assert_array_equal(np.asarray(state["ms"]["w"]), [1.0])
    p1, state = opt.update(g, state, p)
    ms = 0.9 * 1.0 + 0.1 * 4.0
    ref = 0.1 - lr * 2.0 / np.sqrt(ms + 1e-10)
    np.testing.assert_allclose(np.asarray(p1["w"]), [ref], rtol=1e-6)


def test_adam_lr_scale_decay():
    calls = []

    def scale(t):
        calls.append(True)
        return 1.0 - (t - 1.0) / 10.0

    opt = adam(1.0, 0.5, 0.9, lr_scale=scale)
    p = {"w": jnp.asarray([0.0])}
    state = opt.init(p)
    g = {"w": jnp.asarray([1.0])}
    p1, state = opt.update(g, state, p)
    p_noscale = adam(1.0, 0.5, 0.9)
    s2 = p_noscale.init(p)
    q1, _ = p_noscale.update(g, s2, p)
    # at t=1 scale==1 => identical
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(q1["w"]),
                               rtol=1e-6)


def test_clip_params_filters_by_name():
    params = {"Discriminator.W": jnp.asarray([0.5, -0.5]),
              "Generator.W": jnp.asarray([0.5])}
    out = clip_params(params, 0.01, "Discriminator")
    np.testing.assert_allclose(np.asarray(out["Discriminator.W"]),
                               [0.01, -0.01])
    np.testing.assert_allclose(np.asarray(out["Generator.W"]), [0.5])


def test_make_optimizer_from_spec():
    opt = make_optimizer(OptSpec(kind="rmsprop", lr=5e-5))
    p = {"w": jnp.asarray([1.0])}
    assert "ms" in opt.init(p)
    opt = make_optimizer(OptSpec(kind="adam", lr=1e-4))
    assert "m" in opt.init(p)


def test_update_inside_jit():
    opt = adam(1e-3, 0.5, 0.999)
    p = {"w": jnp.ones((4,))}
    state = opt.init(p)

    @jax.jit
    def step(p, state):
        g = {"w": jnp.ones((4,))}
        return opt.update(g, state, p)

    p1, s1 = step(p, state)
    assert np.isfinite(np.asarray(p1["w"])).all()
    assert int(s1["t"]) == 1


def test_adam_master_weights_accumulate_tiny_updates():
    """Low-byte mode: bf16 live params + f32 masters.  A per-step update far
    below one bf16 ulp must still accumulate (in the master) and eventually
    move the live bf16 value — with bf16-only state it would be lost every
    step."""
    opt = adam(1e-4, 0.5, 0.999, master_weights=True)
    p = {"w": jnp.ones((4,), jnp.bfloat16)}
    state = opt.init(p)
    assert state["master"]["w"].dtype == jnp.float32

    g = {"w": jnp.full((4,), 1e-4, jnp.bfloat16)}
    for _ in range(200):
        p, state = opt.update(g, state, p)
    assert p["w"].dtype == jnp.bfloat16
    # Adam with constant gradient moves ~lr per step; after 200 steps the
    # master moved ~0.02 and the bf16 copy must reflect it
    master = np.asarray(state["master"]["w"])
    assert (master < 1.0 - 5e-3).all(), master
    np.testing.assert_allclose(np.asarray(p["w"], np.float32), master,
                               rtol=1e-2)


def test_adam_master_path_matches_f32_path():
    """With f32 params, master_weights=True must reproduce the plain path
    exactly (masters == params at every step)."""
    g = {"w": jnp.asarray([0.3, -0.2, 0.05])}
    p0 = {"w": jnp.asarray([1.0, -1.0, 0.5])}

    plain = adam(1e-3, 0.5, 0.999)
    mast = adam(1e-3, 0.5, 0.999, master_weights=True)
    p_a, s_a = p0, plain.init(p0)
    p_b, s_b = p0, mast.init(p0)
    for _ in range(5):
        p_a, s_a = plain.update(g, s_a, p_a)
        p_b, s_b = mast.update(g, s_b, p_b)
    np.testing.assert_array_equal(np.asarray(p_a["w"]), np.asarray(p_b["w"]))
    np.testing.assert_array_equal(np.asarray(p_b["w"]),
                                  np.asarray(s_b["master"]["w"]))


def test_adam_bf16_moments_stay_close_to_f32_moments():
    rng = np.random.RandomState(0)
    p0 = {"w": jnp.asarray(rng.randn(32).astype(np.float32))}
    plain = adam(1e-3, 0.9, 0.999)
    narrow = adam(1e-3, 0.9, 0.999, moment_dtype=jnp.bfloat16)
    p_a, s_a = p0, plain.init(p0)
    p_b, s_b = p0, narrow.init(p0)
    assert s_b["m"]["w"].dtype == jnp.bfloat16
    for i in range(50):
        g = {"w": jnp.asarray(rng.randn(32).astype(np.float32))}
        p_a, s_a = plain.update(g, s_a, p_a)
        p_b, s_b = narrow.update(g, s_b, p_b)
    np.testing.assert_allclose(np.asarray(p_b["w"]), np.asarray(p_a["w"]),
                               atol=2e-4)


def test_rmsprop_master_weights():
    opt = rmsprop(5e-5, master_weights=True)
    p = {"Discriminator.W": jnp.ones((3,), jnp.bfloat16)}
    state = opt.init(p)
    assert state["master"]["Discriminator.W"].dtype == jnp.float32
    g = {"Discriminator.W": jnp.full((3,), 0.1, jnp.bfloat16)}
    p1, s1 = opt.update(g, state, p)
    assert p1["Discriminator.W"].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(s1["master"]["Discriminator.W"])).all()
