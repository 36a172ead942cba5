"""Family-3 SSGAN: latent-chain scan semantics (shared-eps quirk, POS_MODE
chains), frame nets, discriminator assembly, ratio weighting, training smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.core.config import ssgan_defaults
from graphical_gan_tpu.models.ssgan import SSGanModel
from graphical_gan_tpu.train.step import make_train_step

KEY = jax.random.PRNGKey(0)


def tiny(dataset="moving_mnist", mode="local_ep", **kw):
    kw.setdefault("dim", 4)
    kw.setdefault("dim_op", 16)
    kw.setdefault("batch_size", 2)
    kw.setdefault("seq_len", 4)
    kw.setdefault("image_hw", (64, 64))
    return ssgan_defaults(dataset, mode, **kw)


def test_ratio_weights():
    cfg = tiny(seq_len=16)
    r = cfg.ratio
    assert len(r) == 17                       # (LEN-1) + 1 + 1
    np.testing.assert_allclose(r[:15], 1.0 / 32)
    np.testing.assert_allclose(r[15], 1.0 / 32)
    np.testing.assert_allclose(r[16], 16.0 / 32)


def test_dynamic_generator_shared_epsilon():
    """The chain reuses ONE eps draw (ssgan...mnist.py:137): with res mode
    and zeroed MLP output the chain would be constant; instead verify the
    scan matches a python unroll with the SAME eps."""
    cfg = tiny(seq_len=5)
    model = SSGanModel(cfg)
    params = model.init(KEY)
    z0 = jnp.asarray(np.random.RandomState(0).randn(
        2, cfg.dim_latent_l).astype("float32"))

    chain = registry.apply(lambda: model.dynamic_generator(z0), params,
                           jax.random.PRNGKey(3))
    assert chain.shape == (2, 5, cfg.dim_latent_l)

    # manual unroll with the same rng: first key drawn is the shared eps
    def manual():
        eps = jax.random.normal(registry.next_rng_key(),
                                (2, cfg.dim_latent_t))
        zs = [z0]
        for _ in range(4):
            zs.append(model.implicit_operator(zs[-1], eps,
                                              "Generator.Dynamic"))
        return jnp.stack(zs, axis=1)

    ref = registry.apply(manual, params, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(chain), np.asarray(ref), atol=1e-5)


def test_dynamic_extractor_modes():
    for pos_mode in ["naive_mean_field", "inverse", "forward_inverse", "gsp"]:
        cfg = tiny(pos_mode=pos_mode, seq_len=4)
        model = SSGanModel(cfg)
        params = model.init(KEY)
        pre = jnp.asarray(np.random.RandomState(0).randn(
            2, 4, cfg.dim_latent_l).astype("float32"))
        out = registry.apply(lambda: model.dynamic_extractor(pre), params,
                             KEY)
        assert out.shape == (2, 4, cfg.dim_latent_l), pos_mode
        if pos_mode == "naive_mean_field":
            np.testing.assert_array_equal(np.asarray(out), np.asarray(pre))


def test_inverse_chain_matches_manual_unroll():
    cfg = tiny(pos_mode="inverse", seq_len=4)
    model = SSGanModel(cfg)
    params = model.init(KEY)
    pre = jnp.asarray(np.random.RandomState(1).randn(
        2, 4, cfg.dim_latent_l).astype("float32"))
    out = registry.apply(lambda: model.dynamic_extractor(pre), params, KEY)

    def manual():
        # reference ssgan...mnist.py:144-147: z_t = CO(z_{t+1}, pre_t)
        z_list = [pre[:, 3, :]]
        for i in range(3):
            z_list.insert(0, model.concat_operator(
                z_list[0], pre[:, 4 - i - 2, :],
                "Extractor.Dynamic.Backward"))
        return jnp.stack(z_list, axis=1)

    ref = registry.apply(manual, params, KEY)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gsp_uses_both_operator_sets():
    cfg = tiny(pos_mode="gsp")
    model = SSGanModel(cfg)
    params = model.init(KEY)
    assert "Extractor.Dynamic.Backward.Input.W" in params
    assert "Extractor.Dynamic.Forward.Input.W" in params


def test_res_w_adds_skip_weights():
    cfg = tiny(op_dyn_mode="res_w")
    model = SSGanModel(cfg)
    params = model.init(KEY)
    assert "Generator.Dynamic.ZW.W" in params


def test_frame_generator_shapes_and_range():
    cfg = tiny()
    model = SSGanModel(cfg)
    params = model.init(KEY)
    z_g = jnp.zeros((2, cfg.dim_latent_g))
    z_l = jnp.zeros((2, 4, cfg.dim_latent_l))
    y = jax.nn.one_hot(jnp.asarray([1, 2]), cfg.n_classes)
    out = registry.apply(lambda: model.frame_generator(z_g, z_l, y), params,
                         KEY)
    assert out.shape == (2, 4, 64 * 64)
    assert float(jnp.abs(out).max()) <= 1.0


def test_local_ep_discriminator_list_assembly():
    cfg = tiny(seq_len=4)
    model = SSGanModel(cfg)
    params = model.init(KEY)
    raw = {"x": jnp.asarray(np.random.RandomState(0).rand(
        2, 4, 4096).astype("float32")),
        "y": jax.nn.one_hot(jnp.asarray([0, 1]), 10)}

    def build():
        t = model._graph(raw["x"], raw["y"])
        return t

    t = registry.apply(build, params, jax.random.PRNGKey(1))
    # (LEN-1) dynamic + 1 zg + 1 frame
    assert len(t["disc_fake_list"]) == 5
    assert t["disc_fake_list"][0].shape == (2,)      # pair logits
    assert t["disc_fake_list"][3].shape == (2,)      # zg logits
    assert t["disc_fake_list"][4].shape == (2 * 4,)  # per-frame logits


def test_batched_pair_discriminator_matches_per_pair():
    cfg = tiny(seq_len=4)
    model = SSGanModel(cfg)
    params = model.init(KEY)
    z_l = jnp.asarray(np.random.RandomState(0).randn(
        2, 4, cfg.dim_latent_l).astype("float32"))
    outs = registry.apply(lambda: model.dynamic_discriminator_pairs(z_l),
                          params, KEY)

    def single(z1, z2):
        pair = jnp.stack([jnp.concatenate([z1, z2], axis=1)], axis=1)
        # reuse the batched path with a single pair: [B,2,dl] has 1 pair
        zz = jnp.concatenate([z1[:, None, :], z2[:, None, :]], axis=1)
        return model.dynamic_discriminator_pairs(zz)[0]

    for t in range(3):
        ref = registry.apply(lambda: single(z_l[:, t, :], z_l[:, t + 1, :]),
                             params, KEY)
        np.testing.assert_allclose(np.asarray(outs[t]), np.asarray(ref),
                                   atol=1e-5)


@pytest.mark.parametrize("mode,ali_mode", [
    ("local_ep", "concat_x"), ("local_epce-z", "concat_x"),
    ("ali", "concat_x"), ("ali", "concat_z"), ("ali", "3dcnn"),
    ("alice-z", "concat_x"),
])
def test_all_ssgan_modes_finite(mode, ali_mode):
    cfg = tiny("moving_mnist", mode, ali_mode=ali_mode)
    model = SSGanModel(cfg)
    params = model.init(KEY)
    raw = {"x": jnp.asarray(np.random.RandomState(0).rand(
        2, 4, 4096).astype("float32")),
        "y": jnp.asarray(np.eye(10, dtype="float32")[:2])}
    g, _ = registry.apply(lambda: model.gen_loss(raw), params,
                          jax.random.PRNGKey(1))
    d, _ = registry.apply(lambda: model.disc_loss(raw), params,
                          jax.random.PRNGKey(2))
    assert np.isfinite(float(g)) and np.isfinite(float(d)), (mode, ali_mode)


def test_chairs_unconditional_res_w():
    cfg = ssgan_defaults("chairs", "local_ep", dim=4, dim_op=16,
                         batch_size=2, seq_len=4)
    assert cfg.n_classes == 0 and cfg.op_dyn_mode == "res_w"
    assert cfg.channels == 3
    model = SSGanModel(cfg)
    params = model.init(KEY)
    raw = jnp.asarray(np.random.RandomState(0).rand(
        2, 4, 3 * 64 * 64).astype("float32"))
    g, _ = registry.apply(lambda: model.gen_loss(raw), params,
                          jax.random.PRNGKey(1))
    assert np.isfinite(float(g))
    # G_Extractor consumes C*LEN channels
    assert params["Extractor.G.1.Filters"].shape[2] == 3 * 4


def test_ssgan_train_step_smoke():
    cfg = tiny("moving_mnist", "local_ep")
    model = SSGanModel(cfg)
    params = model.init(KEY)
    step, init_state = make_train_step(model)
    state = init_state(params)
    rng = np.random.RandomState(0)
    for i in range(3):
        raw = {
            "x": jnp.asarray(rng.rand(2, 2, 4, 4096).astype("float32")),
            "y": jnp.asarray(np.tile(np.eye(10, dtype="float32")[:2],
                                     (2, 1, 1))),
        }
        state, m = step(state, raw, jax.random.PRNGKey(i), jnp.asarray(i > 0))
        assert np.isfinite(float(m["gen_cost"]))
        assert np.isfinite(float(m["disc_cost"]))


def test_disentangle_shapes():
    cfg = tiny()
    model = SSGanModel(cfg)
    params = model.init(KEY)
    raw = jnp.asarray(np.random.RandomState(0).rand(
        2, 4, 4096).astype("float32"))
    y = jnp.asarray(np.eye(10, dtype="float32")[:2])
    dis_g = jnp.zeros((2, cfg.dim_latent_g))
    out = registry.apply(
        lambda: model.disentangle(raw, y, dis_g, y), params,
        jax.random.PRNGKey(1))
    assert out.shape == (2, 4, 4096)


def test_chairs_normalization_divides_by_256():
    """ssgan_inference_chairs.py:508: real_x = 2*((x/256)-.5) on int pixels;
    moving-mnist uses 2*(x-.5) on [0,1] floats."""
    from graphical_gan_tpu.models.common import normalize_input
    chairs = ssgan_defaults("chairs", dim=4, dim_op=16, batch_size=2,
                            seq_len=4)
    x = jnp.asarray(np.full((2, 4, 3 * 64 * 64), 128.0, dtype="float32"))
    out = normalize_input(chairs, x, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    mm = ssgan_defaults("moving_mnist", dim=4, dim_op=16, batch_size=2,
                        seq_len=4)
    x01 = jnp.asarray(np.full((2, 4, 4096), 0.5, dtype="float32"))
    out = normalize_input(mm, x01, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
