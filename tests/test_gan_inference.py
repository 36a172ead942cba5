"""Family-1 model: shapes, param inventory/counts, player partition,
mode dispatch, and a tiny end-to-end training smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.core.config import gan_inference_defaults
from graphical_gan_tpu.models.gan_inference import GanInferenceModel
from graphical_gan_tpu.train.step import make_train_step

KEY = jax.random.PRNGKey(0)


def tiny(dataset="mnist", mode="ali", **kw):
    kw.setdefault("dim", 8)
    kw.setdefault("batch_size", 4)
    return gan_inference_defaults(dataset, mode, **kw)


def test_mnist_ali_param_inventory():
    cfg = tiny()
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    d = cfg.dim
    # analytic counts per reference mnist/ali architecture
    expected = {
        "Generator.Input.W": (cfg.dim_latent, 4 * 4 * 4 * d),
        "Generator.BN1.offset": (4 * 4 * 4 * d,),
        "Generator.2.Filters": (5, 5, 2 * d, 4 * d),
        "Generator.3.Filters": (5, 5, d, 2 * d),
        "Generator.5.Filters": (5, 5, 1, d),
        "Extractor.1.Filters": (5, 5, 1, d),
        "Extractor.Output.W": (4 * 4 * 4 * d, cfg.dim_latent),
        "Discriminator.z1.W": (cfg.dim_latent, 512),
        "Discriminator.2.W": (512, 512),        # the z-branch Linear
        "Discriminator.2.Filters": (5, 5, d, 2 * d),  # the conv (same name!)
        "Discriminator.zx2.W": (512, 512),
        "Discriminator.Output.W": (512, 1),
    }
    for name, shape in expected.items():
        assert name in params, name
        assert params[name].shape == shape, (name, params[name].shape, shape)


def test_full_mnist_ali_param_count_matches_reference_formula():
    """Total trainable count for the published mnist/ali config (DIM=64,
    z=128, BN on) computed from the reference layer list."""
    cfg = gan_inference_defaults("mnist", "ali")
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    total = registry.param_count(params)
    D, Z = 64, 128

    def conv(i, o, k=5):
        return k * k * i * o + o

    def deconv(i, o, k=5):
        # kernel (k,k,out,in); bias is output_dim (deconv2d.py:63,110-113)
        return k * k * o * i + o

    def lin(i, o):
        return i * o + o

    def bn(c):
        return 2 * c

    gen = (lin(Z, 4 * 4 * 4 * D) + bn(4 * 4 * 4 * D)
           + deconv(4 * D, 2 * D) + bn(2 * D)
           + deconv(2 * D, D) + bn(D)
           + deconv(D, 1))
    ext = (conv(1, D) + conv(D, 2 * D) + bn(2 * D) + conv(2 * D, 4 * D)
           + bn(4 * D) + lin(4 * 4 * 4 * D, Z))
    disc = (conv(1, D) + conv(D, 2 * D) + bn(2 * D) + conv(2 * D, 4 * D)
            + bn(4 * D) + lin(Z, 512) + lin(512, 512)
            + lin(4 * 4 * 4 * D + 512, 512) + lin(512, 512) + lin(512, 1))
    assert total == gen + ext + disc


def test_player_partition():
    model = GanInferenceModel(tiny())
    params = model.init(KEY)
    gen, rest = registry.partition(params, model.GEN_PLAYER)
    disc, rest2 = registry.partition(params, model.DISC_PLAYER)
    assert set(gen) | set(disc) == set(params)
    assert not (set(gen) & set(disc))
    assert all(n.startswith(("Generator", "Extractor")) for n in gen)
    assert all(n.startswith("Discriminator") for n in disc)


@pytest.mark.parametrize("dataset,hw", [("mnist", 784), ("cifar10", 3072)])
def test_generator_output_shape_and_range(dataset, hw):
    cfg = tiny(dataset)
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.dim_latent))
    out = registry.apply(lambda: model.sample(noise), params,
                         jax.random.PRNGKey(2))
    assert out.shape == (4, hw)
    out = np.asarray(out)
    if dataset == "mnist":
        assert out.min() >= 0.0 and out.max() <= 1.0     # sigmoid
    else:
        assert out.min() >= -1.0 and out.max() <= 1.0    # tanh


def test_celeba_shapes():
    cfg = tiny("celeba", batch_size=2, dim=8, dim_g=8, dim_d=8)
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    noise = jax.random.normal(KEY, (2, cfg.dim_latent))
    out = registry.apply(lambda: model.sample(noise), params, KEY)
    assert out.shape == (2, 64 * 64 * 3)
    # 4-stage nets: Generator.4 exists, Extractor.4 exists, no BN anywhere
    assert "Generator.4.Filters" in params
    assert "Extractor.4.Filters" in params
    assert not any("BN" in n for n in params)


@pytest.mark.parametrize("mode", [
    "ali", "alice", "alice-z", "alice-x", "wali", "wali-gp",
    "vegan", "vegan-wgan-gp", "vegan-mmd", "vegan-kl", "vegan-ikl",
    "vegan-jsd", "vae",
])
def test_all_modes_losses_finite(mode):
    cfg = tiny("mnist", mode, z_samples=16)
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    raw = jnp.asarray(
        np.random.RandomState(0).rand(cfg.batch_size, 784).astype("float32"))
    g, aux = registry.apply(lambda: model.gen_loss(raw), params,
                            jax.random.PRNGKey(3))
    assert np.isfinite(float(g)), mode
    if cfg.has_discriminator:
        d, _ = registry.apply(lambda: model.disc_loss(raw), params,
                              jax.random.PRNGKey(4))
        assert np.isfinite(float(d)), mode


def test_vegan_uses_code_discriminator():
    cfg = tiny("mnist", "vegan")
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    assert "Discriminator.Input.W" in params            # z-space MLP
    assert params["Discriminator.Input.W"].shape == (8, 1024)  # dim_latent->8
    assert cfg.dim_latent == 8 and cfg.bn is False      # derived flags
    assert cfg.critic_iters == 5


def test_train_step_smoke_and_determinism():
    cfg = tiny("mnist", "ali")
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    params0 = {n: np.asarray(p) for n, p in params.items()}  # pre-donation copy
    step, init_state = make_train_step(model)
    state = init_state(params)
    raw = jnp.asarray(np.random.RandomState(0).rand(
        1 + cfg.critic_iters, cfg.batch_size, 784).astype("float32"))

    s1, m1 = step(state, raw, jax.random.PRNGKey(10), jnp.asarray(True))
    assert np.isfinite(float(m1["gen_cost"]))
    assert np.isfinite(float(m1["disc_cost"]))
    assert int(s1.step) == 1
    # params actually moved
    moved = sum(
        float(np.abs(np.asarray(s1.params[n]) - params0[n]).max()) > 0
        for n in params0)
    assert moved > len(params0) * 0.9

    # determinism: same inputs -> same result
    state_b = init_state(model.init(KEY))
    s2, m2 = step(state_b, raw, jax.random.PRNGKey(10), jnp.asarray(True))
    np.testing.assert_allclose(float(m1["gen_cost"]), float(m2["gen_cost"]),
                               rtol=1e-6)
    for n in s1.params:
        np.testing.assert_allclose(np.asarray(s1.params[n]),
                                   np.asarray(s2.params[n]), atol=1e-6)


def test_train_step_skips_gen_at_iter0():
    cfg = tiny("mnist", "ali")
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    params0 = {n: np.asarray(p) for n, p in params.items()}  # pre-donation copy
    step, init_state = make_train_step(model)
    state = init_state(params)
    raw = jnp.asarray(np.random.RandomState(0).rand(
        2, cfg.batch_size, 784).astype("float32"))
    s1, _ = step(state, raw, jax.random.PRNGKey(0), jnp.asarray(False))
    # G/E params unchanged, D params changed
    for n, p in params0.items():
        if n.startswith(("Generator", "Extractor")):
            np.testing.assert_array_equal(np.asarray(s1.params[n]), p)
    assert any(
        float(np.abs(np.asarray(s1.params[n]) - params0[n]).max()) > 0
        for n in params0 if n.startswith("Discriminator"))


def test_wali_weight_clip_applied():
    cfg = tiny("mnist", "wali", critic_iters=1)
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    step, init_state = make_train_step(model, critic_iters=1)
    state = init_state(params)
    raw = jnp.asarray(np.random.RandomState(0).rand(
        2, cfg.batch_size, 784).astype("float32"))
    s1, _ = step(state, raw, jax.random.PRNGKey(0), jnp.asarray(True))
    for n, p in s1.params.items():
        if n.startswith("Discriminator"):
            assert float(jnp.abs(p).max()) <= 0.01 + 1e-7, n


def test_gen_only_mode_trains():
    cfg = tiny("mnist", "vegan-mmd")
    model = GanInferenceModel(cfg)
    assert cfg.critic_iters == 0
    params = model.init(KEY)
    step, init_state = make_train_step(model)
    state = init_state(params)
    raw = jnp.asarray(np.random.RandomState(0).rand(
        1, cfg.batch_size, 784).astype("float32"))
    s1, m1 = step(state, raw, jax.random.PRNGKey(0), jnp.asarray(True))
    assert np.isfinite(float(m1["gen_cost"]))
    assert "disc_cost" not in m1


def test_loss_decreases_over_short_run():
    """Few ALI iterations: both costs stay finite and the discriminator
    starts separating (disc cost decreases from its ln(4)~1.386 start)."""
    cfg = tiny("mnist", "ali", dim=8, batch_size=8)
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    step, init_state = make_train_step(model)
    state = init_state(params)
    rng = np.random.RandomState(0)
    costs = []
    for i in range(12):
        raw = jnp.asarray(rng.rand(2, cfg.batch_size, 784).astype("float32"))
        state, m = step(state, raw, jax.random.PRNGKey(i),
                        jnp.asarray(i > 0))
        costs.append(float(m["disc_cost"]))
    assert all(np.isfinite(costs))
    assert costs[-1] < costs[0]


@pytest.mark.slow
def test_low_byte_step_params_bf16_and_tracks_f32():
    """param_dtype=bfloat16 (f32 masters in the optimizer): the live params
    are stored at 2 bytes, stay finite, and over a short run track the f32
    training trajectory (the HBM-roofline-reduction mode of BASELINE.md)."""
    raw_np = np.random.RandomState(0).rand(6, 4, 784).astype("float32")

    def short_run(**extra):
        cfg = tiny("mnist", "wali-gp", critic_iters=1, **extra)
        model = GanInferenceModel(cfg)
        step, init_state = make_train_step(model)
        state = init_state(model.init(KEY))
        for i in range(3):
            raw = jnp.asarray(raw_np[2 * i:2 * i + 2])
            state, m = step(state, raw, jax.random.PRNGKey(i),
                            jnp.asarray(i > 0))
        return state, m

    s32, m32 = short_run()
    s16, m16 = short_run(param_dtype="bfloat16", moment_dtype="bfloat16")

    for n, p in s16.params.items():
        assert p.dtype == jnp.bfloat16, n
        assert np.isfinite(np.asarray(p, np.float32)).all(), n
    # masters live in the opt state at f32
    assert s16.gen_opt["master"][
        "Generator.Input.W"].dtype == jnp.float32
    # the trajectories agree to bf16 resolution after 3 updates
    np.testing.assert_allclose(float(m16["disc_cost"]),
                               float(m32["disc_cost"]), rtol=0.05, atol=0.05)
    for n in s32.params:
        np.testing.assert_allclose(
            np.asarray(s16.params[n], np.float32), np.asarray(s32.params[n]),
            atol=0.02, err_msg=n)


@pytest.mark.slow
def test_low_byte_wali_clips_masters_too():
    """wali weight clip must apply to the f32 masters as well: otherwise the
    master escapes the box and re-exports out-of-range bf16 params on the
    next update."""
    cfg = tiny("mnist", "wali", critic_iters=2, param_dtype="bfloat16")
    model = GanInferenceModel(cfg)
    step, init_state = make_train_step(model)
    state = init_state(model.init(KEY))
    raw = jnp.asarray(np.random.RandomState(0).rand(
        3, cfg.batch_size, 784).astype("float32"))
    for i in range(3):
        state, _ = step(state, raw, jax.random.PRNGKey(i),
                        jnp.asarray(i > 0))
    for n, p in state.disc_opt["master"].items():
        assert float(jnp.abs(p).max()) <= 0.01 + 1e-7, n
    for n, p in state.params.items():
        if n.startswith("Discriminator"):
            # live copy is the bf16 ROUNDING of the clipped master: 0.01
            # rounds up to 0.0100098 (one bf16 ulp)
            assert float(jnp.abs(p).max()) <= 0.01 * (1 + 1 / 128), n


def test_fused_gp_knob_matches_unfused_model_level():
    """cfg.fused_gp=True (opt-in batched-D GP) produces the same losses as
    the default path — the RNG draw order is identical, so values agree to
    numeric tolerance."""
    raw = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, size=(4, 3072)).astype("int32"))
    key = jax.random.PRNGKey(3)

    def losses(**extra):
        cfg = tiny("cifar10", "wali-gp", **extra)
        model = GanInferenceModel(cfg)
        params = model.init(KEY)
        g = registry.apply(lambda: model.gen_loss(raw), params, key)[0]
        d = registry.apply(lambda: model.disc_loss(raw), params, key)[0]
        return float(g), float(d)

    g0, d0 = losses()
    g1, d1 = losses(fused_gp=True)
    np.testing.assert_allclose(g1, g0, rtol=1e-5)
    np.testing.assert_allclose(d1, d0, rtol=1e-4)
