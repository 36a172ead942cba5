"""Pipeline-parallel ('stage') mesh: the scan+ppermute schedule computes
exactly the sequential staged math (losses AND gradients), the per-row
masked Adam touches only the updated player's stage, and params/moments
really live stage-partitioned."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from graphical_gan_tpu.core.config import gan_inference_defaults
from graphical_gan_tpu.models.gan_inference import GanInferenceModel
from graphical_gan_tpu.parallel import pipeline as pp

KEY = jax.random.PRNGKey(0)


def make_mesh_pp():
    devs = np.asarray(jax.devices()[:2])
    return Mesh(devs, ("stage",))


def make_model(mode="ali", **over):
    over.setdefault("dim", 16)
    over.setdefault("batch_size", 8)
    cfg = gan_inference_defaults("cifar10", mode, **over)
    return GanInferenceModel(cfg)


def test_pack_unpack_roundtrip():
    model = make_model()
    params = model.init(KEY)
    templates, _, _, _ = pp.build_family1_stages(model)
    stacked = pp.pack_stacked(model, params, templates)
    assert stacked.shape[0] == 2
    back = pp.unpack_stacked(stacked, templates)
    assert set(back) == set(params)
    for n in params:
        np.testing.assert_array_equal(np.asarray(back[n]),
                                      np.asarray(params[n]), err_msg=n)


@pytest.mark.slow
def test_pipeline_losses_and_grads_match_sequential():
    """The pipelined program == stage-by-stage sequential execution, for the
    loss values and for the gradient w.r.t. the packed params (which is what
    the backward pipeline produces through scan/switch/ppermute AD)."""
    model = make_model()
    cfg = model.cfg
    params = model.init(KEY)
    raw = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, size=(cfg.batch_size, cfg.data.output_dim)).astype("int32"))
    key = jax.random.PRNGKey(3)
    m_count = 4

    mesh = make_mesh_pp()
    losses, templates, _ = pp._make_pipeline_losses(model, mesh, m_count,
                                                 "stage")
    stacked = pp.pack_stacked(model, params, templates)

    def seq_fn(stacked):
        p = pp.unpack_stacked(stacked, templates)
        return pp.sequential_staged_losses(model, p, raw, key, m_count)

    g_ref, d_ref = seq_fn(stacked)
    g_pp, d_pp = losses(stacked, raw, key)
    np.testing.assert_allclose(float(g_ref), float(g_pp), rtol=1e-5)
    np.testing.assert_allclose(float(d_ref), float(d_pp), rtol=1e-5)

    grad_ref = jax.grad(lambda s: seq_fn(s)[0])(stacked)
    grad_pp = jax.grad(lambda s: losses(s, raw, key)[0])(stacked)
    np.testing.assert_allclose(np.asarray(grad_ref), np.asarray(grad_pp),
                               atol=2e-5)
    # the gen-loss grad reaches stage 0 THROUGH the pipeline boundary
    # (ppermute transpose) — it must be nonzero on both stage rows
    assert float(jnp.abs(grad_pp[0]).max()) > 0
    assert float(jnp.abs(grad_pp[1]).max()) > 0


@pytest.mark.slow
def test_pipeline_wali_gp_matches_sequential():
    """wali-gp through the pipeline: the gradient penalty's inner jax.grad
    lives inside the stage-1 switch branch, so the disc-loss gradient is a
    DOUBLE backward through scan/switch/ppermute — must equal sequential
    staged execution."""
    model = make_model(mode="wali-gp")
    cfg = model.cfg
    params = model.init(KEY)
    raw = jnp.asarray(np.random.RandomState(1).randint(
        0, 256, size=(cfg.batch_size, cfg.data.output_dim)).astype("int32"))
    key = jax.random.PRNGKey(5)
    m_count = 4

    mesh = make_mesh_pp()
    losses, templates, _ = pp._make_pipeline_losses(model, mesh, m_count,
                                                 "stage")
    stacked = pp.pack_stacked(model, params, templates)

    def seq_fn(stacked):
        p = pp.unpack_stacked(stacked, templates)
        return pp.sequential_staged_losses(model, p, raw, key, m_count)

    g_ref, d_ref = seq_fn(stacked)
    g_pp, d_pp = losses(stacked, raw, key)
    np.testing.assert_allclose(float(g_ref), float(g_pp), rtol=1e-5)
    np.testing.assert_allclose(float(d_ref), float(d_pp), rtol=1e-5)

    # disc-loss grad (contains the GP double backward)
    grad_ref = jax.grad(lambda s: seq_fn(s)[1])(stacked)
    grad_pp = jax.grad(lambda s: losses(s, raw, key)[1])(stacked)
    np.testing.assert_allclose(np.asarray(grad_ref), np.asarray(grad_pp),
                               atol=3e-5)
    assert float(jnp.abs(grad_pp[1]).max()) > 0


@pytest.mark.slow
def test_pp_step_masks_players_to_their_stage():
    model = make_model()
    cfg = model.cfg
    mesh = make_mesh_pp()
    rng = np.random.RandomState(1)

    def raw(k):
        return jnp.asarray(rng.randint(
            0, 256,
            size=(1 + k, cfg.batch_size, cfg.data.output_dim)
        ).astype("int32"))

    # G-only step (critic_iters=0): stage-1 row (D params + moments) frozen
    step, init_state, place, _ = pp.make_pp_train_step(
        model, mesh, microbatches=4, critic_iters=0, donate=False)
    state = place(init_state(model.init(KEY)))
    before = np.asarray(state["packed"])
    s2, m = step(state, raw(0), jax.random.PRNGKey(2), jnp.asarray(True))
    after = np.asarray(s2["packed"])
    assert not np.allclose(before[0], after[0])   # gen stage moved
    np.testing.assert_array_equal(before[1], after[1])  # disc stage frozen
    assert int(np.asarray(s2["t"])[0]) == 1
    assert int(np.asarray(s2["t"])[1]) == 0
    assert np.isfinite(float(m["gen_cost"]))

    # D-only step (do_gen=False): stage-0 row frozen
    step, init_state, place, _ = pp.make_pp_train_step(
        model, mesh, microbatches=4, critic_iters=1, donate=False)
    state = place(init_state(model.init(KEY)))
    before = np.asarray(state["packed"])
    s2, m = step(state, raw(1), jax.random.PRNGKey(2), jnp.asarray(False))
    after = np.asarray(s2["packed"])
    np.testing.assert_array_equal(before[0], after[0])
    assert not np.allclose(before[1], after[1])
    assert int(np.asarray(s2["t"])[1]) == 1
    assert np.isfinite(float(m["disc_cost"]))


@pytest.mark.slow
def test_pp_state_is_stage_partitioned_and_trains():
    model = make_model()
    cfg = model.cfg
    mesh = make_mesh_pp()
    step, init_state, place, read_params = pp.make_pp_train_step(
        model, mesh, microbatches=4)
    state = place(init_state(model.init(KEY)))
    for name in ("packed", "m", "v"):
        assert not state[name].sharding.is_fully_replicated, name

    rng = np.random.RandomState(0)
    for i in range(3):
        raw = jnp.asarray(rng.randint(
            0, 256, size=(2, cfg.batch_size, cfg.data.output_dim)
        ).astype("int32"))
        state, m = step(state, raw, jax.random.PRNGKey(i),
                        jnp.asarray(i > 0))
    assert np.isfinite(float(m["gen_cost"]))
    assert np.isfinite(float(m["disc_cost"]))
    # params remain readable as the name-keyed dict for eval/checkpointing
    params = read_params(state)
    assert "Generator.Input.W" in params or any(
        n.startswith("Generator.") for n in params)
    assert all(np.isfinite(np.asarray(v)).all() for v in params.values())


# ---------------------------------------------------------------------------
# Family 2 (gmgan) through the same scheduler
# ---------------------------------------------------------------------------

def make_gmgan(mode="local_ep", **over):
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel
    over.setdefault("dim", 16)
    over.setdefault("batch_size", 8)
    over.setdefault("n_coms", 6)
    cfg = gmgan_defaults("mnist", mode, **over)
    return GMGanModel(cfg)


def _assert_pp_equals_sequential(model, loss_idx, atol):
    cfg = model.cfg
    params = model.init(KEY)
    raw = jnp.asarray(np.random.RandomState(2).randint(
        0, 256, size=(cfg.batch_size, cfg.data.output_dim)).astype("int32"))
    key = jax.random.PRNGKey(7)
    m_count = 4

    mesh = make_mesh_pp()
    losses, templates, _ = pp._make_pipeline_losses(model, mesh, m_count,
                                                 "stage")
    stacked = pp.pack_stacked(model, params, templates)

    def seq_fn(stacked):
        p = pp.unpack_stacked(stacked, templates)
        return pp.sequential_staged_losses(model, p, raw, key, m_count)

    g_ref, d_ref = seq_fn(stacked)
    g_pp, d_pp = losses(stacked, raw, key)
    np.testing.assert_allclose(float(g_ref), float(g_pp), rtol=1e-5)
    np.testing.assert_allclose(float(d_ref), float(d_pp), rtol=1e-5)

    grad_ref = jax.grad(lambda s: seq_fn(s)[loss_idx])(stacked)
    grad_pp = jax.grad(lambda s: losses(s, raw, key)[loss_idx])(stacked)
    # rtol matters: f32 gradients reach magnitude ~1e2 here, and cross-host
    # reduction-order noise at ~5e-7 relative would fail assert_allclose's
    # default rtol=1e-7 even though the pipeline math matches (ADVICE r3).
    np.testing.assert_allclose(np.asarray(grad_ref), np.asarray(grad_pp),
                               rtol=1e-5, atol=atol)
    return grad_pp


@pytest.mark.slow
def test_gmgan_pipeline_local_ep_matches_sequential():
    """local_ep (the published gmgan mode): 2-element discriminator lists
    evaluated in stage 1, shared-Mu hyper chain in stage 0; gen-loss grad
    must cross the boundary and move both stage rows."""
    grad_pp = _assert_pp_equals_sequential(make_gmgan("local_ep"), 0, 2e-5)
    assert float(jnp.abs(grad_pp[0]).max()) > 0
    assert float(jnp.abs(grad_pp[1]).max()) > 0


@pytest.mark.slow
def test_gmgan_pipeline_ali_matches_sequential():
    grad_pp = _assert_pp_equals_sequential(make_gmgan("ali"), 0, 2e-5)
    assert float(jnp.abs(grad_pp[0]).max()) > 0


@pytest.mark.slow
def test_gmgan_pipeline_reinforce_surrogate_crosses_boundary():
    """REINFORCE: the score-function surrogate pairs stage-0's posterior
    max with stage-1's latent-D output, so its gen-loss gradient into the
    EXTRACTOR-side params flows through the activation buffer (ppermute
    transpose).  Must equal sequential staged math and be nonzero on the
    stage-0 row."""
    model = make_gmgan("local_ep", mode_k="REINFORCE")
    grad_pp = _assert_pp_equals_sequential(model, 0, 2e-5)
    assert float(jnp.abs(grad_pp[0]).max()) > 0


@pytest.mark.slow
def test_gmgan_pp_step_trains_and_shares_mu_in_stage0():
    """Generator.Hyper.Mu (read by BOTH sides' hyper chains) lives on the
    stage-0 row; a D-only step must not move it, a G step must."""
    model = make_gmgan("local_ep")
    cfg = model.cfg
    mesh = make_mesh_pp()
    step, init_state, place, read_params = pp.make_pp_train_step(
        model, mesh, microbatches=4, critic_iters=1, donate=False)
    state = place(init_state(model.init(KEY)))
    rng = np.random.RandomState(3)

    def raw():
        return jnp.asarray(rng.randint(
            0, 256, size=(2, cfg.batch_size, cfg.data.output_dim)
        ).astype("int32"))

    mu0 = np.asarray(read_params(state)["Generator.Hyper.Mu"])
    s2, m = step(state, raw(), jax.random.PRNGKey(1), jnp.asarray(False))
    np.testing.assert_array_equal(
        np.asarray(read_params(s2)["Generator.Hyper.Mu"]), mu0)
    s3, m = step(s2, raw(), jax.random.PRNGKey(2), jnp.asarray(True))
    assert not np.allclose(
        np.asarray(read_params(s3)["Generator.Hyper.Mu"]), mu0)
    assert np.isfinite(float(m["gen_cost"]))
    assert np.isfinite(float(m["disc_cost"]))


# -- 4-stage conv-trunk cut (intra-network stage splits) ----------------------

def make_mesh_pp4():
    devs = np.asarray(jax.devices()[:4])
    return Mesh(devs, ("stage",))


@pytest.mark.slow
def test_pipeline4_losses_and_grads_match_sequential():
    """The 4-stage family-1 ali cut (Extractor trunk | Extractor tail +
    Generator | Discriminator trunk | Discriminator tail) computes exactly
    the sequential staged math — losses and the gradient through THREE
    ppermute boundaries."""
    model = make_model()
    cfg = model.cfg
    params = model.init(KEY)
    raw = jnp.asarray(np.random.RandomState(7).randint(
        0, 256, size=(cfg.batch_size, cfg.data.output_dim)).astype("int32"))
    key = jax.random.PRNGKey(11)
    m_count = 4

    mesh = make_mesh_pp4()
    losses, templates, gen_rows = pp._make_pipeline_losses(
        model, mesh, m_count, "stage", n_stages=4)
    assert gen_rows == [0, 1]
    assert len(templates) == 4
    stacked = pp.pack_stacked(model, params, templates)
    assert stacked.shape[0] == 4

    def seq_fn(stacked):
        p = pp.unpack_stacked(stacked, templates)
        return pp.sequential_staged_losses(model, p, raw, key, m_count,
                                           n_stages=4)

    g_ref, d_ref = seq_fn(stacked)
    g_pp, d_pp = losses(stacked, raw, key)
    np.testing.assert_allclose(float(g_ref), float(g_pp), rtol=1e-5)
    np.testing.assert_allclose(float(d_ref), float(d_pp), rtol=1e-5)

    grad_ref = jax.grad(lambda s: seq_fn(s)[0])(stacked)
    grad_pp = jax.grad(lambda s: losses(s, raw, key)[0])(stacked)
    np.testing.assert_allclose(np.asarray(grad_ref), np.asarray(grad_pp),
                               atol=3e-5)
    # the gen-loss gradient reaches EVERY stage row through the pipeline
    for r in range(4):
        assert float(jnp.abs(grad_pp[r]).max()) > 0, r


def test_pipeline4_partition_is_disjoint_and_complete():
    model = make_model()
    params = model.init(KEY)
    templates, fns, act_width, gen_rows = pp.build_family1_stages4(model)
    names = [e[0] for t in templates for e in t.entries]
    assert len(names) == len(set(names))           # disjoint
    assert set(names) == set(params)               # complete
    # trunk/head split really crosses the conv stacks
    assert any(n.startswith("Extractor.1.") for n in
               [e[0] for e in templates[0].entries])
    assert any(n.startswith("Generator.") for n in
               [e[0] for e in templates[1].entries])
    assert all(n.startswith(("Discriminator.1.", "Discriminator.2.",
                             "Discriminator.3."))
               for n in [e[0] for e in templates[2].entries])
    assert any(n.startswith("Discriminator.zx1") for n in
               [e[0] for e in templates[3].entries])


@pytest.mark.slow
def test_pp4_train_step_runs_and_masks_players():
    """The full 4-stage train step: G updates touch only rows 0-1, D
    updates only rows 2-3, state stays stage-sharded and finite."""
    model = make_model()
    cfg = model.cfg
    mesh = make_mesh_pp4()
    step, init_state, place, read_params = pp.make_pp_train_step(
        model, mesh, microbatches=4, critic_iters=1, donate=False)
    state = place(init_state(model.init(KEY)))
    assert state["packed"].shape[0] == 4
    assert not state["packed"].sharding.is_fully_replicated
    rng = np.random.RandomState(3)
    raw = jnp.asarray(rng.randint(
        0, 256, size=(2, cfg.batch_size, cfg.data.output_dim))
        .astype("int32"))

    before = np.asarray(jax.device_get(state["packed"]))
    state2, metrics = step(state, raw, jax.random.PRNGKey(1),
                           jnp.asarray(False))       # D-only step
    after = np.asarray(jax.device_get(state2["packed"]))
    assert np.isfinite(float(metrics["disc_cost"]))
    # pad columns are zero in both; player masking => rows 0-1 untouched
    np.testing.assert_array_equal(before[:2], after[:2])
    assert (before[2] != after[2]).any()
    assert (before[3] != after[3]).any()
    t = np.asarray(jax.device_get(state2["t"]))
    np.testing.assert_array_equal(t, [0, 0, 1, 1])

    state3, metrics = step(state2, raw, jax.random.PRNGKey(2),
                           jnp.asarray(True))        # G + D step
    third = np.asarray(jax.device_get(state3["packed"]))
    assert np.isfinite(float(metrics["gen_cost"]))
    assert (after[0] != third[0]).any()
    assert (after[1] != third[1]).any()
    t = np.asarray(jax.device_get(state3["t"]))
    np.testing.assert_array_equal(t, [1, 1, 2, 2])
    # params survive a read back to the name-keyed dict
    back = read_params(state3)
    assert set(back) == set(model.init(KEY))


def test_networks_trunk_head_split_is_identity():
    """extractor/discriminator == head(trunk(.)) — the refactor that names
    the 4-stage split points changes no math."""
    from graphical_gan_tpu.core import registry
    from graphical_gan_tpu.models import networks
    from graphical_gan_tpu.ops.layout import unflatten_image
    model = make_model()
    cfg = model.cfg
    params = model.init(KEY)
    rng = np.random.RandomState(0)
    x_flat = jnp.asarray(rng.rand(8, cfg.data.output_dim)
                         .astype("float32") * 2 - 1)
    z = jnp.asarray(rng.rand(8, cfg.dim_latent).astype("float32"))

    def whole():
        return networks.discriminator_xz(cfg, x_flat, z)

    def split():
        h, w = cfg.data.image_hw
        x = unflatten_image(x_flat, cfg.data.channels, h, w)
        feat = networks.discriminator_x_trunk(cfg, x)
        return networks.discriminator_xz_head(cfg, feat, z)

    a = registry.apply(whole, params, jax.random.PRNGKey(9))
    b = registry.apply(split, params, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def e_whole():
        return networks.extractor(cfg, x_flat)[0]

    def e_split():
        h, w = cfg.data.image_hw
        x = unflatten_image(x_flat, cfg.data.channels, h, w)
        return networks.extractor_back(cfg, networks.extractor_front(cfg, x),
                                       batch=8)[0]

    a = registry.apply(e_whole, params, jax.random.PRNGKey(9))
    b = registry.apply(e_split, params, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp4_conversion_roundtrip_and_restore_pp_params(tmp_path):
    """The cross-strategy converters and the shared pp-checkpoint reader
    handle the 4-stage cut: standard -> 4-stage -> standard is lossless,
    and restore_pp_params reads a 4-stage checkpoint's params (npz and
    orbax) — the consumer surface serving/generate/scoring go through."""
    from graphical_gan_tpu.train import checkpoint
    from graphical_gan_tpu.train.step import make_train_step

    model = make_model()
    std_step, std_init = make_train_step(model, jit=False)
    state = std_init(model.init(jax.random.PRNGKey(0)))

    pp4 = pp.pp_state_from_train_state(model, state, n_stages=4)
    assert pp4["packed"].shape[0] == 4
    back = pp.train_state_from_pp_state(model, pp4, std_init)
    for n in state.params:
        np.testing.assert_array_equal(np.asarray(state.params[n]),
                                      np.asarray(back.params[n]), err_msg=n)
    for field in ("m", "v"):
        for n in state.gen_opt[field]:
            np.testing.assert_array_equal(
                np.asarray(state.gen_opt[field][n]),
                np.asarray(back.gen_opt[field][n]), err_msg=f"g {field} {n}")
        for n in state.disc_opt[field]:
            np.testing.assert_array_equal(
                np.asarray(state.disc_opt[field][n]),
                np.asarray(back.disc_opt[field][n]), err_msg=f"d {field} {n}")

    for ext in (".npz", ".orbax"):
        path = str(tmp_path / f"ckpt_5{ext}")
        checkpoint.save(path, pp4, extra={"iteration": 5})
        params, extra = pp.restore_pp_params(model, path)
        assert extra["iteration"] == 5
        name = next(iter(state.params))
        np.testing.assert_array_equal(np.asarray(params[name]),
                                      np.asarray(state.params[name]),
                                      err_msg=ext)


def test_conv_gemm_bb_stays_divisor():
    """The VMEM-driven batch-block shrink must keep bb a divisor of b."""
    from graphical_gan_tpu.ops.pallas.conv_gemm import (
        conv_gemm, conv_gemm_reference)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(80, 16, 16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 32, 128).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(128).astype(np.float32))
    got = np.asarray(conv_gemm(x, w, bias))              # b=80 not /32
    ref = np.asarray(conv_gemm_reference(x, w, bias))
    np.testing.assert_allclose(got, ref, atol=1e-3)
