"""Golden-value tests for every objective's loss arithmetic.

The sigmoid-CE label-flip conventions (gen: fake->1 AND real->0) are the
easiest thing to get wrong; each test hand-computes the expected value with
numpy against the reference formulas (tflib/objs/*)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from graphical_gan_tpu.objectives import (
    gan, gan_inference, kl, kl_aggregated, mmd, discrete,
)
from graphical_gan_tpu.objectives.common import sigmoid_ce, optimizer_for
from graphical_gan_tpu.objectives import penalties

RNG = np.random.RandomState(0)
F_LOGITS = RNG.randn(8).astype("float32") * 2
R_LOGITS = RNG.randn(8).astype("float32") * 2


def ce_np(logits, label):
    t = torch.tensor(logits)
    lbl = torch.full_like(t, float(label))
    return float(F.binary_cross_entropy_with_logits(t, lbl))


def test_sigmoid_ce_matches_torch():
    for label in (0.0, 1.0):
        ours = float(sigmoid_ce(jnp.asarray(F_LOGITS), label))
        np.testing.assert_allclose(ours, ce_np(F_LOGITS, label), rtol=5e-5, atol=1e-5)


def test_ali_label_conventions():
    g, d = gan_inference.ali(jnp.asarray(F_LOGITS), jnp.asarray(R_LOGITS))
    exp_g = ce_np(F_LOGITS, 1) + ce_np(R_LOGITS, 0)
    exp_d = ce_np(F_LOGITS, 0) + ce_np(R_LOGITS, 1)
    np.testing.assert_allclose(float(g), exp_g, rtol=5e-5)
    np.testing.assert_allclose(float(d), exp_d, rtol=5e-5)


def test_wali_signs():
    g, d = gan_inference.wali(jnp.asarray(F_LOGITS), jnp.asarray(R_LOGITS))
    np.testing.assert_allclose(float(g), -F_LOGITS.mean() - R_LOGITS.mean(),
                               rtol=5e-5)
    np.testing.assert_allclose(float(d), F_LOGITS.mean() - R_LOGITS.mean(),
                               rtol=5e-5)


def test_wali_gp():
    g, d = gan_inference.wali_gp(jnp.asarray(F_LOGITS), jnp.asarray(R_LOGITS),
                                 jnp.float32(3.5))
    np.testing.assert_allclose(float(g), -F_LOGITS.mean() + R_LOGITS.mean(),
                               rtol=5e-5)
    np.testing.assert_allclose(
        float(d), F_LOGITS.mean() - R_LOGITS.mean() + 3.5, rtol=5e-5)


def test_local_ep_averaging_and_sf_order():
    """s_f is added BEFORE the /len division (gan_inference.py:102-106)."""
    f2 = [jnp.asarray(F_LOGITS), jnp.asarray(R_LOGITS)]
    r2 = [jnp.asarray(R_LOGITS), jnp.asarray(F_LOGITS)]
    sf = 0.7
    g, d = gan_inference.local_ep(f2, r2, s_f=jnp.float32(sf))
    exp_g = (ce_np(F_LOGITS, 1) + ce_np(R_LOGITS, 0)
             + ce_np(R_LOGITS, 1) + ce_np(F_LOGITS, 0) + sf) / 2
    exp_d = (ce_np(F_LOGITS, 0) + ce_np(R_LOGITS, 1)
             + ce_np(R_LOGITS, 0) + ce_np(F_LOGITS, 1)) / 2
    np.testing.assert_allclose(float(g), exp_g, rtol=5e-5)
    np.testing.assert_allclose(float(d), exp_d, rtol=5e-5)


def test_local_epce_rec_after_division():
    f2 = [jnp.asarray(F_LOGITS), jnp.asarray(R_LOGITS)]
    r2 = [jnp.asarray(R_LOGITS), jnp.asarray(F_LOGITS)]
    g0, _ = gan_inference.local_ep(f2, r2)
    g1, _ = gan_inference.local_epce(f2, r2, jnp.float32(1.25))
    np.testing.assert_allclose(float(g1), float(g0) + 1.25, rtol=5e-5)


def test_alice():
    rec = 0.9
    g, d = gan_inference.alice(jnp.asarray(F_LOGITS), jnp.asarray(R_LOGITS),
                               jnp.float32(rec))
    exp_g = ce_np(F_LOGITS, 1) + ce_np(R_LOGITS, 0) + rec
    np.testing.assert_allclose(float(g), exp_g, rtol=5e-5)


def test_vegan_scaling():
    lamb, rec = 2.0, 0.3
    g, d = gan_inference.vegan(jnp.asarray(F_LOGITS), jnp.asarray(R_LOGITS),
                               jnp.float32(rec), lamb)
    np.testing.assert_allclose(float(g), ce_np(F_LOGITS, 1) * lamb + rec,
                               rtol=5e-5)
    np.testing.assert_allclose(
        float(d), (ce_np(F_LOGITS, 0) + ce_np(R_LOGITS, 1)) * lamb / 2,
        rtol=5e-5)


def test_vegan_wgan_gp():
    g, d = gan_inference.vegan_wgan_gp(
        jnp.asarray(F_LOGITS), jnp.asarray(R_LOGITS), jnp.float32(0.3),
        jnp.float32(1.1), 2.0)
    np.testing.assert_allclose(
        float(g), (-F_LOGITS.mean() + R_LOGITS.mean()) * 2 + 0.3, rtol=5e-5)
    np.testing.assert_allclose(
        float(d), (F_LOGITS.mean() - R_LOGITS.mean()) * 2 + 1.1, rtol=5e-5)


def test_local_ep_dynamic_normalization():
    """zz terms normalized by len+1; xz terms un-normalized
    (gan_inference.py:268-288)."""
    zz_f = [jnp.asarray(F_LOGITS)] * 3
    zz_r = [jnp.asarray(R_LOGITS)] * 3
    g, d = gan_inference.local_ep_dynamic(
        zz_f, zz_r, jnp.asarray(R_LOGITS), jnp.asarray(F_LOGITS))
    exp_g = 3 * (ce_np(F_LOGITS, 1) + ce_np(R_LOGITS, 0)) / 4 \
        + ce_np(R_LOGITS, 1) + ce_np(F_LOGITS, 0)
    np.testing.assert_allclose(float(g), exp_g, rtol=5e-5)


def test_weighted_local_epce():
    ratio = np.asarray([0.25, 0.75])
    f2 = [jnp.asarray(F_LOGITS), jnp.asarray(R_LOGITS)]
    r2 = [jnp.asarray(R_LOGITS), jnp.asarray(F_LOGITS)]
    g, d, gdbg, ddbg = gan_inference.weighted_local_epce(f2, r2, ratio,
                                                         jnp.float32(0.5))
    exp_g = (0.25 * (ce_np(F_LOGITS, 1) + ce_np(R_LOGITS, 0))
             + 0.75 * (ce_np(R_LOGITS, 1) + ce_np(F_LOGITS, 0)) + 0.5)
    np.testing.assert_allclose(float(g), exp_g, rtol=5e-5)
    assert len(gdbg) == len(ddbg) == 2
    np.testing.assert_allclose(float(sum(ddbg)), float(d), rtol=5e-5)


def test_plain_gan_family():
    g, d = gan.wgan(jnp.asarray(F_LOGITS), jnp.asarray(R_LOGITS))
    np.testing.assert_allclose(float(g), -F_LOGITS.mean(), rtol=5e-5)
    g, d = gan.gan(jnp.asarray(F_LOGITS), jnp.asarray(R_LOGITS))
    np.testing.assert_allclose(
        float(d), (ce_np(F_LOGITS, 0) + ce_np(R_LOGITS, 1)) / 2, rtol=5e-5)


def test_optimizer_presets():
    s = optimizer_for("wali")
    assert s.kind == "rmsprop" and s.lr == 5e-5 and s.weight_clip == 0.01
    s = optimizer_for("wali_gp")
    assert s.kind == "adam" and s.lr == 1e-4 and s.beta2 == 0.9
    s = optimizer_for("ali", lr=2e-4, beta1=0.5)
    assert s.beta1 == 0.5 and s.beta2 == 0.999


def test_kl_closed_form():
    q_mean = RNG.randn(4, 3).astype("float32")
    q_std = np.abs(RNG.randn(4, 3)).astype("float32") + 0.5
    p_mean = np.zeros((4, 3), np.float32)
    p_std = np.ones((4, 3), np.float32)
    out = kl.kl_q_p_diagonal_gaussian(*map(jnp.asarray,
                                           (q_mean, q_std, p_mean, p_std)))
    ref = 0.5 * (np.log(1.0 / q_std ** 2) + (q_mean ** 2 + q_std ** 2) - 1)
    np.testing.assert_allclose(float(out), ref.sum(1).mean(), rtol=5e-5)
    # KL(p||p) == 0
    zero = kl.kl_q_p_diagonal_gaussian(*map(jnp.asarray,
                                            (p_mean, p_std, p_mean, p_std)))
    np.testing.assert_allclose(float(zero), 0.0, atol=1e-6)


def test_gaussian_nll():
    x = RNG.randn(4, 3).astype("float32")
    mu = np.zeros_like(x)
    std = np.ones_like(x)
    out = kl.neg_log_likelihood_diagonal_gaussian(
        *map(jnp.asarray, (x, mu, std)))
    ref = (0.5 * (x ** 2 + math.log(2 * math.pi))).sum(1).mean()
    np.testing.assert_allclose(float(out), ref, rtol=5e-5)


def test_mixture_loglik_logsumexp():
    x = RNG.randn(5, 2).astype("float32")
    mu = RNG.randn(3, 2).astype("float32")
    std = np.abs(RNG.randn(3, 2)).astype("float32") + 0.5
    out = kl_aggregated.log_likelihood_mixture_gaussian(
        *map(jnp.asarray, (x, mu, std)))
    # numpy reference: log(mean_k N(x | mu_k, std_k))
    comp = np.zeros((5, 3))
    for i in range(5):
        for k in range(3):
            comp[i, k] = (-0.5 * (((x[i] - mu[k]) / std[k]) ** 2
                                  + math.log(2 * math.pi)
                                  + 2 * np.log(std[k]))).sum()
    ref = np.log(np.exp(comp).mean(axis=1))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4)


def test_aggregated_kl_sanity():
    """q == single-component prior => KL estimate ~ 0."""
    key = jax.random.PRNGKey(0)
    n = 64
    q_mean = jnp.zeros((n, 4))
    q_std = jnp.ones((n, 4))
    p_mean = jnp.zeros((2000, 4))
    p_std = jnp.ones((2000, 4))
    out = kl_aggregated.kl_q_aggregated_p_diagonal_gaussian(
        key, q_mean, q_std, p_mean[:1].repeat(2000, 0), p_std, 2000, n, 4)
    assert abs(float(out)) < 0.05


def test_mmd_zero_for_identical():
    x = RNG.randn(16, 4).astype("float32")
    out = mmd.mix_rbf_mmd2(jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(float(out), 0.0, atol=1e-4)


def test_mmd_positive_for_shifted():
    x = RNG.randn(64, 4).astype("float32")
    y = x + 3.0
    assert float(mmd.mix_rbf_mmd2(jnp.asarray(x), jnp.asarray(y))) > 0.1


def test_score_function_gradient():
    """d/dtheta [sg(f-cv) * log p(theta)] == (f-cv) * dlogp/dtheta."""
    f_k = jnp.asarray([2.0, -1.0])
    c_v = 0.5

    def loss(theta):
        p = jax.nn.sigmoid(theta)
        return jnp.sum(discrete.score_function(f_k, p, c_v))

    theta = jnp.asarray([0.3, -0.7])
    g = jax.grad(loss)(theta)
    p = jax.nn.sigmoid(theta)
    expected = (f_k - c_v) * (1 - p)  # dlog sigmoid/dx = 1 - sigmoid
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected), rtol=5e-5)


def test_gradient_penalty_quadratic_disc():
    """For D(x) = a.x (linear), grad slope == |a| everywhere; penalty is
    10*(|a|-1)^2 exactly — a closed-form check of the double-backward."""
    a = np.asarray([3.0, 4.0], dtype="float32")  # |a| = 5

    def d_fn(x):
        return x @ jnp.asarray(a)

    key = jax.random.PRNGKey(0)
    q = jnp.asarray(RNG.randn(8, 2).astype("float32"))
    p = jnp.asarray(RNG.randn(8, 2).astype("float32"))
    gp = penalties.gradient_penalty_z(d_fn, q, p, key)
    np.testing.assert_allclose(float(gp), 10.0 * (5.0 - 1.0) ** 2, rtol=5e-5)


def test_gradient_penalty_xz_uses_x_grad_only():
    """wali-gp slope is d/dx only (reference takes tf.gradients(...)[0])."""
    ax = np.asarray([3.0, 4.0], dtype="float32")
    az = np.asarray([100.0], dtype="float32")

    def d_fn(x, z):
        return x @ jnp.asarray(ax) + z @ jnp.asarray(az)

    key = jax.random.PRNGKey(1)
    rx = jnp.asarray(RNG.randn(8, 2).astype("float32"))
    fx = jnp.asarray(RNG.randn(8, 2).astype("float32"))
    qz = jnp.asarray(RNG.randn(8, 1).astype("float32"))
    pz = jnp.asarray(RNG.randn(8, 1).astype("float32"))
    gp = penalties.gradient_penalty_xz(d_fn, rx, fx, qz, pz, key)
    np.testing.assert_allclose(float(gp), 10.0 * (5.0 - 1.0) ** 2, rtol=5e-5)


def test_gradient_penalty_is_differentiable():
    """The GP must itself be differentiable (double backward) w.r.t. D params."""
    def make_d(w):
        def d_fn(z):
            return jnp.tanh(z @ w).sum(axis=-1)
        return d_fn

    def loss(w):
        q = jnp.ones((4, 3))
        p = -jnp.ones((4, 3))
        return penalties.gradient_penalty_z(make_d(w), q, p,
                                            jax.random.PRNGKey(0))

    g = jax.grad(loss)(jnp.asarray(RNG.randn(3, 2).astype("float32")))
    assert np.isfinite(np.asarray(g)).all()


def test_distance():
    x = jnp.asarray([[1.0, 2.0]])
    y = jnp.asarray([[0.0, 4.0]])
    np.testing.assert_allclose(float(penalties.distance(x, y, "l2")), 2.5)
    np.testing.assert_allclose(float(penalties.distance(x, y, "l1")), 1.5)


def test_wali_gp_fused_matches_unfused_rowwise():
    """penalties.wali_gp_fused (one batched D apply + shared VJP) must equal
    the three-forward + gradient_penalty_xz formulation exactly for a
    row-wise discriminator, including the inner d/dx-tilde gradient."""
    import jax
    from graphical_gan_tpu.objectives.penalties import (
        gradient_penalty_xz, wali_gp_fused)

    rng = np.random.RandomState(0)
    w1 = jnp.asarray(rng.randn(20, 16).astype("float32") * 0.3)
    w2 = jnp.asarray(rng.randn(16, 1).astype("float32") * 0.3)

    def d_fn(x, z):
        h = jnp.concatenate([x, z], axis=1) @ w1
        return (jnp.tanh(h) @ w2).reshape(-1)

    real_x = jnp.asarray(rng.randn(8, 12).astype("float32"))
    fake_x = jnp.asarray(rng.randn(8, 12).astype("float32"))
    q_z = jnp.asarray(rng.randn(8, 8).astype("float32"))
    p_z = jnp.asarray(rng.randn(8, 8).astype("float32"))
    key = jax.random.PRNGKey(7)

    d_real, d_fake, gp = wali_gp_fused(d_fn, real_x, fake_x, q_z, p_z, key,
                                       10.0)
    np.testing.assert_allclose(np.asarray(d_real),
                               np.asarray(d_fn(real_x, q_z)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_fake),
                               np.asarray(d_fn(fake_x, p_z)), rtol=1e-6)
    want_gp = gradient_penalty_xz(d_fn, real_x, fake_x, q_z, p_z, key, 10.0)
    np.testing.assert_allclose(float(gp), float(want_gp), rtol=1e-5)

    # double-backward (the D-update path) agrees too: d gp / d w1
    def gp_fused_loss(w):
        def d(x, z):
            h = jnp.concatenate([x, z], axis=1) @ w
            return (jnp.tanh(h) @ w2).reshape(-1)
        return wali_gp_fused(d, real_x, fake_x, q_z, p_z, key, 10.0)[2]

    def gp_unfused_loss(w):
        def d(x, z):
            h = jnp.concatenate([x, z], axis=1) @ w
            return (jnp.tanh(h) @ w2).reshape(-1)
        return gradient_penalty_xz(d, real_x, fake_x, q_z, p_z, key, 10.0)

    g_f = jax.grad(gp_fused_loss)(w1)
    g_u = jax.grad(gp_unfused_loss)(w1)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_u),
                               rtol=2e-5, atol=1e-6)
