"""FULL-GRAPH parity vs TensorFlow: the mnist/ali model, end to end.

The strongest parity statement short of running the py2 reference itself:
rebuild the reference's mnist/ali graph (gan_inference_mnist.py:122-252,
257-286) op-for-op in TF2 (NHWC, tf.nn kernels — the same kernels TF1 used),
load OUR initialized parameters into it, feed the identical real batch and
prior noise, and require the latent codes, generated images, discriminator
logits, and both players' losses to agree to f32 tolerance.

ali/no_std is fully deterministic given (real_x, p_z), so no RNG plumbing is
needed: any disagreement is a genuine semantics difference.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.core.config import gan_inference_defaults
from graphical_gan_tpu.models import networks
from graphical_gan_tpu.models.gan_inference import GanInferenceModel
from graphical_gan_tpu.objectives import gan_inference as objs

DIM = 16          # small but real multi-layer stacks
Z = 32
B = 8


def tf_extractor(p, x_flat, dim, z_dim):
    """Reference Extractor (mnist:146-180), NHWC."""
    h = tf.reshape(x_flat, [-1, 28, 28, 1])
    h = tf.nn.conv2d(h, p["Extractor.1.Filters"], strides=2, padding="SAME")
    h = tf.nn.bias_add(h, p["Extractor.1.Biases"])
    h = tf.maximum(0.2 * h, h)

    h = tf.nn.conv2d(h, p["Extractor.2.Filters"], strides=2, padding="SAME")
    h = tf.nn.bias_add(h, p["Extractor.2.Biases"])
    h, _, _ = tf.compat.v1.nn.fused_batch_norm(
        h, p["Extractor.BN2.scale"], p["Extractor.BN2.offset"],
        epsilon=1e-5, data_format="NHWC", is_training=True)
    h = tf.maximum(0.2 * h, h)

    h = tf.nn.conv2d(h, p["Extractor.3.Filters"], strides=2, padding="SAME")
    h = tf.nn.bias_add(h, p["Extractor.3.Biases"])
    h, _, _ = tf.compat.v1.nn.fused_batch_norm(
        h, p["Extractor.BN3.scale"], p["Extractor.BN3.offset"],
        epsilon=1e-5, data_format="NHWC", is_training=True)
    h = tf.maximum(0.2 * h, h)

    # NHWC feature flatten must match our reshape(-1, feat) on NHWC
    h = tf.reshape(h, [-1, 4 * 4 * 4 * dim])
    return tf.reshape(
        tf.matmul(h, p["Extractor.Output.W"]) + p["Extractor.Output.b"],
        [-1, z_dim])


def tf_dense_bn(h, scale, offset):
    """Reference generic-axes BN over axis 0 (batchnorm.py:74-87), eps 1e-5."""
    mean, var = tf.nn.moments(h, axes=[0], keepdims=True)
    return tf.nn.batch_normalization(h, mean, var, offset, scale, 1e-5)


def tf_generator(p, noise, dim):
    """Reference Generator (mnist:122-144) incl. the 7x7 crop, NHWC."""
    h = tf.matmul(noise, p["Generator.Input.W"]) + p["Generator.Input.b"]
    h = tf_dense_bn(h, p["Generator.BN1.scale"], p["Generator.BN1.offset"])
    h = tf.nn.relu(h)
    h = tf.reshape(h, [-1, 4, 4, 4 * dim])

    def deconv(h, w, b, out_ch):
        shp = tf.shape(h)
        out = tf.nn.conv2d_transpose(
            h, w, output_shape=[shp[0], 2 * shp[1], 2 * shp[2], out_ch],
            strides=[1, 2, 2, 1], padding="SAME")
        return tf.nn.bias_add(out, b)

    h = deconv(h, p["Generator.2.Filters"], p["Generator.2.Biases"], 2 * dim)
    h, _, _ = tf.compat.v1.nn.fused_batch_norm(
        h, p["Generator.BN2.scale"], p["Generator.BN2.offset"],
        epsilon=1e-5, data_format="NHWC", is_training=True)
    h = tf.nn.relu(h)

    h = h[:, :7, :7, :]

    h = deconv(h, p["Generator.3.Filters"], p["Generator.3.Biases"], dim)
    h, _, _ = tf.compat.v1.nn.fused_batch_norm(
        h, p["Generator.BN3.scale"], p["Generator.BN3.offset"],
        epsilon=1e-5, data_format="NHWC", is_training=True)
    h = tf.nn.relu(h)

    h = deconv(h, p["Generator.5.Filters"], p["Generator.5.Biases"], 1)
    h = tf.sigmoid(h)
    return tf.reshape(h, [-1, 784])


def tf_discriminator(p, x_flat, z, dim):
    """Reference mnist Discriminator (mnist:217-252), NHWC, dropout=identity."""
    h = tf.reshape(x_flat, [-1, 28, 28, 1])
    h = tf.nn.conv2d(h, p["Discriminator.1.Filters"], strides=2,
                     padding="SAME")
    h = tf.nn.bias_add(h, p["Discriminator.1.Biases"])
    h = tf.maximum(0.2 * h, h)

    h = tf.nn.conv2d(h, p["Discriminator.2.Filters"], strides=2,
                     padding="SAME")
    h = tf.nn.bias_add(h, p["Discriminator.2.Biases"])
    h, _, _ = tf.compat.v1.nn.fused_batch_norm(
        h, p["Discriminator.BN2.scale"], p["Discriminator.BN2.offset"],
        epsilon=1e-5, data_format="NHWC", is_training=True)
    h = tf.maximum(0.2 * h, h)

    h = tf.nn.conv2d(h, p["Discriminator.3.Filters"], strides=2,
                     padding="SAME")
    h = tf.nn.bias_add(h, p["Discriminator.3.Biases"])
    h, _, _ = tf.compat.v1.nn.fused_batch_norm(
        h, p["Discriminator.BN3.scale"], p["Discriminator.BN3.offset"],
        epsilon=1e-5, data_format="NHWC", is_training=True)
    h = tf.maximum(0.2 * h, h)

    h = tf.reshape(h, [-1, 4 * 4 * 4 * dim])

    hz = tf.matmul(z, p["Discriminator.z1.W"]) + p["Discriminator.z1.b"]
    hz = tf.maximum(0.2 * hz, hz)
    hz = tf.matmul(hz, p["Discriminator.2.W"]) + p["Discriminator.2.b"]
    hz = tf.maximum(0.2 * hz, hz)

    h = tf.concat([h, hz], axis=1)
    h = tf.matmul(h, p["Discriminator.zx1.W"]) + p["Discriminator.zx1.b"]
    h = tf.maximum(0.2 * h, h)
    h = tf.matmul(h, p["Discriminator.zx2.W"]) + p["Discriminator.zx2.b"]
    h = tf.maximum(0.2 * h, h)
    out = tf.matmul(h, p["Discriminator.Output.W"]) + p["Discriminator.Output.b"]
    return tf.reshape(out, [-1])


def test_full_mnist_ali_graph_matches_tf():
    cfg = gan_inference_defaults("mnist", "ali", dim=DIM, dim_latent=Z,
                                 batch_size=B)
    model = GanInferenceModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    p_tf = {n: tf.constant(np.asarray(v)) for n, v in params.items()}

    rng = np.random.RandomState(0)
    real_x = rng.rand(B, 784).astype("float32")
    p_z = rng.randn(B, Z).astype("float32")

    # ---- ours (deterministic pieces of the ali graph) ----
    def ours():
        q_z, _, _ = networks.extractor(cfg, jnp.asarray(real_x))
        fake_x, _, _ = networks.generator(cfg, jnp.asarray(p_z))
        d_real = networks.discriminator_xz(cfg, jnp.asarray(real_x), q_z)
        d_fake = networks.discriminator_xz(cfg, fake_x, jnp.asarray(p_z))
        g, d = objs.ali(d_fake, d_real)
        return q_z, fake_x, d_real, d_fake, g, d

    q_z_j, fake_j, dr_j, df_j, g_j, d_j = registry.apply(
        ours, params, jax.random.PRNGKey(1))

    # ---- TF mirror of the reference graph ----
    q_z_t = tf_extractor(p_tf, tf.constant(real_x), DIM, Z)
    fake_t = tf_generator(p_tf, tf.constant(p_z), DIM)
    dr_t = tf_discriminator(p_tf, tf.constant(real_x), q_z_t, DIM)
    df_t = tf_discriminator(p_tf, fake_t, tf.constant(p_z), DIM)
    gen_t = tf.reduce_mean(tf.nn.sigmoid_cross_entropy_with_logits(
        logits=df_t, labels=tf.ones_like(df_t))) + tf.reduce_mean(
        tf.nn.sigmoid_cross_entropy_with_logits(
            logits=dr_t, labels=tf.zeros_like(dr_t)))
    disc_t = tf.reduce_mean(tf.nn.sigmoid_cross_entropy_with_logits(
        logits=df_t, labels=tf.zeros_like(df_t))) + tf.reduce_mean(
        tf.nn.sigmoid_cross_entropy_with_logits(
            logits=dr_t, labels=tf.ones_like(dr_t)))

    np.testing.assert_allclose(np.asarray(q_z_j), q_z_t.numpy(),
                               atol=2e-4, err_msg="q_z")
    np.testing.assert_allclose(np.asarray(fake_j), fake_t.numpy(),
                               atol=2e-4, err_msg="fake_x")
    np.testing.assert_allclose(np.asarray(dr_j), dr_t.numpy(), atol=2e-3,
                               err_msg="disc_real")
    np.testing.assert_allclose(np.asarray(df_j), df_t.numpy(), atol=2e-3,
                               err_msg="disc_fake")
    np.testing.assert_allclose(float(g_j), float(gen_t), atol=2e-3,
                               err_msg="gen_cost")
    np.testing.assert_allclose(float(d_j), float(disc_t), atol=2e-3,
                               err_msg="disc_cost")


def test_gmgan_mixture_machinery_matches_tf():
    """HyperGenerator / HyperExtractor logits / HyperDiscriminator vs a TF
    transliteration of gmgan_inference_mnist.py:142-165,249-265 (the
    deterministic parts; CONCRETE sampling is stochastic by design)."""
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel

    K = 5
    cfg = gmgan_defaults("mnist", "local_ep", dim=DIM, dim_latent=Z,
                         batch_size=B, n_coms=K)
    model = GMGanModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    p_tf = {n: tf.constant(np.asarray(v)) for n, v in params.items()}

    rng = np.random.RandomState(1)
    z = rng.randn(B, Z).astype("float32")
    k_onehot = np.eye(K, dtype="float32")[rng.randint(0, K, B)]
    noise = rng.randn(B, Z).astype("float32")

    def ours():
        pz = model.hyper_generator(jnp.asarray(k_onehot), jnp.asarray(noise))
        logits, _ = model.hyper_extractor(jnp.asarray(z))
        d = model.hyper_discriminator(jnp.asarray(z), jnp.asarray(k_onehot))
        return pz, logits, d

    pz_j, logits_j, d_j = registry.apply(ours, params, jax.random.PRNGKey(2))

    # TF mirror
    mu = p_tf["Generator.Hyper.Mu"]
    pz_t = tf.matmul(tf.constant(k_onehot), mu) + tf.constant(noise)
    # com_logits = -.5 sum (z - mu)^2 + log(1/K)   (gmgan:150)
    diff = tf.expand_dims(tf.constant(z), 1) - tf.expand_dims(mu, 0)
    logits_t = -0.5 * tf.reduce_sum(tf.square(diff), axis=-1) \
        + tf.math.log(1.0 / K)

    h = tf.concat([tf.constant(z), tf.constant(k_onehot)], axis=1)
    for name in ("HyperInput", "Hyper2", "Hyper3"):
        h = tf.matmul(h, p_tf[f"Discriminator.{name}.W"]) \
            + p_tf[f"Discriminator.{name}.b"]
        h = tf.maximum(0.2 * h, h)
    d_t = tf.reshape(tf.matmul(h, p_tf["Discriminator.HyperOutput.W"])
                     + p_tf["Discriminator.HyperOutput.b"], [-1])

    np.testing.assert_allclose(np.asarray(pz_j), pz_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(), atol=1e-3)


def test_ssgan_frame_generator_matches_tf():
    """SSGAN frame generator (4-deconv 64x64 stack with z_g tiling + label
    concat at B*LEN, ssgan_inference_moving_mnist.py:170-205) vs TF."""
    from graphical_gan_tpu.core.config import ssgan_defaults
    from graphical_gan_tpu.models.ssgan import SSGanModel

    L, DIMS = 3, 8
    cfg = ssgan_defaults("moving_mnist", "local_ep", dim=DIMS, dim_op=16,
                         batch_size=4, seq_len=L)
    model = SSGanModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    p_tf = {n: tf.constant(np.asarray(v)) for n, v in params.items()}

    rng = np.random.RandomState(2)
    z_g = rng.randn(4, cfg.dim_latent_g).astype("float32")
    z_l = rng.randn(4, L, cfg.dim_latent_l).astype("float32")
    y = np.eye(10, dtype="float32")[rng.randint(0, 10, 4)]

    out_j = registry.apply(
        lambda: model.frame_generator(jnp.asarray(z_g), jnp.asarray(z_l),
                                      jnp.asarray(y)),
        params, jax.random.PRNGKey(3))

    # TF mirror (BN off in the default ssgan config)
    zg_t = tf.tile(tf.expand_dims(tf.constant(z_g), 1), [1, L, 1])
    lab_t = tf.tile(tf.expand_dims(tf.constant(y), 1), [1, L, 1])
    zin = tf.concat([zg_t, tf.constant(z_l), lab_t], axis=-1)
    zin = tf.reshape(zin, [4 * L, cfg.dim_latent_g + cfg.dim_latent_l + 10])

    h = tf.matmul(zin, p_tf["Generator.Input.W"]) + p_tf["Generator.Input.b"]
    h = tf.nn.relu(h)
    h = tf.reshape(h, [4 * L, 4, 4, 8 * DIMS])

    def deconv(h, w, b, out_ch):
        shp = tf.shape(h)
        out = tf.nn.conv2d_transpose(
            h, w, output_shape=[shp[0], 2 * shp[1], 2 * shp[2], out_ch],
            strides=[1, 2, 2, 1], padding="SAME")
        return tf.nn.bias_add(out, b)

    h = tf.nn.relu(deconv(h, p_tf["Generator.2.Filters"],
                          p_tf["Generator.2.Biases"], 4 * DIMS))
    h = tf.nn.relu(deconv(h, p_tf["Generator.3.Filters"],
                          p_tf["Generator.3.Biases"], 2 * DIMS))
    h = tf.nn.relu(deconv(h, p_tf["Generator.4.Filters"],
                          p_tf["Generator.4.Biases"], DIMS))
    h = tf.tanh(deconv(h, p_tf["Generator.5.Filters"],
                       p_tf["Generator.5.Biases"], 1))
    out_t = tf.reshape(h, [4, L, 4096])

    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-4)


def test_gradient_penalty_input_grads_match_tf_tape():
    """The wali-gp double-backward core: d D(x,z) / d x through the full
    conv discriminator must match tf.GradientTape with shared weights
    (SURVEY §7.3: 'must be checked numerically')."""
    cfg = gan_inference_defaults("mnist", "wali-gp", dim=DIM, dim_latent=Z,
                                 batch_size=B)
    model = GanInferenceModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    p_tf = {n: tf.constant(np.asarray(v)) for n, v in params.items()}

    rng = np.random.RandomState(3)
    x_hat = rng.rand(B, 784).astype("float32")
    z_hat = rng.randn(B, Z).astype("float32")

    # ours: gradient of sum D w.r.t. x (exactly what gradient_penalty_xz
    # differentiates before the slope penalty)
    def d_sum(xh):
        return jnp.sum(networks.discriminator_xz(cfg, xh, jnp.asarray(z_hat)))

    gx_j = registry.apply(
        lambda: jax.grad(d_sum)(jnp.asarray(x_hat)), params,
        jax.random.PRNGKey(1))

    # TF tape through the transliterated discriminator
    xt = tf.Variable(x_hat)
    with tf.GradientTape() as tape:
        out = tf.reduce_sum(tf_discriminator(p_tf, xt, tf.constant(z_hat),
                                             DIM))
    gx_t = tape.gradient(out, xt)

    np.testing.assert_allclose(np.asarray(gx_j), gx_t.numpy(), atol=3e-4)

    # and the resulting slope penalties agree
    slope_j = np.sqrt((np.asarray(gx_j) ** 2).sum(axis=1))
    slope_t = np.sqrt((gx_t.numpy() ** 2).sum(axis=1))
    np.testing.assert_allclose(10 * ((slope_j - 1) ** 2).mean(),
                               10 * ((slope_t - 1) ** 2).mean(), rtol=1e-3)
