"""Direct parity against TensorFlow — the reference's own runtime semantics.

The reference is TF1; TF2's compat.v1 layer exposes the exact same kernels
(sigmoid CE, SAME-padded conv/conv_transpose, fused batch norm) and
optimizers (tf.compat.v1.train.Adam/RMSProp).  These tests pin our
implementations to that oracle, bit-for-bit where f32 allows.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.objectives.common import sigmoid_ce
from graphical_gan_tpu.ops import batchnorm, conv2d, deconv2d
from graphical_gan_tpu.optim import adam, rmsprop

KEY = jax.random.PRNGKey(0)


def test_sigmoid_ce_vs_tf():
    logits = np.random.RandomState(0).randn(32).astype("float32") * 3
    for label in (0.0, 1.0):
        ours = float(sigmoid_ce(jnp.asarray(logits), label))
        ref = float(tf.reduce_mean(tf.nn.sigmoid_cross_entropy_with_logits(
            logits=tf.constant(logits),
            labels=tf.fill([32], np.float32(label)))))
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_conv2d_vs_tf_same_stride2():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, 9, 3).astype("float32")

    def f(xx):
        return conv2d("c", 3, 8, 5, xx, stride=2)

    out, params = registry.init(f, KEY, jnp.asarray(x))
    w = np.asarray(params["c.Filters"])
    ref = tf.nn.conv2d(tf.constant(x), tf.constant(w),
                       strides=[1, 2, 2, 1], padding="SAME").numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_deconv2d_vs_tf_conv2d_transpose():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4, 4, 6).astype("float32")

    def f(xx):
        return deconv2d("d", 6, 5, 5, xx, stride=2, biases=False)

    out, params = registry.init(f, KEY, jnp.asarray(x))
    w = np.asarray(params["d.Filters"])  # (5,5,out=5,in=6) — TF layout
    ref = tf.nn.conv2d_transpose(
        tf.constant(x), tf.constant(w), output_shape=[2, 8, 8, 5],
        strides=[1, 2, 2, 1], padding="SAME").numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_batchnorm_vs_tf_fused():
    """Our conv-path BN vs tf.nn.fused_batch_norm in training mode (batch
    statistics, eps=1e-5) — the path the reference always takes
    (tflib/ops/batchnorm.py:29-30,51-52)."""
    rng = np.random.RandomState(3)
    x = rng.randn(4, 6, 6, 8).astype("float32") * 2 + 1
    scale = rng.rand(8).astype("float32") + 0.5
    offset = rng.randn(8).astype("float32")

    def f(xx):
        return batchnorm("bn", xx)

    _, params = registry.init(f, KEY, jnp.asarray(x))
    params = dict(params, **{"bn.scale": jnp.asarray(scale),
                             "bn.offset": jnp.asarray(offset)})
    ours = registry.apply(f, params, None, jnp.asarray(x))
    ref, _, _ = tf.compat.v1.nn.fused_batch_norm(
        tf.constant(x), tf.constant(scale), tf.constant(offset),
        epsilon=1e-5, data_format="NHWC", is_training=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


def _tf1_optimize(opt_ctor, w0, grads_seq):
    """Apply a TF1 optimizer to a variable with a fixed gradient sequence."""
    tf.compat.v1.reset_default_graph()
    with tf.compat.v1.Session() as sess:
        var = tf.compat.v1.Variable(w0)
        gph = tf.compat.v1.placeholder(tf.float32, shape=w0.shape)
        opt = opt_ctor()
        train = opt.apply_gradients([(gph, var)])
        sess.run(tf.compat.v1.global_variables_initializer())
        outs = []
        for g in grads_seq:
            sess.run(train, feed_dict={gph: g})
            outs.append(sess.run(var))
        return outs


def test_adam_vs_tf1():
    w0 = np.asarray([1.0, -2.0, 0.5], np.float32)
    grads = [np.asarray(g, np.float32) for g in
             ([0.5, 0.25, -1.0], [-0.1, 0.4, 0.2], [0.3, -0.6, 0.05])]
    refs = _tf1_optimize(
        lambda: tf.compat.v1.train.AdamOptimizer(
            learning_rate=2e-4, beta1=0.5, beta2=0.999),
        w0, grads)

    opt = adam(2e-4, 0.5, 0.999)
    p = {"w": jnp.asarray(w0)}
    state = opt.init(p)
    for g, ref in zip(grads, refs):
        p, state = opt.update({"w": jnp.asarray(g)}, state, p)
        np.testing.assert_allclose(np.asarray(p["w"]), ref, rtol=1e-6,
                                   atol=1e-7)


def test_rmsprop_vs_tf1():
    w0 = np.asarray([0.1, -0.3], np.float32)
    grads = [np.asarray(g, np.float32) for g in
             ([2.0, -1.0], [0.5, 0.25], [-1.5, 3.0])]
    refs = _tf1_optimize(
        lambda: tf.compat.v1.train.RMSPropOptimizer(learning_rate=5e-5),
        w0, grads)

    opt = rmsprop(5e-5)
    p = {"w": jnp.asarray(w0)}
    state = opt.init(p)
    for g, ref in zip(grads, refs):
        p, state = opt.update({"w": jnp.asarray(g)}, state, p)
        np.testing.assert_allclose(np.asarray(p["w"]), ref, rtol=1e-6,
                                   atol=1e-8)


def test_batchnorm_moving_stats_vs_tf():
    """Opt-in moving-stats BN vs a tf transliteration of the reference's
    machinery (``tflib/ops/batchnorm.py:26-68``): training normalization +
    the 1/(t+1) running update, and the blended inference mode."""
    from graphical_gan_tpu.ops.norm import batchnorm_moving_stats

    rng = np.random.RandomState(3)
    x = rng.randn(4, 5, 5, 6).astype("float32") * 2 + 0.5
    scale = (rng.rand(6) + 0.5).astype("float32")
    offset = rng.randn(6).astype("float32")
    mm = rng.randn(6).astype("float32") * 0.1
    mv = (rng.rand(6) + 0.5).astype("float32")

    def ours(is_training, stats_iter):
        def f():
            return batchnorm_moving_stats("bn", jnp.asarray(x), is_training,
                                          stats_iter, jnp.asarray(mm),
                                          jnp.asarray(mv))
        params = {"bn.offset": jnp.asarray(offset),
                  "bn.scale": jnp.asarray(scale)}
        return registry.apply(f, params, KEY)

    # -- training branch: fused_batch_norm + running update (:29-30,:63-64)
    y_tf, bmean_tf, bvar_tf = tf.compat.v1.nn.fused_batch_norm(
        tf.constant(x), tf.constant(scale), tf.constant(offset),
        epsilon=1e-5, data_format="NHWC")
    t = 7.0
    want_mm = (t / (t + 1)) * mm + (1 / (t + 1)) * bmean_tf.numpy()
    want_mv = (t / (t + 1)) * mv + (1 / (t + 1)) * bvar_tf.numpy()
    out, new_mm, new_mv = ours(True, 7)
    np.testing.assert_allclose(np.asarray(out), y_tf.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_mm), want_mm,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_mv), want_mv,
                               rtol=1e-4, atol=1e-4)

    # -- inference branch: blended per-item moments (:32-37)
    b = np.float32(x.shape[0])
    item_mean = x.mean(axis=(1, 2), keepdims=True)
    item_var = x.var(axis=(1, 2), keepdims=True)
    mean = (1 / b) * item_mean + ((b - 1) / b) * mm
    var = (1 / b) * item_var + ((b - 1) / b) * mv
    want = tf.nn.batch_normalization(
        tf.constant(x), tf.constant(mean), tf.constant(var),
        tf.constant(offset), tf.constant(scale), 1e-5).numpy()
    out_i, keep_mm, keep_mv = ours(False, 7)
    np.testing.assert_allclose(np.asarray(out_i), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(keep_mm), mm, atol=0)
    np.testing.assert_allclose(np.asarray(keep_mv), mv, atol=0)
