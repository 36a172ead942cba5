"""int8 serving quantization (ops/quant.py + serve/quantize.py).

Pins, in order of strength:
- INTEGER-EXACT agreement of the int8 conv/deconv/linear paths with the
  float ops when inputs/weights are int-valued with absmax 127 (scales
  collapse to 1, so any arithmetic divergence — wrong axis, wrong layout,
  missing rounding — fails exactly);
- end-to-end sampler closeness after real calibration on two families,
  and that the quantized program actually lowers to int8 contractions;
- the quantized jax.export artifact round-trip (manifest + scales file +
  served outputs close to the float sampler);
- context discipline: inert by default, calibration refuses tracers,
  missing scales raise, contexts don't nest.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.ops import conv2d, deconv2d, linear
from graphical_gan_tpu.ops import quant

KEY = jax.random.PRNGKey(0)


def _int_weights(rng, shape, out_axis):
    """Integer weights in [-127, 127] with per-out-channel absmax 127."""
    w = rng.randint(-127, 128, size=shape).astype(np.float32)
    # plant a 127 in every output channel so s_w == 1 exactly
    idx = [0] * len(shape)
    for c in range(shape[out_axis]):
        idx[out_axis] = slice(c, c + 1)
        flat_first = tuple(0 if i != out_axis else slice(c, c + 1)
                           for i in range(len(shape)))
        w[flat_first] = 127.0
    return w


def _calib_then_quant(f, params, x):
    records = {}
    with quant.calibrating(records):
        ref = registry.apply(f, params, KEY, x)
    scales = quant.scales_from_records(records)
    with quant.quantized(scales):
        q = registry.apply(f, params, KEY, x)
    return np.asarray(ref), np.asarray(q), scales


def test_conv2d_int8_integer_exact():
    rng = np.random.RandomState(0)
    B, H, W, I, O, K = 2, 8, 8, 3, 5, 3

    def f(xx):
        return conv2d("c", I, O, K, xx, stride=2, biases=True)

    x = rng.randint(-127, 128, (B, H, W, I)).astype(np.float32)
    x[0, 0, 0, 0] = 127.0  # activation absmax -> s_x == 1
    _, params = registry.init(f, KEY, jnp.asarray(x))
    params = dict(params)
    params["c.Filters"] = jnp.asarray(
        _int_weights(rng, (K, K, I, O), out_axis=3))

    ref, q, scales = _calib_then_quant(f, params, jnp.asarray(x))
    assert scales["c"] == pytest.approx(1.0)
    np.testing.assert_array_equal(q, ref)


def test_deconv2d_int8_integer_exact():
    rng = np.random.RandomState(1)
    B, H, W, I, O, K = 2, 4, 4, 4, 6, 5

    def f(xx):
        return deconv2d("d", I, O, K, xx, biases=True)

    x = rng.randint(-127, 128, (B, H, W, I)).astype(np.float32)
    x[0, 0, 0, 0] = 127.0
    _, params = registry.init(f, KEY, jnp.asarray(x))
    params = dict(params)
    # TF transpose-conv layout (H, W, out, in): out axis 2
    params["d.Filters"] = jnp.asarray(
        _int_weights(rng, (K, K, O, I), out_axis=2))

    ref, q, _ = _calib_then_quant(f, params, jnp.asarray(x))
    assert q.shape == (B, 2 * H, 2 * W, O)
    np.testing.assert_array_equal(q, ref)


def test_linear_int8_integer_exact_nd():
    rng = np.random.RandomState(2)
    I, O = 16, 8

    def f(xx):
        return linear("l", I, O, xx)

    # 3-D input exercises the ND reshape around the intercepted dot
    x = rng.randint(-127, 128, (3, 5, I)).astype(np.float32)
    x[0, 0, 0] = 127.0
    _, params = registry.init(f, KEY, jnp.asarray(x))
    params = dict(params)
    params["l.W"] = jnp.asarray(_int_weights(rng, (I, O), out_axis=1))

    ref, q, _ = _calib_then_quant(f, params, jnp.asarray(x))
    assert q.shape == (3, 5, O)
    np.testing.assert_array_equal(q, ref)


def _tiny_gan():
    from graphical_gan_tpu.core.config import gan_inference_defaults
    from graphical_gan_tpu.models.gan_inference import GanInferenceModel
    cfg = gan_inference_defaults("mnist", "ali", dim=8, batch_size=8)
    return cfg, GanInferenceModel(cfg)


def test_sampler_calibrate_and_quantize_gan_inference():
    from graphical_gan_tpu.serve.export import make_sampler
    from graphical_gan_tpu.serve.quantize import calibrate, prior_inputs

    cfg, model = _tiny_gan()
    params = model.init(KEY)
    fn, example = make_sampler("gan_inference", model)
    scales = calibrate("gan_inference", model, params,
                       jax.random.PRNGKey(1), n_batches=2)
    assert any("Generator" in k for k in scales)

    inputs = prior_inputs("gan_inference", cfg, 8, jax.random.PRNGKey(2))
    ref = np.asarray(fn(params, KEY, *inputs))

    with quant.quantized(scales):
        jitted = jax.jit(lambda k, *i: fn(params, k, *i))
        lowered = jitted.lower(KEY, *inputs)
        q = np.asarray(jitted(KEY, *inputs))

    # the quantized program really contracts in int8
    assert "i8" in lowered.as_text()
    assert q.shape == ref.shape
    # close to the float sampler, but not bit-identical (quant noise real)
    assert float(np.abs(q - ref).mean()) < 0.1
    assert float(np.abs(q - ref).max()) > 0.0


def test_sampler_quantize_gmgan_onehot_inputs():
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.models.gmgan import GMGanModel
    from graphical_gan_tpu.serve.export import make_sampler
    from graphical_gan_tpu.serve.quantize import calibrate, prior_inputs

    cfg = gmgan_defaults("mnist", "local_ep", dim=8, batch_size=8, n_coms=5)
    model = GMGanModel(cfg)
    params = model.init(KEY)
    fn, _ = make_sampler("gmgan", model)
    scales = calibrate("gmgan", model, params, jax.random.PRNGKey(1),
                       n_batches=2)
    inputs = prior_inputs("gmgan", cfg, 8, jax.random.PRNGKey(2))
    ref = np.asarray(fn(params, KEY, *inputs))
    with quant.quantized(scales):
        q = np.asarray(fn(params, KEY, *inputs))
    assert q.shape == ref.shape
    assert float(np.abs(q - ref).mean()) < 0.1


def test_quantized_export_roundtrip(tmp_path):
    from dataclasses import asdict
    from graphical_gan_tpu.serve.export import export_sampler, load_sampler
    from graphical_gan_tpu.train import checkpoint as ckpt_lib
    from graphical_gan_tpu.train.step import make_train_step

    cfg, model = _tiny_gan()
    outf = tmp_path / "gan_run"
    os.makedirs(outf)
    with open(outf / "config.json", "w") as f:
        json.dump(asdict(cfg), f, default=str)
    _, init_state = make_train_step(model, jit=False)
    state = init_state(model.init(KEY))
    ckpt_lib.save(str(outf / "ckpt_7.npz"), state, {"iteration": 7})

    info = export_sampler(str(outf), platforms=("cpu",), quantize="int8",
                          calib_batches=2)
    with open(info["manifest"]) as f:
        manifest = json.load(f)
    assert manifest["quantization"] == "int8"
    scales_path = os.path.join(os.path.dirname(info["blob"]),
                               "act_scales.json")
    assert os.path.exists(scales_path)
    assert all(v > 0 for v in quant.load_scales(scales_path).values())

    call = load_sampler(info["blob"])
    noise = jnp.asarray(np.random.RandomState(0).randn(8, cfg.dim_latent),
                        jnp.float32)
    served = np.asarray(call(KEY, noise))
    direct = np.asarray(registry.apply(lambda: model.sample(noise),
                                       state.params, KEY))
    assert served.shape == direct.shape
    assert float(np.abs(served - direct).mean()) < 0.1


def test_calibration_refuses_tracers():
    def f(xx):
        return conv2d("c", 3, 4, 3, xx)

    x = jnp.ones((2, 8, 8, 3), jnp.float32)
    _, params = registry.init(f, KEY, x)
    with quant.calibrating({}):
        with pytest.raises(RuntimeError, match="eagerly"):
            jax.jit(lambda xx: registry.apply(f, params, KEY, xx))(x)


def test_missing_scale_raises():
    def f(xx):
        return conv2d("c", 3, 4, 3, xx)

    x = jnp.ones((2, 8, 8, 3), jnp.float32)
    _, params = registry.init(f, KEY, x)
    with quant.quantized({}):
        with pytest.raises(KeyError, match="no calibrated"):
            registry.apply(f, params, KEY, x)


def test_contexts_do_not_nest_and_are_inert_by_default():
    with quant.calibrating({}):
        with pytest.raises(RuntimeError, match="already active"):
            with quant.quantized({"x": 1.0}):
                pass
    # inert: no context -> intercepts return None (float path runs)
    assert quant.intercept_conv2d("c", None, None, 1, "SAME") is None
    assert quant.intercept_linear("l", None, None) is None


def test_sampler_quantize_ssgan_scanned_chain():
    """ssgan's sampler runs its latent chain through lax.scan; calibration
    must still see concrete activations (disable_jit path) and the
    quantized video sampler must stay close to the float one."""
    from graphical_gan_tpu.core.config import ssgan_defaults
    from graphical_gan_tpu.models.ssgan import SSGanModel
    from graphical_gan_tpu.serve.export import make_sampler
    from graphical_gan_tpu.serve.quantize import calibrate, prior_inputs

    cfg = ssgan_defaults("moving_mnist", "local_ep", dim=8, batch_size=4,
                         seq_len=4)
    model = SSGanModel(cfg)
    params = model.init(KEY)
    fn, _ = make_sampler("ssgan", model)
    scales = calibrate("ssgan", model, params, jax.random.PRNGKey(1),
                       n_batches=1)
    assert any("Dynamic" in k for k in scales), sorted(scales)[:5]

    inputs = prior_inputs("ssgan", cfg, 4, jax.random.PRNGKey(2))
    ref = np.asarray(fn(params, KEY, *inputs))
    with quant.quantized(scales):
        q = np.asarray(jax.jit(lambda k, *i: fn(params, k, *i))(KEY, *inputs))
    assert q.shape == ref.shape
    assert float(np.abs(q - ref).mean()) < 0.1
