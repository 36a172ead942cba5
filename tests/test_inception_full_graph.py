"""Full-architecture frozen-Inception oracle (VERDICT r2 item 3).

``metrics/inception_frozen.py`` is the path that makes "IS within 0.1 of
the TF reference" measurable wherever ``classify_image_graph_def.pb``
exists; until now it was oracle-tested only on small synthetic fixtures.
This module constructs the COMPLETE Inception-v3 (2015 ``classify_image``)
inference architecture op-for-op as a GraphDef — the real op sequence and
channel plan (stem, 3x mixed 35x35, mixed_3 reduction, 4x mixed 17x17
double-7x7 modules, mixed_8 reduction, 2x mixed 8x8 expanded modules,
``pool_3`` 8x8 VALID avg-pool, bias-free ``softmax/logits/MatMul`` head at
2048x1008), with random weights — and asserts that the JAX interpreter
agrees with a real ``tf.compat.v1.Session`` run of the same GraphDef at
299x299 to f32 tolerance, end to end through the input pipeline
(ExpandDims feed -> Cast -> legacy ResizeBilinear -> Sub -> Mul).

Reference protocol: ``tflib/inception_score.py:56-97`` (feed
``ExpandDims:0``, fetch ``pool_3``, rebuild softmax from the MatMul
weight).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from tensorflow.core.framework import (  # noqa: E402
    graph_pb2, node_def_pb2, types_pb2)

from graphical_gan_tpu.metrics.graphdef import parse_graphdef  # noqa: E402
from graphical_gan_tpu.metrics.inception_frozen import (  # noqa: E402
    FrozenInceptionClassifier, GraphInterpreter)

from test_inception_frozen import _const, _node, _tf_run  # noqa: E402


class _V3Builder:
    """Emits the 2015 graph's op pattern: every conv is
    Conv2D -> BatchNormWithGlobalNormalization(scale_after=False) -> Relu
    (the frozen graph folds no BN; it ships the deprecated global-norm op),
    branches join with Concat (axis as input 0, like the 2015 proto)."""

    def __init__(self, seed: int):
        self.rng = np.random.RandomState(seed)
        self.nodes = []
        self.channels = {}

    def conv(self, name, src, cin, cout, kh, kw, stride=1, padding=b"SAME"):
        r = self.rng
        self.nodes += [
            _const(f"{name}/w",
                   (r.randn(kh, kw, cin, cout) *
                    (0.35 / np.sqrt(kh * kw * cin))).astype(np.float32)),
            _node(f"{name}/conv", "Conv2D", [src, f"{name}/w"],
                  strides=[1, stride, stride, 1], padding=padding),
            _const(f"{name}/bn/m", r.randn(cout).astype(np.float32) * 0.1),
            _const(f"{name}/bn/v",
                   (r.rand(cout).astype(np.float32) * 0.5 + 0.75)),
            _const(f"{name}/bn/beta",
                   r.randn(cout).astype(np.float32) * 0.1),
            _const(f"{name}/bn/gamma", np.ones(cout, np.float32)),
            _node(f"{name}/bn", "BatchNormWithGlobalNormalization",
                  [f"{name}/conv", f"{name}/bn/m", f"{name}/bn/v",
                   f"{name}/bn/beta", f"{name}/bn/gamma"],
                  variance_epsilon=0.001, scale_after_normalization=False,
                  T=types_pb2.DT_FLOAT),
            _node(name, "Relu", [f"{name}/bn"]),
        ]
        self.channels[name] = cout
        return name

    def maxpool(self, name, src, stride=2, padding=b"VALID"):
        self.nodes.append(_node(name, "MaxPool", [src],
                                ksize=[1, 3, 3, 1],
                                strides=[1, stride, stride, 1],
                                padding=padding))
        self.channels[name] = self.channels[src]
        return name

    def avgpool(self, name, src):
        self.nodes.append(_node(name, "AvgPool", [src],
                                ksize=[1, 3, 3, 1], strides=[1, 1, 1, 1],
                                padding=b"SAME"))
        self.channels[name] = self.channels[src]
        return name

    def concat(self, name, srcs):
        # the 2015 proto uses legacy Concat with the axis as INPUT 0
        self.nodes += [
            _const(f"{name}/axis", np.asarray(3, np.int32), np.int32),
            _node(name, "Concat", [f"{name}/axis"] + list(srcs),
                  N=len(srcs)),
        ]
        self.channels[name] = sum(self.channels[s] for s in srcs)
        return name

    def mixed_35(self, name, src, pool_proj):
        cin = self.channels[src]
        b0 = self.conv(f"{name}/b0", src, cin, 64, 1, 1)
        b1 = self.conv(f"{name}/b1a", src, cin, 48, 1, 1)
        b1 = self.conv(f"{name}/b1b", b1, 48, 64, 5, 5)
        b2 = self.conv(f"{name}/b2a", src, cin, 64, 1, 1)
        b2 = self.conv(f"{name}/b2b", b2, 64, 96, 3, 3)
        b2 = self.conv(f"{name}/b2c", b2, 96, 96, 3, 3)
        b3 = self.avgpool(f"{name}/b3pool", src)
        b3 = self.conv(f"{name}/b3", b3, cin, pool_proj, 1, 1)
        return self.concat(name, [b0, b1, b2, b3])

    def mixed_17(self, name, src, c7):
        cin = self.channels[src]
        b0 = self.conv(f"{name}/b0", src, cin, 192, 1, 1)
        b1 = self.conv(f"{name}/b1a", src, cin, c7, 1, 1)
        b1 = self.conv(f"{name}/b1b", b1, c7, c7, 1, 7)
        b1 = self.conv(f"{name}/b1c", b1, c7, 192, 7, 1)
        b2 = self.conv(f"{name}/b2a", src, cin, c7, 1, 1)
        b2 = self.conv(f"{name}/b2b", b2, c7, c7, 7, 1)
        b2 = self.conv(f"{name}/b2c", b2, c7, c7, 1, 7)
        b2 = self.conv(f"{name}/b2d", b2, c7, c7, 7, 1)
        b2 = self.conv(f"{name}/b2e", b2, c7, 192, 1, 7)
        b3 = self.avgpool(f"{name}/b3pool", src)
        b3 = self.conv(f"{name}/b3", b3, cin, 192, 1, 1)
        return self.concat(name, [b0, b1, b2, b3])

    def mixed_8x8(self, name, src):
        cin = self.channels[src]
        b0 = self.conv(f"{name}/b0", src, cin, 320, 1, 1)
        b1 = self.conv(f"{name}/b1a", src, cin, 384, 1, 1)
        b1l = self.conv(f"{name}/b1b", b1, 384, 384, 1, 3)
        b1r = self.conv(f"{name}/b1c", b1, 384, 384, 3, 1)
        b1 = self.concat(f"{name}/b1cat", [b1l, b1r])
        b2 = self.conv(f"{name}/b2a", src, cin, 448, 1, 1)
        b2 = self.conv(f"{name}/b2b", b2, 448, 384, 3, 3)
        b2l = self.conv(f"{name}/b2c", b2, 384, 384, 1, 3)
        b2r = self.conv(f"{name}/b2d", b2, 384, 384, 3, 1)
        b2 = self.concat(f"{name}/b2cat", [b2l, b2r])
        b3 = self.avgpool(f"{name}/b3pool", src)
        b3 = self.conv(f"{name}/b3", b3, cin, 192, 1, 1)
        return self.concat(name, [b0, b1, b2, b3])


def build_inception_v3_2015(seed=0, n_classes=1008):
    b = _V3Builder(seed)

    inp = node_def_pb2.NodeDef(name="ExpandDims", op="Placeholder")
    inp.attr["dtype"].type = types_pb2.DT_FLOAT
    b.nodes += [
        inp,
        # input pipeline as in the 2015 graph: Cast -> ResizeBilinear(299)
        # -> Sub(128) -> Mul(1/128)
        _node("Cast", "Cast", ["ExpandDims"], SrcT=types_pb2.DT_FLOAT,
              DstT=types_pb2.DT_FLOAT),
        _const("resize/size", np.asarray([299, 299], np.int32), np.int32),
        _node("ResizeBilinear", "ResizeBilinear", ["Cast", "resize/size"]),
        _const("Sub/y", 128.0),
        _node("Sub", "Sub", ["ResizeBilinear", "Sub/y"]),
        _const("Mul/y", 1.0 / 128.0),
        _node("Mul", "Mul", ["Sub", "Mul/y"]),
    ]
    b.channels["Mul"] = 3

    # stem: 299 -> 35x35x192
    h = b.conv("conv", "Mul", 3, 32, 3, 3, stride=2, padding=b"VALID")
    h = b.conv("conv_1", h, 32, 32, 3, 3, padding=b"VALID")
    h = b.conv("conv_2", h, 32, 64, 3, 3)
    h = b.maxpool("pool", h)
    h = b.conv("conv_3", h, 64, 80, 1, 1, padding=b"VALID")
    h = b.conv("conv_4", h, 80, 192, 3, 3, padding=b"VALID")
    h = b.maxpool("pool_1", h)

    # 35x35 modules -> 288
    h = b.mixed_35("mixed", h, pool_proj=32)
    h = b.mixed_35("mixed_1", h, pool_proj=64)
    h = b.mixed_35("mixed_2", h, pool_proj=64)

    # mixed_3: grid reduction 35 -> 17, 288 -> 768
    cin = b.channels[h]
    r0 = b.conv("mixed_3/b0", h, cin, 384, 3, 3, stride=2, padding=b"VALID")
    r1 = b.conv("mixed_3/b1a", h, cin, 64, 1, 1)
    r1 = b.conv("mixed_3/b1b", r1, 64, 96, 3, 3)
    r1 = b.conv("mixed_3/b1c", r1, 96, 96, 3, 3, stride=2, padding=b"VALID")
    r2 = b.maxpool("mixed_3/b2pool", h)
    h = b.concat("mixed_3", [r0, r1, r2])

    # 17x17 double-7x7 modules
    h = b.mixed_17("mixed_4", h, c7=128)
    h = b.mixed_17("mixed_5", h, c7=160)
    h = b.mixed_17("mixed_6", h, c7=160)
    h = b.mixed_17("mixed_7", h, c7=192)

    # mixed_8: grid reduction 17 -> 8, 768 -> 1280
    cin = b.channels[h]
    r0 = b.conv("mixed_8/b0a", h, cin, 192, 1, 1)
    r0 = b.conv("mixed_8/b0b", r0, 192, 320, 3, 3, stride=2,
                padding=b"VALID")
    r1 = b.conv("mixed_8/b1a", h, cin, 192, 1, 1)
    r1 = b.conv("mixed_8/b1b", r1, 192, 192, 1, 7)
    r1 = b.conv("mixed_8/b1c", r1, 192, 192, 7, 1)
    r1 = b.conv("mixed_8/b1d", r1, 192, 192, 3, 3, stride=2,
                padding=b"VALID")
    r2 = b.maxpool("mixed_8/b2pool", h)
    h = b.concat("mixed_8", [r0, r1, r2])

    # 8x8 expanded modules -> 2048
    h = b.mixed_8x8("mixed_9", h)
    h = b.mixed_8x8("mixed_10", h)
    assert b.channels[h] == 2048

    rng = b.rng
    b.nodes += [
        _node("pool_3", "AvgPool", [h], ksize=[1, 8, 8, 1],
              strides=[1, 1, 1, 1], padding=b"VALID"),
        _const("softmax/w",
               (rng.randn(2048, n_classes) * 0.05).astype(np.float32)),
        _const("pool_3/shape", np.asarray([-1, 2048], np.int32), np.int32),
        _node("pool_3/reshaped", "Reshape", ["pool_3", "pool_3/shape"],
              T=types_pb2.DT_FLOAT),
        _node("softmax/logits/MatMul", "MatMul",
              ["pool_3/reshaped", "softmax/w"]),
        _node("softmax", "Softmax", ["softmax/logits/MatMul"]),
    ]

    gd = graph_pb2.GraphDef()
    gd.versions.producer = 8  # pre-deprecation: legacy BN still imports
    gd.node.extend(b.nodes)
    return gd


@pytest.fixture(scope="module")
def v3_graph():
    return build_inception_v3_2015()


@pytest.mark.slow
def test_full_inception_v3_interpreter_matches_tf(v3_graph):
    """pool_3 and softmax of the COMPLETE v3 architecture agree between
    tf.compat.v1 and the JAX interpreter at 299x299."""
    gd = v3_graph
    x = np.random.RandomState(1).rand(2, 299, 299, 3).astype(np.float32) \
        * 255.0
    want_pool, want_sm = _tf_run(gd, {"ExpandDims:0": x},
                                 ["pool_3:0", "softmax:0"])

    interp = GraphInterpreter(parse_graphdef(gd.SerializeToString()))
    fn = interp.make_fn("ExpandDims", ["pool_3", "softmax"])
    got_pool, got_sm = fn(interp.consts, x)
    got_pool, got_sm = np.asarray(got_pool), np.asarray(got_sm)
    assert want_pool.shape == got_pool.shape == (2, 1, 1, 2048)
    # ~100 chained conv+BN layers: allow f32 accumulation-order drift
    np.testing.assert_allclose(got_pool, want_pool, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(got_sm, want_sm, rtol=2e-3, atol=1e-5)


@pytest.mark.slow
def test_full_inception_v3_classifier_head_and_resize(v3_graph):
    """FrozenInceptionClassifier end to end on the full graph, fed at a
    NON-299 size so the legacy ResizeBilinear path is live (the reference
    feeds raw-size generator samples and the graph resizes,
    ``tflib/inception_score.py:44``); probabilities match the TF-session
    pool_3 pushed through the reference's rebuilt bias-free head."""
    gd = v3_graph
    x = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32) * 255
    pool = _tf_run(gd, {"ExpandDims:0": x}, "pool_3:0")
    w = None
    for n in gd.node:
        if n.name == "softmax/w":
            w = tf.make_ndarray(n.attr["value"].tensor)
    logits = pool.reshape(-1, 2048) @ w
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    want = e / e.sum(axis=1, keepdims=True)

    clf = FrozenInceptionClassifier(gd.SerializeToString())
    got = clf(x)
    assert got.shape == (2, 1008)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
    # the head spreads probabilities (not collapsed to uniform) even with
    # small random weights
    assert got.max() > 1.5 / 1008
