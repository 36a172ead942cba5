"""Frozen-Inception loader: proto parser + JAX interpreter vs tf.compat.v1.

Builds a synthetic Inception-2015-shaped GraphDef fixture (same op set and
tensor names as ``classify_image_graph_def.pb``, including the deprecated
``BatchNormWithGlobalNormalization`` and legacy ``ResizeBilinear``), then
checks:

- the pure-Python proto parser decodes nodes/attrs/tensors exactly,
- the JAX forward matches a real ``tf.compat.v1.Session`` run of the same
  GraphDef fed at ``ExpandDims:0`` (the reference protocol,
  ``tflib/inception_score.py:44,78-94``),
- ``FrozenInceptionClassifier`` reproduces the reference's rebuilt
  pool_3 → bias-free-matmul → softmax head end to end.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import tensorflow.compat.v1 as tf1  # noqa: E402
from tensorflow.core.framework import (  # noqa: E402
    graph_pb2, node_def_pb2, types_pb2)

from graphical_gan_tpu.metrics.graphdef import parse_graphdef  # noqa: E402
from graphical_gan_tpu.metrics.inception_frozen import (  # noqa: E402
    FrozenInceptionClassifier, GraphInterpreter, _resize_bilinear_legacy)


def _const(name, arr, dtype=None):
    n = node_def_pb2.NodeDef(name=name, op="Const")
    arr = np.asarray(arr, dtype or np.float32)
    n.attr["dtype"].type = (types_pb2.DT_INT32 if arr.dtype == np.int32
                            else types_pb2.DT_FLOAT)
    n.attr["value"].tensor.CopyFrom(tf.make_tensor_proto(arr))
    return n


_TYPE_ATTRS = ("T", "DstT", "SrcT", "Tshape", "Tidx", "Tdim")
_NO_T = ("Placeholder", "Const")


def _node(name, op, inputs, **attrs):
    n = node_def_pb2.NodeDef(name=name, op=op, input=inputs)
    if "T" not in attrs and op not in _NO_T:
        attrs["T"] = types_pb2.DT_FLOAT
    if op in ("ConcatV2", "Concat"):
        attrs.setdefault("Tidx", types_pb2.DT_INT32)
    if op == "Reshape":
        attrs.setdefault("Tshape", types_pb2.DT_INT32)
    if op == "ExpandDims":
        attrs.setdefault("Tdim", types_pb2.DT_INT32)
    for k, v in attrs.items():
        if isinstance(v, bool):
            n.attr[k].b = v
        elif isinstance(v, float):
            n.attr[k].f = v
        elif isinstance(v, bytes):
            n.attr[k].s = v
        elif isinstance(v, int):
            if k in _TYPE_ATTRS:
                n.attr[k].type = v
            else:
                n.attr[k].i = v
        elif isinstance(v, list):
            n.attr[k].list.i.extend(v)
    return n


def build_fixture(seed=0):
    """Mini inception: ExpandDims(placeholder) -> ResizeBilinear -> Sub ->
    Mul -> Conv2D -> BN(global) -> Relu -> MaxPool -> {Conv1x1+Relu, AvgPool}
    -> ConcatV2 -> AvgPool VALID (= 'pool_3') -> softmax/logits/MatMul."""
    rng = np.random.RandomState(seed)
    gd = graph_pb2.GraphDef()
    gd.versions.producer = 8  # pre-deprecation so legacy BN still imports

    inp = node_def_pb2.NodeDef(name="ExpandDims", op="Placeholder")
    inp.attr["dtype"].type = types_pb2.DT_FLOAT

    gd.node.extend([
        inp,
        _const("resize/size", np.asarray([19, 19], np.int32), np.int32),
        _node("resized", "ResizeBilinear", ["ExpandDims", "resize/size"]),
        _const("sub/y", 128.0),
        _node("subbed", "Sub", ["resized", "sub/y"]),
        _const("mul/y", 1.0 / 128.0),
        _node("scaled", "Mul", ["subbed", "mul/y"]),
        _const("conv/w", rng.randn(3, 3, 3, 8).astype(np.float32) * 0.2),
        _node("conv", "Conv2D", ["scaled", "conv/w"],
              strides=[1, 2, 2, 1], padding=b"SAME"),
        _const("bn/m", rng.randn(8).astype(np.float32) * 0.1),
        _const("bn/v", (rng.rand(8).astype(np.float32) + 0.5)),
        _const("bn/beta", rng.randn(8).astype(np.float32) * 0.1),
        _const("bn/gamma", (rng.rand(8).astype(np.float32) + 0.7)),
        _node("bn", "BatchNormWithGlobalNormalization",
              ["conv", "bn/m", "bn/v", "bn/beta", "bn/gamma"],
              variance_epsilon=0.001, scale_after_normalization=True,
              T=types_pb2.DT_FLOAT),
        _node("relu", "Relu", ["bn"]),
        _node("mp", "MaxPool", ["relu"], ksize=[1, 3, 3, 1],
              strides=[1, 2, 2, 1], padding=b"SAME"),
        _const("b1/w", rng.randn(1, 1, 8, 4).astype(np.float32) * 0.3),
        _node("b1/conv", "Conv2D", ["mp", "b1/w"],
              strides=[1, 1, 1, 1], padding=b"SAME"),
        _node("b1/relu", "Relu", ["b1/conv"]),
        _node("b2/ap", "AvgPool", ["mp"], ksize=[1, 3, 3, 1],
              strides=[1, 1, 1, 1], padding=b"SAME"),
        _const("cat/axis", np.asarray(3, np.int32), np.int32),
        _node("cat", "ConcatV2", ["b1/relu", "b2/ap", "cat/axis"],
              N=2),
        # global average over the 5x5 spatial extent -> [B,1,1,12]
        _node("pool_3", "AvgPool", ["cat"], ksize=[1, 5, 5, 1],
              strides=[1, 1, 1, 1], padding=b"VALID"),
        _const("softmax/w", rng.randn(12, 20).astype(np.float32) * 0.3),
        _const("reshape/shape", np.asarray([-1, 12], np.int32), np.int32),
        _node("pool_3/reshaped", "Reshape", ["pool_3", "reshape/shape"],
              T=types_pb2.DT_FLOAT),
        _node("softmax/logits/MatMul", "MatMul",
              ["pool_3/reshaped", "softmax/w"]),
        _node("softmax", "Softmax", ["softmax/logits/MatMul"]),
    ])
    return gd


def test_proto_parser_round_trip():
    gd = build_fixture()
    nodes = parse_graphdef(gd.SerializeToString())
    by_name = {n.name: n for n in nodes}
    assert set(by_name) == {n.name for n in gd.node}
    for ref_node in gd.node:
        got = by_name[ref_node.name]
        assert got.op == ref_node.op
        assert got.inputs == list(ref_node.input)
    # attr fidelity spot checks: strides list, padding string, float, bool,
    # int32 + float32 tensors (tensor_content AND scalar-fill encodings)
    conv = by_name["conv"]
    assert conv.attr("strides") == [1, 2, 2, 1]
    assert conv.attr("padding") == b"SAME"
    bn = by_name["bn"]
    assert abs(bn.attr("variance_epsilon") - 0.001) < 1e-9
    assert bn.attr("scale_after_normalization") is True
    np.testing.assert_array_equal(by_name["resize/size"].attr("value"),
                                  [19, 19])
    w = by_name["conv/w"].attr("value")
    assert w.shape == (3, 3, 3, 8) and w.dtype == np.float32
    assert float(by_name["sub/y"].attr("value")) == 128.0


def _tf_run(gd, feeds, fetches):
    g = tf1.Graph()
    with g.as_default():
        tf1.import_graph_def(gd, name="")
    with tf1.Session(graph=g) as sess:
        return sess.run(fetches, feeds)


def test_interpreter_matches_tf_session():
    gd = build_fixture()
    x = np.random.RandomState(1).rand(4, 9, 11, 3).astype(np.float32) * 255
    want_pool, want_sm = _tf_run(gd, {"ExpandDims:0": x},
                                 ["pool_3:0", "softmax:0"])

    interp = GraphInterpreter(parse_graphdef(gd.SerializeToString()))
    fn = interp.make_fn("ExpandDims", ["pool_3", "softmax"])
    got_pool, got_sm = fn(interp.consts, x)
    np.testing.assert_allclose(np.asarray(got_pool), want_pool,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_sm), want_sm,
                               rtol=1e-4, atol=1e-5)


def test_frozen_classifier_matches_reference_head():
    """End-to-end vs a transliteration of _init_inception's rebuilt head
    (``inception_score.py:92-94``): softmax(squeeze(pool_3) @ w), no bias."""
    gd = build_fixture()
    x = np.random.RandomState(2).rand(6, 8, 8, 3).astype(np.float32) * 255
    pool = _tf_run(gd, {"ExpandDims:0": x}, "pool_3:0")
    w = None
    for n in gd.node:
        if n.name == "softmax/w":
            w = tf.make_ndarray(n.attr["value"].tensor)
    logits = np.squeeze(pool) @ w
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    want = e / e.sum(axis=1, keepdims=True)

    clf = FrozenInceptionClassifier(gd.SerializeToString())
    got = clf(x)
    assert got.shape == (6, 20)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_legacy_resize_matches_tf():
    x = np.random.RandomState(3).rand(2, 7, 5, 3).astype(np.float32)
    for out_hw in [(13, 11), (3, 2), (7, 5), (29, 29)]:
        want = tf1.image.resize_bilinear(
            tf.constant(x), out_hw, align_corners=False).numpy() \
            if tf.executing_eagerly() else None
        if want is None:
            want = _tf_run_resize(x, out_hw)
        got = np.asarray(_resize_bilinear_legacy(
            np.asarray(x), out_hw[0], out_hw[1]))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_avgpool_same_counts_match_tf():
    x = np.random.RandomState(4).rand(2, 9, 9, 4).astype(np.float32)
    gd = graph_pb2.GraphDef()
    inp = node_def_pb2.NodeDef(name="ExpandDims", op="Placeholder")
    inp.attr["dtype"].type = types_pb2.DT_FLOAT
    gd.node.extend([inp, _node("ap", "AvgPool", ["ExpandDims"],
                               ksize=[1, 3, 3, 1], strides=[1, 2, 2, 1],
                               padding=b"SAME")])
    want = _tf_run(gd, {"ExpandDims:0": x}, "ap:0")
    interp = GraphInterpreter(parse_graphdef(gd.SerializeToString()))
    got = interp.make_fn("ExpandDims", ["ap"])(interp.consts, x)[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
